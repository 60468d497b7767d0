"""Small-channel conv3x3 as one im2col matmul (the extractor ingest).

XLA's conv lowering runs the conditioning extractors' small-channel
512px stages at ~3.5 TF/s (artifacts/profile_extractor.json:
`derived_conv_and_fuse_residual` = 44 ms of a 49 ms module) — at
C_in <= 64 the lowering is padding-bound: a 3x3 conv at C_in=3 issues
nine K=3 contractions that each pad to a full 128-lane MXU pass.
Materializing the nine shifted taps as ONE [*, 9*C_in] operand (im2col)
collapses those nine padded passes into ceil(9*C_in/128).  In practice
the win survives XLA's relayout costs only in a narrow window — see
`_shape_qualifies` for the measured matrix (1.5x on the pixel-ingest
layer; large REGRESSIONS on strided and mid-channel shapes) — and even
the restricted window LOSES inside the full jitted extractor (51.9 ms vs
48.4 ms at batch 7: the custom_vjp/concat boundary breaks the
producer-consumer fusion XLA otherwise applies across the conv chain).
STATUS: measured experiment, NOT wired into any model — the extractors
stay on plain nn.Conv.  Kept (with tests) so the negative result and the
two lowering traps aren't re-derived next round; same outcome class as
the fused-attention kernel (ROADMAP "Kernel work").

This is plain XLA — no Pallas: `lax.slice` + concat + one
`dot_general`, so it works on every backend and is shape-safe.  Strides
are folded into the slices, and the extractors' conv->SiLU (act_out) and
the VAE out-head's SiLU->conv (act_in) orders are both supported so the
activation fuses into the matmul epilogue/prologue.

Numerics: the matmul accumulates in fp32 (`preferred_element_type`),
which is at least as accurate as — but not bit-identical to — flax
`nn.Conv`'s lowering, so dispatch is opt-in behind the same
`DIFFCODEC_FUSED_SILU_CONV=1` flag as the VAE Pallas kernel (one knob =
"optimized, quality-neutral conv paths").  The backward pass is the XLA
reference gradient via custom_vjp, exactly as `ops.conv_pallas` does.

Reference ops: the torch extractor pyramids
(`/root/reference/controlnet/extractors.py:209-315`, conv3x3/stride-1&2
+ SiLU chains) — behaviour parity for those modules is tested against
torch forwards in tests/test_torch_parity.py; this module only changes
how the same conv is scheduled.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

_ACTS = {
    "none": lambda x: x,
    "silu": jax.nn.silu,
}


def _conv3x3_ref(x, kernel, bias, stride, act_in, act_out):
    """Flax-Conv-identical reference: act_in -> conv3x3 (explicit (1,1)
    pad, matching `nn.Conv(padding=((1,1),(1,1)))` and SAME at 3x3) ->
    +bias -> act_out."""
    h = _ACTS[act_in](x)
    y = lax.conv_general_dilated(
        h, kernel.astype(x.dtype), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _ACTS[act_out](y + bias.astype(x.dtype))


def _conv3x3_im2col(x, kernel, bias, stride, act_in, act_out):
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    h = _ACTS[act_in](x)
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Ho = (H - 1) // stride + 1
    Wo = (W - 1) // stride + 1
    cols = []
    for dr in range(3):
        for dc in range(3):
            cols.append(lax.slice(
                hp, (0, dr, dc, 0),
                (B, dr + (Ho - 1) * stride + 1,
                 dc + (Wo - 1) * stride + 1, C),
                (1, stride, stride, 1)))
    patches = jnp.concatenate(cols, axis=-1)          # [B,Ho,Wo,9C]
    # kernel HWIO [3,3,C,O]: (dr,dc) major / C minor — the cols order
    w = kernel.astype(x.dtype).reshape(9 * C, O)
    y = lax.dot_general(patches.reshape(B * Ho * Wo, 9 * C), w,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    y = y.astype(x.dtype).reshape(B, Ho, Wo, O) + bias.astype(x.dtype)
    return _ACTS[act_out](y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _im2col(x, kernel, bias, stride, act_in, act_out):
    return _conv3x3_im2col(x, kernel, bias, stride, act_in, act_out)


def _im2col_fwd(x, kernel, bias, stride, act_in, act_out):
    return _im2col(x, kernel, bias, stride, act_in, act_out), (x, kernel,
                                                               bias)


def _im2col_bwd(stride, act_in, act_out, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(
        lambda x, k, b: _conv3x3_ref(x, k, b, stride, act_in, act_out),
        x, kernel, bias)
    return vjp(g)


_im2col.defvjp(_im2col_fwd, _im2col_bwd)


def im2col_conv_enabled() -> bool:
    # one knob for all optimized conv paths, shared with ops.conv_pallas
    return os.environ.get("DIFFCODEC_FUSED_SILU_CONV") == "1"


# ---------------------------------------------------------------------------
# stride-2 conv via space-to-depth (pure XLA)
# ---------------------------------------------------------------------------

def _s2d_weights(kernel):
    """[3,3,C,O] -> [2,2,4C,O]: the 2x2/s1 kernel over space-to-depth
    channels (a,b,c order, slot-major) equivalent to 3x3/s2 on the
    original layout.  Taps with 2u+a > 2 (the unused 4th phase) are
    zero."""
    C, O = kernel.shape[2], kernel.shape[3]
    w = jnp.zeros((2, 2, 2, 2, C, O), kernel.dtype)
    for u in (0, 1):
        for v in (0, 1):
            for a in (0, 1):
                for b in (0, 1):
                    dr, dc = 2 * u + a, 2 * v + b
                    if dr < 3 and dc < 3:
                        w = w.at[u, v, a, b].set(kernel[dr, dc])
    return w.reshape(2, 2, 4 * C, O)


def _conv3x3_s2_s2d(x, kernel, bias, pad, act_in, act_out):
    """3x3 stride-2 conv computed as conv2x2/s1 over the space-to-depth
    input.  Why: XLA's direct 3x3/s2 lowering is padding/copy-bound at
    small-to-mid channel counts (VAE encoder downsamples, extractor
    pyramids), while the s2d form is one cheap reshape/transpose plus a
    DENSE 2x2 conv at 4C input channels — the contraction K = 16C lands
    on full MXU lanes.  pad is the explicit ((pt,pb),(pl,pr)) of the
    original conv (the SD VAE downsample uses (0,1)/(0,1),
    `diffusers` Downsample2D; the extractors use (1,1)/(1,1))."""
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    h = _ACTS[act_in](x)
    hp = jnp.pad(h, ((0, 0), pad[0], pad[1], (0, 0)))
    Hp, Wp = hp.shape[1], hp.shape[2]
    Ho, Wo = (Hp - 3) // 2 + 1, (Wp - 3) // 2 + 1
    Hp2, Wp2 = 2 * (Ho + 1), 2 * (Wo + 1)
    hp = jnp.pad(hp, ((0, 0), (0, Hp2 - Hp), (0, Wp2 - Wp), (0, 0)))
    s = hp.reshape(B, Hp2 // 2, 2, Wp2 // 2, 2, C)
    s = s.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp2 // 2, Wp2 // 2, 4 * C)
    w = _s2d_weights(kernel.astype(x.dtype))
    y = lax.conv_general_dilated(
        s, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y[:, :Ho, :Wo] + bias.astype(x.dtype)
    return _ACTS[act_out](y)


def _conv3x3_s2_ref(x, kernel, bias, pad, act_in, act_out):
    """Flax-Conv-identical stride-2 reference."""
    h = _ACTS[act_in](x)
    y = lax.conv_general_dilated(
        h, kernel.astype(x.dtype), (2, 2), tuple(pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _ACTS[act_out](y + bias.astype(x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _s2d_conv(x, kernel, bias, pad, act_in, act_out):
    return _conv3x3_s2_s2d(x, kernel, bias, pad, act_in, act_out)


def _s2d_fwd(x, kernel, bias, pad, act_in, act_out):
    return _s2d_conv(x, kernel, bias, pad, act_in, act_out), (x, kernel,
                                                              bias)


def _s2d_bwd(pad, act_in, act_out, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(
        lambda x, k, b: _conv3x3_s2_ref(x, k, b, pad, act_in, act_out),
        x, kernel, bias)
    return vjp(g)


_s2d_conv.defvjp(_s2d_fwd, _s2d_bwd)


def conv3x3_stride2_act(x, kernel, bias, pad=((1, 1), (1, 1)),
                        act_in="none", act_out="none"):
    """3x3 stride-2 conv with fusable activations; opt-in s2d dispatch
    (same `DIFFCODEC_FUSED_SILU_CONV` knob; win window TBD by
    measurement — see `_s2_qualifies`)."""
    if (im2col_conv_enabled()
            and jax.default_backend() == "tpu"
            and _s2_qualifies(x, kernel.shape[-1])):
        return _s2d_conv(x, kernel, bias, tuple(map(tuple, pad)), act_in,
                         act_out)
    return _conv3x3_s2_ref(x, kernel, bias, tuple(map(tuple, pad)),
                           act_in, act_out)


def _s2_qualifies(x, out_features: int) -> bool:
    """Measured: the s2d scheduling LOSES at every production stride-2
    shape (v5e, bf16, sequential-dispatch timing, ms ref -> s2d):

      VAE dn 512px 128->128 (B4):  5.02 -> 9.30
      VAE dn 256px 256->256 (B4):  3.55 -> 6.07
      VAE dn 128px 512->512 (B4):  3.02 -> 3.61
      extractor 512px 16->32 (B14): 6.04 -> 14.46
      extractor 256px 32->64 (B14): 2.88 -> 4.92

    The (2,2)-phase transpose is a lane-crossing relayout that costs more
    than it saves, and XLA's direct 3x3/s2 lowering is already at
    ~60 TF/s on the biggest stage — the earlier catastrophic stride-2
    number (43 ms) was the STRIDED-SLICE im2col above, not XLA's conv.
    Dispatch disabled; op + tests kept as the recorded negative result."""
    return False


def _shape_qualifies(x, out_features: int, stride: int) -> bool:
    """The MEASURED win window (v5e, bf16, chained-op timing at the
    extractor shapes, batch 14):

      512x512 C3->16  s1:  5.37 -> 3.54 ms   (pixel-ingest layer, 1.5x)
      128x128 C64->64 s1:  1.78 -> 1.61 ms
      512x512 C16->32 s2:  5.46 -> 43.2 ms   REGRESSION
      256x256 C32->64 s2:  1.95 -> 9.95 ms   REGRESSION
      256x256 C32->32 s1:  2.75 -> 4.24 ms   REGRESSION

    Two lowering traps bound the window: (a) strided `lax.slice` at big
    spatial extents lowers to a gather-like copy (the stride-2 rows), so
    only stride 1 qualifies; (b) concatenating nine lane-unaligned C<=32
    slices relayouts every element (the 256px C32 row), so only the
    pixel-ingest C<=8 layers — where the 9x pass reduction dwarfs the
    relayout — and lane-aligned C=64 qualify.  The rest of the extractor
    residual is XLA's conv lowering at padded MXU dims; a Pallas kernel
    would hit the same Mosaic relayout building the 9C operand in VMEM,
    and the whole remaining pool is ~0.5% of decode wall clock — not
    worth the kernel (recorded here so the next round doesn't re-derive
    it)."""
    B, H, W, C = x.shape
    return (stride == 1
            and ((C <= 8 and H * W >= 256 * 256)
                 or (C == 64 and H * W >= 128 * 128)))


def conv3x3_act(x, kernel, bias, stride=1, act_in="none", act_out="none"):
    """3x3 conv, explicit (1,1) pad, with fusable activations on either
    side; opt-in im2col dispatch for the small-channel win window."""
    if (im2col_conv_enabled()
            and jax.default_backend() == "tpu"
            and _shape_qualifies(x, kernel.shape[-1], stride)):
        return _im2col(x, kernel, bias, stride, act_in, act_out)
    return _conv3x3_ref(x, kernel, bias, stride, act_in, act_out)
