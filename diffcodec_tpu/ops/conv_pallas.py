"""Fused SiLU+conv3x3 Pallas TPU kernel (the VAE big-spatial stages).

XLA's conv lowering runs the SD VAE's 512px/128ch resnet stages at
~34 TF/s (artifacts/profile_vae.json) — the stage is VPU(SiLU)/copy-bound
at small channel counts.  This kernel streams halo row-tiles HBM->VMEM
with double-buffered manual DMA, applies SiLU on the tile in f32, and
accumulates the nine shifted-tap matmuls in fp32 VMEM; measured 52 TF/s vs
XLA's 44 on the 512x512x128->128 shape (scripts/conv_kernel_experiment.py
is the original experiment record, including the Mosaic pitfalls).

Opt-in: `silu_conv3x3` (the module-level entry used by
`models.layers.SiluConv`) dispatches here only when the
`DIFFCODEC_FUSED_SILU_CONV=1` env flag is set AND the shape matches the
measured win window (big spatial extent, <=128 channels, TPU backend).
The pallas path carries a custom_vjp whose backward is the XLA reference
gradient, so the flag is safe under training too.

Three variants live here (all behind the same flag, each with its own
measured dispatch gate):
  * `silu_conv3x3`            — SiLU+conv (the original kernel)
  * `gn_silu_conv3x3`         — + the folded GroupNorm affine applied on
    the tile (from `GroupNorm32(return_affine=True)`), and an optional
    residual-add epilogue; removes one full HBM write+read round trip per
    GN and the separate shortcut-add pass.  Decoder measured 208.9 ->
    189.9 ms at the bench point (up3 51.3->39.1 ms, up2 35.1->28.8 ms).
  * `gn_silu_conv3x3_projected` — pure-XLA project-then-stencil schedule
    for few-output-channel heads (the 128->3 out-head): O<8 direct convs
    pad output lanes to 128 so MXU passes equal a 128-wide conv; one
    C->9*O matmul + a 9-tap VPU stencil is 9x fewer passes (5.9 vs
    11.1 ms measured).

Reference op: the torch VAE decoder's norm-silu-conv stages
(`diffusers` AutoencoderKL, loaded at `train_controlnet.py:805-808`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_hbm, w_ref, b_ref, o_ref, xtile, sems):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    Th = o_ref.shape[1]
    C = xtile.shape[3]
    O = o_ref.shape[3]

    def dma(slot, row_block):
        return pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(row_block * Th, Th + 2)],
            xtile.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i + 1 < n_i)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()

    x = xtile[slot].astype(jnp.float32)  # [Th+2, Wp, C]
    # silu in f32 (Mosaic rejects bf16 sigmoid: f32 const broadcast into
    # a bf16 vector), cast back for the bf16 MXU operands
    x = (x * jax.nn.sigmoid(x)).astype(xtile.dtype)
    W = o_ref.shape[2]
    accv = jnp.zeros((Th * W, O), jnp.float32)
    # slice the (sublane-tiled) W axis once per column tap; row slices of
    # the result are free views, keeping VMEM stack usage to one W-slice
    for dc in range(3):
        xc = x[:, dc:dc + W, :]                     # [Th+2, W, C]
        for dr in range(3):
            xs = xc[dr:dr + Th].reshape(Th * W, C)  # contiguous view
            accv += jax.lax.dot_general(
                xs, w_ref[dr, dc], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = (accv + b_ref[0].astype(jnp.float32)).reshape(
        Th, W, O).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def fused_silu_conv3x3_pallas(x, kernel, bias, th: int = 8,
                              interpret: bool = False):
    """silu(x) -> conv3x3 SAME.  x [B,H,W,C] (H%th==0, W%8==0), kernel
    [3,3,C,O] HWIO, bias [O].  Output [B,H,W,O] in x.dtype."""
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    assert H % th == 0 and W % 8 == 0, (H, W, th)
    # W pad: 1 left + 7 right so the tile's W dim stays 8-aligned for the
    # (8, 128) HBM tiling (DMA slices must align to the sublane tile)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
    kb = kernel.astype(x.dtype)
    grid = (B, H // th)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # xp stays in HBM
            pl.BlockSpec((3, 3, C, O), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, O), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, W + 8, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * C * O,
            bytes_accessed=2 * B * H * W * (C + O),
            transcendentals=B * H * W * C),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, kb, bias.reshape(1, -1))


def _gn_kernel(xp_hbm, sc_ref, sh_ref, w_ref, b_ref, *rest, has_residual):
    """GN-affine + SiLU + conv3x3 (+ optional residual add) on halo tiles.

    Same double-buffered halo-DMA structure as `_kernel`, with the
    per-(batch, channel) GroupNorm affine (scale/shift) applied on the
    tile before SiLU.  Because the halo ring of `xp` is zero-PADDED input
    (the conv's SAME padding), the affine would turn it into
    silu(shift) != 0 — so the pad ring is masked back to zero after the
    affine, reproducing `conv(pad(silu(gn(x))))` exactly.
    """
    if has_residual:
        res_ref, o_ref, xtile, sems = rest
    else:
        o_ref, xtile, sems = rest
        res_ref = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    Th = o_ref.shape[1]
    C = xtile.shape[3]
    O = o_ref.shape[3]
    H = n_i * Th          # unpadded image height
    W = o_ref.shape[2]
    Wp = xtile.shape[2]

    def dma(slot, row_block):
        return pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(row_block * Th, Th + 2)],
            xtile.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i + 1 < n_i)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()

    x = xtile[slot].astype(jnp.float32)  # [Th+2, Wp, C]
    # GroupNorm affine, then round through the compute dtype exactly like
    # the unfused path (GroupNorm32 casts its output back to bf16 before
    # SiluConv sees it).  scale/shift ride along whole ([B, C] is tiny)
    # because Mosaic block shapes must tile (8, 128) or match the array.
    x = x * sc_ref[b].astype(jnp.float32) + sh_ref[b].astype(jnp.float32)
    x = x.astype(xtile.dtype).astype(jnp.float32)
    x = x * jax.nn.sigmoid(x)
    # zero the SAME-pad ring (global padded rows 0 / H+1, cols 0 / > W).
    # 3D iotas: Mosaic rejects minor-dim insertion on sub-32-bit vectors,
    # so the mask is built at the full tile shape instead of broadcast.
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + i * Th
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    valid = ((rows >= 1) & (rows <= H) & (cols >= 1) & (cols <= W))
    x = jnp.where(valid, x, 0.0).astype(xtile.dtype)

    accv = jnp.zeros((Th * W, O), jnp.float32)
    for dc in range(3):
        xc = x[:, dc:dc + W, :]                     # [Th+2, W, C]
        for dr in range(3):
            xs = xc[dr:dr + Th].reshape(Th * W, C)  # contiguous view
            accv += jax.lax.dot_general(
                xs, w_ref[dr, dc], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out = accv + b_ref[0].astype(jnp.float32)
    if has_residual:
        out = out + res_ref[0].astype(jnp.float32).reshape(Th * W, O)
    o_ref[0] = out.reshape(Th, W, O).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def gn_silu_conv3x3_pallas(x, scale, shift, kernel, bias, residual=None,
                           th: int = 8, interpret: bool = False):
    """(x*scale + shift) -> silu -> conv3x3 SAME (-> + residual).

    x [B,H,W,C] (H%th==0, W%8==0), scale/shift [B,C] f32 (the folded
    GroupNorm affine), kernel [3,3,C,O] HWIO, bias [O], residual
    [B,H,W,O] or None.  Output [B,H,W,O] in x.dtype."""
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    assert H % th == 0 and W % 8 == 0, (H, W, th)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
    kb = kernel.astype(x.dtype)
    grid = (B, H // th)
    has_residual = residual is not None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),     # xp stays in HBM
        pl.BlockSpec((B, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, C, O), lambda b, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, O), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xp, scale.astype(jnp.float32), shift.astype(jnp.float32), kb,
            bias.reshape(1, -1)]
    if has_residual:
        in_specs.append(pl.BlockSpec((1, th, W, O), lambda b, i: (b, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual)
    return pl.pallas_call(
        functools.partial(_gn_kernel, has_residual=has_residual),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, W, O), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, W + 8, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * C * O,
            bytes_accessed=2 * B * H * W * (C + O),
            transcendentals=B * H * W * C),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def gn_silu_conv3x3_ref(x, scale, shift, kernel, bias, residual=None):
    """XLA path with the same op order/rounding: affine (f32) -> cast to
    compute dtype -> silu -> conv -> (+residual)."""
    xn = (x.astype(jnp.float32) * scale.astype(jnp.float32)[:, None, None, :]
          + shift.astype(jnp.float32)[:, None, None, :]).astype(x.dtype)
    y = silu_conv3x3_ref(xn, kernel, bias)
    return y + residual if residual is not None else y


@jax.custom_vjp
def _gn_fused(x, scale, shift, kernel, bias):
    return gn_silu_conv3x3_pallas(x, scale, shift, kernel, bias, th=8)


def _gn_fused_fwd(x, scale, shift, kernel, bias):
    return _gn_fused(x, scale, shift, kernel, bias), (x, scale, shift,
                                                      kernel, bias)


def _gn_fused_bwd(res, g):
    x, scale, shift, kernel, bias = res
    _, vjp = jax.vjp(lambda *a: gn_silu_conv3x3_ref(*a),
                     x, scale, shift, kernel, bias)
    return vjp(g)


_gn_fused.defvjp(_gn_fused_fwd, _gn_fused_bwd)


@jax.custom_vjp
def _gn_fused_res(x, scale, shift, kernel, bias, residual):
    return gn_silu_conv3x3_pallas(x, scale, shift, kernel, bias,
                                  residual=residual, th=8)


def _gn_fused_res_fwd(x, scale, shift, kernel, bias, residual):
    return (_gn_fused_res(x, scale, shift, kernel, bias, residual),
            (x, scale, shift, kernel, bias, residual))


def _gn_fused_res_bwd(res, g):
    x, scale, shift, kernel, bias, residual = res
    _, vjp = jax.vjp(lambda *a: gn_silu_conv3x3_ref(*a),
                     x, scale, shift, kernel, bias, residual)
    return vjp(g)


_gn_fused_res.defvjp(_gn_fused_res_fwd, _gn_fused_res_bwd)


def gn_fused(x, scale, shift, kernel, bias, residual=None):
    """Differentiable fused GN-affine+SiLU+conv3x3 (+residual) op."""
    if residual is None:
        return _gn_fused(x, scale, shift, kernel, bias)
    return _gn_fused_res(x, scale, shift, kernel, bias, residual)


def silu_conv3x3_ref(x, kernel, bias):
    """The XLA path: silu then conv, flax-Conv-identical numerics (no
    preferred_element_type, bias added in compute dtype)."""
    h = jax.nn.silu(x)
    y = lax.conv_general_dilated(
        h, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(x.dtype)


@jax.custom_vjp
def _fused(x, kernel, bias):
    return fused_silu_conv3x3_pallas(x, kernel, bias, th=8)


def _fused_fwd(x, kernel, bias):
    return _fused(x, kernel, bias), (x, kernel, bias)


def _fused_bwd(res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(silu_conv3x3_ref, x, kernel, bias)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_silu_conv_enabled() -> bool:
    return os.environ.get("DIFFCODEC_FUSED_SILU_CONV") == "1"


def _shape_qualifies(x, out_features: int) -> bool:
    """The measured win window: big spatial extent (>=256px), the regime
    where XLA's conv lowering is copy-bound.  Measured on v5e at batch 7
    (bf16, vs XLA silu+conv):
      512x512 128->128: 52 vs 43 TF/s     512x512 256->128: 63 vs 48
      256x256 256->256: 67 vs 56          256x256 512->256: 85 vs 68
    At small spatial extents (the 128px/512ch stages run 84 TF/s under
    XLA, artifacts/profile_vae.json) the halo DMA overhead dominates —
    stay out of XLA's way there."""
    B, H, W, C = x.shape
    return (x.dtype == jnp.bfloat16 and H % 8 == 0 and W % 8 == 0
            and H * W >= 256 * 256 and 64 <= C <= 512
            and 64 <= out_features <= 256)


def silu_conv3x3(x, kernel, bias, dtype=None):
    """SiLU -> conv3x3 SAME with opt-in Pallas dispatch (see module doc).

    Falls back to the flax-identical XLA ops whenever the flag is off, the
    backend is not TPU, or the shape is outside the kernel's win window.
    """
    if (fused_silu_conv_enabled()
            and jax.default_backend() == "tpu"
            and _shape_qualifies(x, kernel.shape[-1])):
        return _fused(x, kernel, bias)
    return silu_conv3x3_ref(x, kernel, bias)


def gn_silu_conv_qualifies(x, out_features: int) -> bool:
    """Dispatch gate for the GN-affine-fused variant — the silu-conv win
    window.  Measured v5e, batch 7 bf16, vs the XLA composition
    (GN-affine + silu + conv [+res]):

      512x512 128->128 +res: 10.5 vs 16.6 ms (1.58x)
      512x512 128->128:      10.6 vs 16.1 ms (1.52x)
      256x256 256->256 +res:  7.8 vs 10.9 ms (1.40x)
      512x512 256->128 +res: 18.4 vs 26.2 ms (1.43x)
      512x512 128->3 (head): 11.1 vs 11.4 ms — NEGATIVE (tie): O=3 output
        lane padding makes the MXU pass count identical to O=128, so the
        kernel is pass-bound at ~52 TF/s-equivalent and the GN traffic
        saving is noise; the out-head stays on XLA.

    128px extension (the VAE's up1/encoder 512-ch stages), measured the
    same way:
      128x128 512->512 +res: b7 6.11 vs 7.81 ms (1.28x), b4 4.55 vs 5.07
        (1.11x) — IN (the decoder's largest stage, 3 res blocks = 41 ms).
      128x128 512->256 +res: b7 5.35 vs 5.74 (1.07x) — OUT (tie at b4).
      128x128 256->512:      b4 3.32 vs 3.27 (0.99x) — OUT.
      64x64   512->512 +res: b7 3.13 vs 3.23 (1.03x) — OUT (DMA overhead
        eats the win below ~16k pixels).
    """
    B, H, W, C = x.shape
    if not (fused_silu_conv_enabled()
            and jax.default_backend() == "tpu"
            and x.dtype == jnp.bfloat16 and H % 8 == 0 and W % 8 == 0):
        return False
    if H * W >= 256 * 256 and 64 <= C <= 512 and 64 <= out_features <= 256:
        return True
    return H * W >= 128 * 128 and C == 512 and out_features == 512


def head_projection_qualifies(x, out_features: int) -> bool:
    """Few-output-channel conv at big spatial extent (the VAE decoder's
    128->3 out-head).  A direct conv3x3 to O<8 pads output lanes to 128,
    so its MXU pass count equals a 128-wide conv (~11 ms at 512px/b7 both
    under XLA and in the halo kernel).  Projecting channels first
    (C -> 9*O, one matmul = 9x fewer passes) and stencil-summing the taps
    on the VPU measures 5.9 vs 11.1 ms (1.9x) on v5e."""
    B, H, W, C = x.shape
    return (fused_silu_conv_enabled()
            and jax.default_backend() == "tpu"
            and x.dtype == jnp.bfloat16 and H % 8 == 0 and W % 8 == 0
            and H * W >= 256 * 256 and C >= 64 and out_features <= 8)


def gn_silu_conv3x3_projected(x, scale, shift, kernel, bias):
    """Project-then-stencil schedule of the GN+SiLU+conv3x3 head (pure
    XLA, differentiable — the LPIPS pixel-loss path backprops through
    vae.decode).  Taps accumulate in f32."""
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    xn = (x.astype(jnp.float32) * scale.astype(jnp.float32)[:, None, None, :]
          + shift.astype(jnp.float32)[:, None, None, :]).astype(x.dtype)
    h = jax.nn.silu(xn)
    # [3,3,C,O] -> [C, 9*O], tap-major: tap t = dr*3+dc owns cols [t*O,(t+1)*O)
    w2 = kernel.transpose(2, 0, 1, 3).reshape(C, 9 * O).astype(x.dtype)
    z = h @ w2                                    # [B,H,W,9*O]
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, H, W, O), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            t = dr * 3 + dc
            out = out + zp[:, dr:dr + H, dc:dc + W,
                           t * O:(t + 1) * O].astype(jnp.float32)
    return out.astype(x.dtype) + bias.astype(x.dtype)


def gn_silu_conv3x3(x, scale, shift, kernel, bias, residual=None):
    """GroupNorm-affine -> SiLU -> conv3x3 SAME (-> +residual) with opt-in
    Pallas dispatch; callers gate via `gn_silu_conv_qualifies` (module-level
    fallback kept for safety)."""
    if residual is None and head_projection_qualifies(x, kernel.shape[-1]):
        return gn_silu_conv3x3_projected(x, scale, shift, kernel, bias)
    if gn_silu_conv_qualifies(x, kernel.shape[-1]):
        return gn_fused(x, scale, shift, kernel, bias, residual)
    return gn_silu_conv3x3_ref(x, scale, shift, kernel, bias, residual)


# ---------------- fused nearest-2x upsample + conv3x3 ----------------

def _collapse_upsample_kernel(kernel):
    """[3,3,C,O] -> [2,2,2,2,C,O] phase taps (di,dj,a,b).

    For nearest-2x upsample + conv3x3, output phase (di,dj) sees only a
    2x2 window of the ORIGINAL input with adjacent 3x3 taps collapsing
    onto the same input pixel (models.layers._UpsampleConv doc).  Row
    collapse: di=0 -> (k0, k1+k2); di=1 -> (k0+k1, k2); same for columns.
    """
    k = kernel
    rows = {0: jnp.stack([k[0], k[1] + k[2]], 0),
            1: jnp.stack([k[0] + k[1], k[2]], 0)}            # [2,3,C,O]
    out = []
    for di in (0, 1):
        kr = rows[di]
        cols = {0: jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], 1),
                1: jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], 1)}
        out.append(jnp.stack([cols[0], cols[1]], 0))          # [2,2,2,C,O]
    return jnp.stack(out, 0)                                  # [2,2,2,2,C,O]


def _up_kernel(xp_hbm, w_ref, b_ref, o0_ref, o1_ref, xtile, sems):
    """Each grid step emits 2*Th output rows per column phase: phase rows
    interleave along the sublane axis via a leading-dim stack+reshape
    (free in Mosaic — the minor (W, O) dims are untouched)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    Th = o0_ref.shape[1] // 2
    C = xtile.shape[3]
    O = o0_ref.shape[3]
    W = o0_ref.shape[2]

    def dma(slot, row_block):
        return pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(row_block * Th, Th + 2)],
            xtile.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i + 1 < n_i)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()

    x = xtile[slot]  # [Th+2, Wp, C] (already silu-free: plain upsample-conv)
    bias = b_ref[0].astype(jnp.float32)
    for dj, o_ref in ((0, o0_ref), (1, o1_ref)):
        phases = []
        for di in (0, 1):
            acc = jnp.zeros((Th * W, O), jnp.float32)
            for bb in range(2):
                xc = x[:, bb + dj:bb + dj + W, :]
                for aa in range(2):
                    xs = xc[aa + di:aa + di + Th].reshape(Th * W, C)
                    acc += jax.lax.dot_general(
                        xs, w_ref[di, dj, aa, bb],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            phases.append((acc + bias).reshape(Th, W, O).astype(o_ref.dtype))
        inter = jnp.stack(phases, 1).reshape(2 * Th, W, O)  # rows 2t+di
        o_ref[0] = inter


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def upsample_conv3x3_pallas(x, kernel, bias, th: int = 8,
                            interpret: bool = False):
    """conv3x3(nearest_up2(x)) SAME.  x [B,H,W,C], kernel [3,3,C,O] HWIO,
    bias [O] -> [B,2H,2W,O] in x.dtype.  Never materializes the 2x tensor:
    16 collapsed taps at input resolution, phase rows interleaved
    in-kernel; the two column phases come back as separate arrays and are
    interleaved by one XLA pass."""
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    assert H % th == 0 and W % 8 == 0, (H, W, th)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
    kp = _collapse_upsample_kernel(kernel).astype(x.dtype)
    grid = (B, H // th)
    out0, out1 = pl.pallas_call(
        _up_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((2, 2, 2, 2, C, O), lambda b, i: (0,) * 6,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * th, W, O), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * th, W, O), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, 2 * H, W, O), x.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, W + 8, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 16 * B * H * W * C * O,
            bytes_accessed=2 * B * H * W * (C + 4 * O),
            transcendentals=0),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, kp, bias.reshape(1, -1))
    # interleave the column phases: [B,2H,W,2,O] -> [B,2H,2W,O] (adjacent
    # dim merge = layout-free reshape)
    return jnp.stack([out0, out1], axis=3).reshape(B, 2 * H, 2 * W, O)


def upsample_conv3x3_ref(x, kernel, bias):
    """XLA reference: nearest-2x then SAME conv3x3 (flax-Conv numerics)."""
    B, H, W, C = x.shape
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    y = lax.conv_general_dilated(
        up, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(x.dtype)


@jax.custom_vjp
def _up_fused(x, kernel, bias):
    return upsample_conv3x3_pallas(x, kernel, bias, th=8)


def _up_fused_fwd(x, kernel, bias):
    return _up_fused(x, kernel, bias), (x, kernel, bias)


def _up_fused_bwd(res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(upsample_conv3x3_ref, x, kernel, bias)
    return vjp(g)


_up_fused.defvjp(_up_fused_fwd, _up_fused_bwd)


def upsample_conv_qualifies(x, out_features: int) -> bool:
    """Dispatch gate for the fused upsample-conv kernel.  Measured on v5e
    (chained x10, batch 7 bf16, vs the phase-conv XLA module) at the three
    VAE decoder upsample stages — scripts/upsample_kernel_experiment.py:

      64x64   512->512:  3.77 vs  4.66 ms (1.24x)   63.9 vs 51.6 TF/s
      128x128 512->512:  8.72 vs 15.18 ms (1.74x)  110.4 vs 63.4 TF/s
      256x256 256->256: 10.33 vs 22.31 ms (2.16x)   93.1 vs 43.1 TF/s

    The win grows with spatial extent (XLA's phase convs re-read x four
    times and pay a full-output interleave pass; the kernel streams x once
    and interleaves row phases in-register).  Channel bounds cover the
    measured range; the UNet's 1280-ch upsamplers are excluded (16 collapsed
    taps at 1280x1280 = 52 MB of VMEM weights, unmeasured)."""
    B, H, W, C = x.shape
    return (fused_silu_conv_enabled()
            and jax.default_backend() == "tpu"
            and x.dtype == jnp.bfloat16 and H % 8 == 0 and W % 8 == 0
            and H * W >= 64 * 64 and 128 <= C <= 512
            and 128 <= out_features <= 512)


def upsample_conv3x3(x, kernel, bias):
    """nearest-2x upsample -> conv3x3 SAME with opt-in Pallas dispatch.

    Falls back to the phase-conv XLA formulation (via the caller,
    `models.layers._UpsampleConv`) when the gate fails; this entry point
    is only taken when `upsample_conv_qualifies(x, O)` holds."""
    return _up_fused(x, kernel, bias)


# ---------------- stride-2 conv3x3 (VAE encoder downsamplers) ----------------

def _down_kernel(xp_hbm, w_ref, b_ref, o_ref, xtile, sems):
    """conv3x3 stride-2 over a pre-padded, column-pair-merged input.  Each
    grid step consumes 2*Th+2 input rows for Th output rows; the host
    delivers x as [rows, Wm, 2C] merged column pairs and the weights as
    tap-merged [3, 2, 2C, O] (see `downsample_conv3x3_pallas`), so the
    kernel is six [Th*Wo,2C]@[2C,O] MXU taps with only unit-stride
    sublane slices — no lane extraction, no relayout."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    Th = o_ref.shape[1]
    Wo = o_ref.shape[2]
    O = o_ref.shape[3]
    C2 = xtile.shape[3]          # merged lanes = 2*C
    C = C2 // 2
    Wm = xtile.shape[2]          # merged column-pair count

    def dma(slot, row_block):
        return pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(row_block * 2 * Th, 2 * Th + 2)],
            xtile.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i + 1 < n_i)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()

    x = xtile[slot]                              # [2Th+2, Wp/2, 2C] merged
    # the host pre-merged column pairs ([Wp,C] -> [Wp/2,2C] preserves
    # row-major linear order = a free XLA bitcast on the padded array), so
    # even input columns are lanes [0,C) and odd are [C,2C) with NO
    # in-kernel relayout (Mosaic rejects stride-2 sublane slices, and an
    # in-kernel pair-merge shapecast measured 0.74-0.99x).  Row phases
    # split via the free leading-dim reshape.
    xr = x.reshape(Th + 1, 2, Wm, C2)
    even, odd = xr[:, 0], xr[:, 1]
    rows = (even[:Th], odd[:Th], even[1:Th + 1])  # input rows 2r+dr
    accv = jnp.zeros((Th * Wo, O), jnp.float32)
    for dr in range(3):
        xrow = rows[dr]                          # [Th, Wm, 2C]
        # word c covers input cols (2c, 2c+1) = taps (0,1); word c+1's
        # even lane covers col 2c+2 = tap 2 (its odd half hits zero
        # weights — 33% MAC overhead, traded for zero lane shuffles)
        for wshift in range(2):
            xs = xrow[:, wshift:wshift + Wo].reshape(Th * Wo, C2)
            accv += jax.lax.dot_general(
                xs, w_ref[dr, wshift], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = (accv + b_ref[0].astype(jnp.float32)).reshape(
        Th, Wo, O).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("asymmetric_pad", "th", "interpret"))
def downsample_conv3x3_pallas(x, kernel, bias, asymmetric_pad: bool = True,
                              th: int = 8, interpret: bool = False):
    """conv3x3 stride-2.  x [B,H,W,C] (H%(2*th)==0, W%16==0), kernel
    [3,3,C,O] HWIO, bias [O] -> [B,H/2,W/2,O] in x.dtype.

    `asymmetric_pad=True` pads bottom/right only (the HF VAE Encoder
    convention, `models.layers.Downsample2D`); False pads SAME (the UNet
    downsample_padding=1 convention).  Both reduce to one VALID kernel
    over a host-padded array."""
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    Ho, Wo = H // 2, W // 2
    assert Ho % th == 0 and W % 16 == 0, (H, W, th)
    pt, pc = (0, 0) if asymmetric_pad else (1, 1)
    # rows: blocks of 2*th+2 at starts 2*i*th -> padded rows = H+2;
    # cols: highest read is dc + 2*(Wo-1) = W (both pad conventions land
    # on the same padded-array indices), pad W -> W+16 so the merged
    # column-pair count (W+16)/2 stays 8-aligned for the DMA tiles.  The
    # pair merge [Wp,C] -> [Wp/2,2C] preserves row-major linear order, so
    # on the just-padded array it is a free XLA bitcast — the kernel sees
    # even columns in lanes [0,C) and odd in [C,2C) with no relayout
    # anywhere (an in-kernel merge shapecast measured 0.74-0.99x, and
    # Mosaic rejects stride-2 sublane slices outright).
    xp = jnp.pad(x, ((0, 0), (pt, 2 - pt), (pc, 16 - pc), (0, 0)))
    xp = xp.reshape(B, H + 2, (W + 16) // 2, 2 * C)
    # tap-merged weights [3,2,2C,O]: word-shift 0 = concat(w[dr,0],
    # w[dr,1]) over the merged lanes; word-shift 1 = concat(w[dr,2], 0)
    kb = kernel.astype(x.dtype)
    km = jnp.stack(
        [jnp.concatenate([kb[:, 0], kb[:, 1]], axis=1),
         jnp.concatenate([kb[:, 2], jnp.zeros_like(kb[:, 2])], axis=1)],
        axis=1)                                  # [3, 2, 2C, O]
    grid = (B, Ho // th)
    return pl.pallas_call(
        _down_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 2, 2 * C, O), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, Wo, O), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * th + 2, (W + 16) // 2, 2 * C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * Ho * Wo * C * O,
            bytes_accessed=2 * B * H * W * C + 2 * B * Ho * Wo * O,
            transcendentals=0),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, km, bias.reshape(1, -1))


def downsample_conv3x3_ref(x, kernel, bias, asymmetric_pad: bool = True):
    """XLA reference: flax-Conv-identical strided conv (the exact ops
    `models.layers.Downsample2D` lowers to when the gate is off)."""
    pad = ((0, 1), (0, 1)) if asymmetric_pad else ((1, 1), (1, 1))
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (2, 2), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _down_fused(x, kernel, bias, asymmetric_pad):
    return downsample_conv3x3_pallas(x, kernel, bias,
                                     asymmetric_pad=asymmetric_pad, th=8)


def _down_fused_fwd(x, kernel, bias, asymmetric_pad):
    return _down_fused(x, kernel, bias, asymmetric_pad), (x, kernel, bias)


def _down_fused_bwd(asymmetric_pad, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(
        lambda a, k, c: downsample_conv3x3_ref(a, k, c, asymmetric_pad),
        x, kernel, bias)
    return vjp(g)


_down_fused.defvjp(_down_fused_fwd, _down_fused_bwd)


def downsample_conv_qualifies(x, out_features: int) -> bool:
    """Dispatch gate for the stride-2 halo kernel: measured NEGATIVE at
    every production shape — always False; `models.layers.Downsample2D`
    stays on XLA's direct strided conv.

    This was the last untried kernel idea on the single-chip frontier
    (ROADMAP round-4 item 0a.i).  Measured on v5e (chained x10 best-of-3,
    bf16, scripts/downsample_kernel_experiment.py, recorded in
    artifacts/downsample_conv_experiment.json) vs XLA direct:

      8x512x512 128->128: 9.57 vs 5.62 ms (0.59x)
      8x256x256 256->256: 6.48 vs 4.45 ms (0.69x)
      8x128x128 512->512: 5.23 vs 4.00 ms (0.77x)
      8x 64x 64 512->512: 3.49 vs 2.73 ms (0.78x)
      14x64x 64 320->320: 2.97 vs 2.78 ms (0.93x)

    Three schedules tried, all losing: (1) in-kernel column-pair merge
    shapecast 0.74-0.99x (and Mosaic rejects stride-2 sublane slices
    outright); (2) host-side bitcast merge + in-kernel lane extraction
    0.60-0.78x; (3) host merge + tap-merged [3,2,2C,O] weights (zero lane
    shuffles, 33% MAC overhead) 0.59-0.93x, th-invariant across 8/16/32
    (not DMA-wait bound).  Root cause: stride-2 halves the per-sublane-
    slice operand reuse the stride-1 kernel enjoys (each sliced operand
    feeds one tap instead of three), while XLA's own stride-2 lowering
    already sustains 27-40 TF/s steady-state at these shapes — the 21-32
    TF/s in artifacts/profile_vae_encode.json includes per-call pad +
    dispatch that the chained measurement amortizes.  Consistent with the
    space-to-depth negative (`ops/conv_im2col.py`, commit 7923fe4).  The
    op + tests are kept so the result isn't re-derived."""
    return False


def downsample_conv3x3(x, kernel, bias, asymmetric_pad: bool = True):
    """Strided 3x3 conv with opt-in Pallas dispatch; callers gate via
    `downsample_conv_qualifies` (fallback kept for safety)."""
    if downsample_conv_qualifies(x, kernel.shape[-1]):
        return _down_fused(x, kernel, bias, asymmetric_pad)
    return downsample_conv3x3_ref(x, kernel, bias, asymmetric_pad)
