"""Packed-lane conv3x3 chains for small-channel stages (pure XLA).

The extractor pre-chains (`controlnet/extractors.py:215-238` first/last
pre-extractors, `:87-96` prev/next) run 3->16->32->32->64 channel convs at
512px.  In NHWC bf16 a C=16 activation pads the 128-lane minor dim 8x —
in HBM traffic, in VPU work (SiLU runs on the padded lanes), and in MXU
columns — which is why XLA executes the chain at ~1-2 TF/s effective
(artifacts/profile_extractor.json).

This module reformulates the chain in a packed layout: P = L/ceil(C)
pixels per 128-lane word, activations stored [B, H, W/P, P*C] (dense).
Each conv3x3 becomes a sum of <= 9 dense [M, K]@[K, N] matmuls:

  * row taps (dr)   -> slices along H (strided for stride-2 stages);
  * column taps (dc) -> block-structured weights indexed by the word
    offset d in {-1, 0 (,+1 for stride 1)}: entry (d, j_in, c) ->
    (j_out, o) holds kernel[dr, dc, c, o] when the packed input pixel
    w_rel = d*P_in + j_in equals stride*j_out + dc - 1.

Because every pre-chain stage satisfies stride * P_out == P_in, the word
count W/P is invariant through the chain: pack once at the image, unpack
once at the end.  Pure XLA (no Pallas), so the backward pass gets the
same dense layouts for free and the op is CPU-testable.

Not the same as the measured-negative rewrites in `ops/conv_im2col.py`:
no 27x patch tensor is materialized (im2col) and the packing is not
limited to stride-2 stages (space-to-depth).

MEASURED NEGATIVE at the module shapes (v5e, B=7, 512px bf16, chained —
artifacts/packed_conv_experiment.json): the packed chain runs 7.37 ms vs
XLA's 4.47 (fwd) and 23.6 vs 20.2 ms (fwd+bwd).  XLA's own lowering of
the small-channel chain is ~4x faster than the lane-padding roofline
model predicted (it evidently already avoids the naive 8x-padded
schedule), and the packed version pays the strided row slices + 6-9
partial-utilization matmuls per stage.  The earlier 44 ms attribution of
the extractor's conv residual is NOT the pre-chain: see
scripts/extractor_knockout.py / artifacts/extractor_knockout.json.

Dispatch is therefore EXPLICIT OPT-IN ONLY (`DIFFCODEC_PACKED_EXTRACTOR=1`)
— kept for re-measurement on future toolchains, not production.  It must
not ride the `DIFFCODEC_FUSED_SILU_CONV` umbrella flag the bench sets.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _cin_pad(cin: int) -> int:
    """Smallest divisor-of-128 channel padding >= cin (<=128)."""
    for p in (1, 2, 4, 8, 16, 32, 64, 128):
        if p >= cin:
            return p
    raise ValueError(f"cin={cin} too large for packed layout")


def _pack_block_weights(kernel, cin_pad: int, p_in: int, stride: int):
    """[3,3,cin,cout] -> [3, n_off, p_in*cin_pad, p_out*cout]."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    p_out = p_in // stride
    k = jnp.pad(kernel, ((0, 0), (0, 0), (0, cin_pad - cin), (0, 0)))
    n_off = 3 if stride == 1 else 2
    Wb = jnp.zeros((3, n_off, p_in * cin_pad, p_out * cout), kernel.dtype)
    for oi in range(n_off):
        d = oi - 1
        for j_in in range(p_in):
            w_rel = d * p_in + j_in
            for j_out in range(p_out):
                dc = w_rel - stride * j_out + 1
                if 0 <= dc < 3:
                    Wb = Wb.at[:, oi,
                               j_in * cin_pad:(j_in + 1) * cin_pad,
                               j_out * cout:(j_out + 1) * cout].set(k[:, dc])
    return Wb


def packed_conv3x3(xp, kernel, bias, cin_pad: int, stride: int):
    """One packed conv3x3 SAME (+bias, f32 accumulation, no activation).

    xp [B, H, Wg, p_in*cin_pad] -> [B, H/stride, Wg, p_out*cout] in
    xp.dtype.  Requires stride * p_out == p_in (true when p_out is taken
    as p_in // stride and stride divides p_in)."""
    B, H, Wg, L = xp.shape
    p_in = L // cin_pad
    assert p_in * cin_pad == L and p_in % stride == 0, (L, cin_pad, stride)
    p_out = p_in // stride
    H_out = H // stride
    cout = kernel.shape[3]
    Wb = _pack_block_weights(kernel, cin_pad, p_in, stride).astype(xp.dtype)
    n_off = Wb.shape[1]
    xpad = jnp.pad(xp, ((0, 0), (1, 1),
                        (1, 1 if stride == 1 else 0), (0, 0)))
    acc = jnp.zeros((B, H_out, Wg, p_out * cout), jnp.float32)
    for dr in range(3):
        for oi in range(n_off):
            xs = xpad[:, dr:dr + stride * H_out:stride, oi:oi + Wg, :]
            acc = acc + lax.dot_general(
                xs, Wb[dr, oi], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc = acc + jnp.tile(bias, p_out).astype(jnp.float32)
    return acc.astype(xp.dtype)


def pack_nhwc(x, cin_pad: int):
    """[B,H,W,C] -> [B,H,W/p,p*cin_pad] with p = 128 // cin_pad."""
    B, H, W, C = x.shape
    p = 128 // cin_pad
    xr = x.reshape(B, H, W // p, p, C)
    if cin_pad != C:
        xr = jnp.pad(xr, ((0, 0),) * 4 + ((0, cin_pad - C),))
    return xr.reshape(B, H, W // p, p * cin_pad)


def unpack_words(xp, c: int):
    """[B,H,Wg,p*c] -> [B,H,Wg*p,c] (c un-padded by construction)."""
    B, H, Wg, L = xp.shape
    p = L // c
    return xp.reshape(B, H, Wg, p, c).reshape(B, H, Wg * p, c)


def run_packed_chain(x, kernels: Sequence, biases: Sequence,
                     strides: Sequence[int]):
    """conv3x3+bias+SiLU chain in packed space; pack/unpack at the ends.

    x [B,H,W,C] with C = kernels[0].shape[2]; returns [B,H',W',C_last] in
    x.dtype, numerically the flax chain up to contraction order (f32
    accumulation either way)."""
    cin_pad = _cin_pad(kernels[0].shape[2])
    h = pack_nhwc(x, cin_pad)
    for k, b, s in zip(kernels, biases, strides):
        h = packed_conv3x3(h, k.astype(x.dtype), b, cin_pad, s)
        h = jax.nn.silu(h)
        cin_pad = k.shape[3]
    return unpack_words(h, kernels[-1].shape[3])


def reference_chain(x, kernels: Sequence, biases: Sequence,
                    strides: Sequence[int]):
    """The unpacked path, flax-nn.Conv-identical numerics: promote to the
    input dtype, conv SAME ((1,1),(1,1)), bias add, SiLU."""
    h = x
    for k, b, s in zip(kernels, biases, strides):
        h = lax.conv_general_dilated(
            h, k.astype(h.dtype), (s, s), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.silu(h + b.astype(h.dtype))
    return h


def packed_chain_enabled() -> bool:
    """Explicit opt-in only — measured slower than XLA at the module
    shapes (module docstring); never piggybacks on the fused-conv flag."""
    return (os.environ.get("DIFFCODEC_PACKED_EXTRACTOR") == "1"
            and jax.default_backend() == "tpu")


def packed_chain_qualifies(x, kernels: Sequence,
                           strides: Sequence[int]) -> bool:
    """Shape gate: every stage must keep p_in % stride == 0 and the word
    grid integral; win measured at >=256px inputs (the 512px extractor
    pre-chains) — artifacts/packed_conv_experiment.json."""
    B, H, W, C = x.shape
    if H * W < 256 * 256 or x.dtype != jnp.bfloat16:
        return False
    if C != kernels[0].shape[2] or C > 128:
        return False
    p = 128 // _cin_pad(C)
    if W % p:
        return False
    for k, s in zip(kernels, strides):
        # p_in of each stage is the previous stage's p_out; the word grid
        # must stay integral and packing must survive the stride
        if p % s or H % s or W % s:
            return False
        p //= s
        H //= s
        W //= s
        if p < 1 or W % p:
            return False
    return True
