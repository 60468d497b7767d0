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
