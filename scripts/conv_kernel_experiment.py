"""EXPERIMENT (kept for the record): fused silu+conv3x3 Pallas kernel.

Motivation: the VAE decoder's 512px/128ch resnet stages run at ~34 TF/s
under XLA's conv lowering (artifacts/profile_vae.json).  This kernel
streams halo row-tiles HBM->VMEM (double-buffered manual DMA across grid
steps), applies SiLU on the tile, and accumulates the 9 shifted-tap
matmuls in fp32 VMEM.

Measured on v5e (chained x10, B=7 512x512x128->128, exact vs XLA ref at
bf16 tolerance):

    pallas th=8/16/32:  10.3 ms   52 TF/s
    xla silu+conv:      12.4 ms   44 TF/s

Only 1.2x: per 16-row tile the fp32 SiLU on the (Th+2, W+8, 128) tile
(~13 us of VPU transcendentals) and the three sublane-axis W-slice copies
cost as much as the nine 8192x128x128 MXU taps (~10 us), so the kernel is
VPU/copy-bound, not MXU-bound — the same wall XLA's lowering hits.  A
pure-conv variant (SiLU prefused by XLA) projects to ~1.6x on the conv
alone, worth ~1% end-to-end decode fps; not productionized.  Mosaic
gotchas hit on the way (documented for future kernels): bf16 sigmoid
fails verification (f32-const broadcast into bf16 vector — compute in
f32); DMA slice extents on the second-to-last (sublane-tiled) dim must be
8-aligned (pad W to 8k); unrolled per-tap slice+reshape stacks ~9 VMEM
temporaries and blows the 16 MB scoped limit (slice W once per column
tap; raise vmem_limit_bytes).

Run: python scripts/conv_kernel_experiment.py   (PROTO_CPU=1 for the
interpret-mode correctness check.)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("PROTO_CPU") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_hbm, w_ref, b_ref, o_ref, xtile, acc, sems):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    Th = o_ref.shape[1]
    Wp = xtile.shape[2]          # W + 8 (aligned); taps use [dc, dc+W)
    C = xtile.shape[3]
    O = o_ref.shape[3]

    def dma(slot, row_block):
        return pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(row_block * Th, Th + 2)],
            xtile.at[slot],
            sems.at[slot],
        )

    # warm-up: first tile of this (b, i) sequence
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
def fused_silu_conv3x3(x, kernel, bias, th: int = 16,
                       interpret: bool = False):
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    assert H % th == 0
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
            pltpu.VMEM((1, 1), jnp.float32),  # placeholder (unused)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * C * O,
            bytes_accessed=2 * B * H * W * (C + O),
            transcendentals=B * H * W * C),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, kb, bias.reshape(1, -1))


def ref_conv(x, kernel, bias):
    h = x * jax.nn.sigmoid(x)
    out = jax.lax.conv_general_dilated(
        h, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


def main():
    interp = os.environ.get("PROTO_CPU") == "1"
    rng = np.random.RandomState(0)
    if interp:
        B, H, W, C, O = 1, 32, 16, 128, 128
    else:
        B, H, W, C, O = 7, 512, 512, 128, 128
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, C, O) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)

    got = fused_silu_conv3x3(x, k, bias, th=8, interpret=interp)
    want = ref_conv(x, k, bias)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
    den = jnp.max(jnp.abs(want.astype(jnp.float32)))
    print(f"max|err|={float(err):.5f} rel={float(err/den):.6f}")
    assert float(err / den) < 2e-2

    if interp:
        print("interpret-mode OK")
        return

    # timing: chained
    def chain(f, *args, rep=10):
        @jax.jit
        def loop(x0):
            def body(_, xx):
                o = f(xx, *args)
                s = (jnp.sum(o).astype(jnp.float32) * 1e-20).astype(x0.dtype)
                return xx + s
            return jax.lax.fori_loop(0, rep, body, x0)
        r = loop(x); float(jnp.sum(r.astype(jnp.float32)))
        best = 1e9
        for _ in range(3):
            t = time.time(); r = loop(x)
            float(jnp.sum(r.astype(jnp.float32)))
            best = min(best, time.time() - t)
        return best / rep

    for th in (8, 16, 32):
        t = chain(lambda xx: fused_silu_conv3x3(xx, k, bias, th=th))
        gf = 2 * 9 * B * H * W * C * O / 1e9
        print(f"pallas th={th}: {t*1e3:7.2f} ms  {gf/t/1e3:6.1f} TF/s")
    t = chain(lambda xx: ref_conv(xx, k, bias))
    print(f"xla conv:      {t*1e3:7.2f} ms  {gf/t/1e3:6.1f} TF/s")


if __name__ == "__main__":
    main()
