"""Pallas TPU kernel for the softsplat forward scatter-add.

Same one-hot two-matmul formulation as `ops/softsplat.py` (deterministic,
MXU-friendly, no atomics) but fused into a single kernel: the per-corner
one-hots and both contractions live entirely in VMEM, so the [q, W, C]
transient of the XLA scan version never touches HBM.

Grid: (batch, row-chunks).  The output block is the full [H, W, C] plane,
revisited by every row-chunk (zeroed on the first, accumulated after).
Per chunk the four corners stack along the (sublane) q axis and one
2-D matmul per output column does the scatter (Mosaic supports sublane
concats/reshapes but not lane-crossing ones).

Used by `splat_sum(..., impl='pallas')`; forward-only (the custom-vjp
backward reuses the differentiable XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _round_up(x, m):
    return (x + m - 1) // m * m


def _splat_kernel(vals_ref, flow_ref, out_ref, *, H, W, C, rows):
    """One (batch, row-chunk) program: scatter `rows` source rows into the
    full [H, W, C] output plane."""
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    q = rows * W
    vals = vals_ref[0].reshape(q, C)                    # [q, C]
    # keep every intermediate >= 2D ([q, 1] columns) — Mosaic lowers 1-D
    # vectors poorly (gather-rule failures)
    flow = flow_ref[0].reshape(q, 2)
    u = flow[:, 0:1]                                    # [q, 1]
    v = flow[:, 1:2]

    # absolute source coordinates of this chunk, built natively in (q, 1)
    # (Mosaic cannot reshape across the lane dim, so no (rows, W) iota)
    row0 = chunk * rows
    idx = jax.lax.broadcasted_iota(jnp.int32, (q, 1), 0)
    yq = row0 + idx // W
    xq = idx % W

    fx = xq.astype(jnp.float32) + u                     # [q, 1]
    fy = yq.astype(jnp.float32) + v
    finite = jnp.isfinite(fx) & jnp.isfinite(fy)
    fx = jnp.where(finite, fx, -10.0)
    fy = jnp.where(finite, fy, -10.0)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ax = fx - x0
    ay = fy - y0

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (q, H), 1)
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (q, W), 1)

    # stack the 4 corners along q (sublane concat — Mosaic-friendly; lane
    # reshapes are not), then contract once per output column:
    #   out[:, x, :] += A_all^T @ (Bw_all[:, x:x+1] * vals_all)
    A_parts, Bw_parts = [], []
    for ky in (0, 1):
        wy = ay if ky else 1.0 - ay
        Yf = y0 + ky
        for kx in (0, 1):
            wx = ax if kx else 1.0 - ax
            Xf = x0 + kx
            valid = (Xf >= 0) & (Xf < W) & (Yf >= 0) & (Yf < H)
            w = jnp.where(valid, wx * wy, 0.0)          # [q, 1]
            Yd = jnp.clip(Yf, 0, H - 1).astype(jnp.int32)   # [q, 1]
            Xd = jnp.clip(Xf, 0, W - 1).astype(jnp.int32)
            A_parts.append((Yd == rows_iota).astype(jnp.float32))
            Bw_parts.append((Xd == cols_iota).astype(jnp.float32) * w)
    A_all = jnp.concatenate(A_parts, axis=0)       # [4q, H]
    Bw_all = jnp.concatenate(Bw_parts, axis=0)     # [4q, W]
    vals_all = jnp.concatenate([vals] * 4, axis=0)  # [4q, C]

    # fori_loop (not an unrolled Python loop): Mosaic stack-allocates every
    # unrolled iteration's transients simultaneously -> VMEM OOM at W=64.
    # Column extraction via one-hot masked reduce (value dynamic_slice is
    # not lowerable).
    cols_iota4 = jax.lax.broadcasted_iota(jnp.int32, (4 * q, W), 1)

    def column_body(x, _):
        col = jnp.sum(jnp.where(cols_iota4 == x, Bw_all, 0.0), axis=1,
                      keepdims=True)                # [4q, 1]
        M = col * vals_all                          # [4q, C]
        # HIGHEST: the MXU otherwise rounds M to bf16 (the CUDA reference
        # accumulates in fp32)
        contrib = lax.dot_general(
            A_all, M, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)        # [H, C]
        out_ref[0, :, pl.ds(x, 1), :] += contrib[:, None, :]
        return 0

    jax.lax.fori_loop(0, W, column_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def splat_sum_pallas(vals: jnp.ndarray, flow: jnp.ndarray,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Raw 'sum'-mode splat via the fused Pallas kernel.  fp32 NHWC."""
    B, H, W, C = vals.shape
    vals = vals.astype(jnp.float32)
    flow = flow.astype(jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # rows per chunk: bound the corner-stacked VMEM transients
    # (A_all [4q, H] + Bw_all [4q, W] + vals_all/M [4q, C] with q = rows*W).
    # 384K keeps Mosaic's stack under the 16M scoped-vmem default with
    # headroom — at 768K the mask-splat instance inside the full sampler
    # program hit 16.51M and failed to compile at 2-GOP batches.
    budget = 384 * 1024
    per_row = 4 * W * (H + W + 3 * C)
    rows = max(1, budget // max(per_row, 1))
    rows = min(rows, H)
    n_chunks = -(-H // rows)
    pad = n_chunks * rows - H
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad), (0, 0), (0, 0)))
        # NaN-free padding with flow that lands out of range
        flow = jnp.pad(flow, ((0, 0), (0, pad), (0, 0), (0, 0)),
                       constant_values=-1e6)

    kernel = functools.partial(_splat_kernel, H=H, W=W, C=C, rows=rows)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rows, W, C),
                         lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, rows, W, 2),
                         lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b, i: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(vals, flow)
    return out


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu
    # raise the scoped-vmem ceiling for this kernel: its stack transients
    # (~8M at the 384K chunk budget) plus XLA's in-context accounting can
    # exceed the 16M default inside large programs
    return pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
