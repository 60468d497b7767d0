"""Fused softmax attention kernels for SD transformer shapes on TPU.

The reference runs HF diffusers attention (torch SDPA) inside the UNet /
ControlNet transformers (`pipeline.py:358-367`); on TPU the equivalent hot
op is self-attention at 64x64 (L=4096, head_dim 40) and 32x32 (L=1024,
head_dim 80) latents.  Measured on v5e (chained x10):

  - the plain einsum path materializes [B,H,L,L] fp32 logits in HBM; at
    L=4096/B=14 that is within ~7% of the padded-matmul floor (XLA
    overlaps the traffic well), but at L=1024 it is HBM-bound;
  - the stock `jax.experimental.pallas.ops.tpu.flash_attention` kernel
    loses to both at these head dims (online-softmax arithmetic + fp32
    internals dominate at short sequences).

This kernel computes one full softmax row block per grid step: the whole
K/V for a (batch, head) stays resident in VMEM (L <= 4096 fits easily),
each grid step computes `softmax(q_blk @ K^T) @ V` with fp32 logits that
never leave VMEM.  No online-softmax correction arithmetic, no HBM logits.
head_dim is zero-padded to the 128-lane tile (zero K columns leave logits
unchanged; zero V columns produce zeros that are sliced off).  Lk is
zero-padded to the 128-lane tile too, with padded key logits masked to
-inf inside the kernel, so the 77-token CLIP cross-attention context gives
exactly the reference (HF/SDPA) softmax over 77 keys.  The padded-MXU cost
is the same as the einsum path's - the win is removing the logits HBM
round-trip and softmax passes over HBM.

VMEM budget (v5e scoped limit is 16 MB): fp32 logits block is
block_q x L x 4 bytes; block_q=256 at L=4096 is 4 MB, plus K/V at
2 x L x 128 x 2 = 2 MB and bf16 probs 2 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634


def _make_kernel(Lk: int, Lkp: int):
    def _fused_kernel(q_ref, k_ref, v_ref, o_ref):
        """One q block against the full K/V of one (batch*head).

        q: [1, bq, Dp] (pre-scaled by softmax scale * log2(e)),
        k/v: [1, Lkp, Dp].  Keys at columns >= Lk are zero padding; their
        logits are masked to -inf so they get zero softmax mass (matching
        torch SDPA over the unpadded Lk keys).
        """
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        # q [bq, Dp] . k [Lkp, Dp] contracted over lanes; Mosaic transposes
        # the k tile in VMEM (cheaper than a HBM-level transpose by the
        # caller).
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if Lk != Lkp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < Lk, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = (o / l).astype(o_ref.dtype)

    return _fused_kernel


def _pick_block_q(Lq: int, Lk: int, Dp: int, itemsize: int) -> int:
    """Largest q block that divides Lq and whose fp32 logits + probs + K/V
    + q/o buffers fit the 16 MB scoped-VMEM limit with headroom for double
    buffering.  Candidates are powers of two so every SD latent length
    (4096 / 1024 / 256 / 128) is divisible; non-power-of-two Lq falls
    back to the largest divisor candidate."""
    budget = 12 * 1024 * 1024
    kv = 2 * Lk * Dp * itemsize
    for bq in (1024, 512, 256, 128):
        if bq > Lq or Lq % bq:
            continue
        # fp32 logits + probs in kernel dtype + double-buffered q/o blocks
        need = kv + bq * Lk * (4 + itemsize) + 4 * bq * Dp * itemsize
        if need <= budget:
            return bq
    return min(128, Lq)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret"))
def fused_attention(q, k, v, scale: float, block_q: int = 0,
                    interpret: bool = False):
    """Exact softmax attention, fused in VMEM.

    q: [B, Lq, H, D], k/v: [B, Lk, H, D] -> [B, Lq, H, D] (q.dtype).
    Lq and Lk may be any length (both are padded to the 128 tile
    internally; padded keys are masked, padded query rows are sliced off);
    D <= 256.
    """
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    Dp = 128 * ((D + 127) // 128)
    Lkp = 128 * ((Lk + 127) // 128)
    bq = block_q or _pick_block_q(max(Lq, 128), Lkp, Dp, q.dtype.itemsize)
    Lqp = bq * ((Lq + bq - 1) // bq)
    q = q * jnp.asarray(scale * _LOG2E, q.dtype)

    def pack(t, L, Lp):
        t = t.transpose(0, 2, 1, 3).reshape(B * H, L, D)
        if Dp != D or Lp != L:
            t = jnp.pad(t, ((0, 0), (0, Lp - L), (0, Dp - D)))
        return t

    qp, kp, vp = pack(q, Lq, Lqp), pack(k, Lk, Lkp), pack(v, Lk, Lkp)
    grid = (B * H, Lqp // bq)
    out = pl.pallas_call(
        _make_kernel(Lk, Lkp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lkp, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lkp, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, Dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lqp, Dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lqp * Lkp * Dp,
            bytes_accessed=2 * B * H * (2 * Lqp + 2 * Lkp) * Dp,
            transcendentals=B * H * Lqp * Lkp),
        interpret=interpret,
    )(qp, kp, vp)
    out = out[:, :Lq, :D]
    return out.reshape(B, H, Lq, D).transpose(0, 2, 1, 3)
