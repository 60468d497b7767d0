"""Shared flax.linen building blocks for the SD-1.5 model family.

NHWC layout throughout; params are fp32, compute dtype is configurable
(bf16 by default on TPU).  These blocks implement the architecture of the
frozen HF Stable-Diffusion-1.5 stack the reference builds on
(`train_controlnet.py:805-814` loads AutoencoderKL / UNet2DConditionModel /
CLIPTextModel) — re-implemented TPU-first, not translated.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jnp.ndarray:
    """Sinusoidal timestep embeddings (HF `Timesteps` semantics for SD-1.5:
    flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift))
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                          axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP lifting sinusoidal embeddings to the time channel dim."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)


class _GNParams(nn.Module):
    """Bare GroupNorm scale/bias params with nn.GroupNorm's exact tree
    ({'scale','bias'} of shape (C,), ones/zeros init) so the affine-only
    path below shares checkpoints with the nn.GroupNorm path."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32 for stability, cast back to dtype.

    With `return_affine=True` it instead returns the folded per-(batch,
    channel) affine (scale, shift) f32 arrays such that
    `x * scale + shift == groupnorm(x)` — consumed by the fused
    GN+SiLU+conv Pallas kernel (`ops.conv_pallas.gn_silu_conv3x3`).  The
    param tree is identical in both modes.
    """
    num_groups: int = 32
    eps: float = 1e-5
    use_scale_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_affine: bool = False):
        orig = x.dtype
        groups = self.num_groups
        C = x.shape[-1]
        while C % groups:  # tiny test configs have < 32 channels
            groups //= 2
        if return_affine:
            assert self.use_scale_bias
            scale, bias = _GNParams(C, name="norm")()
            B = x.shape[0]
            gs = C // groups
            xg = x.astype(jnp.float32).reshape(B, -1, groups, gs)
            mu = jnp.mean(xg, axis=(1, 3))                    # [B, g]
            mu2 = jnp.mean(xg * xg, axis=(1, 3))
            var = jnp.maximum(mu2 - mu * mu, 0.0)
            mul = jax.lax.rsqrt(var + self.eps)               # [B, g]
            mulc = jnp.repeat(mul, gs, axis=1) * scale[None]  # [B, C]
            shift = bias[None] - jnp.repeat(mu, gs, axis=1) * mulc
            return mulc, shift
        x = nn.GroupNorm(num_groups=groups, epsilon=self.eps,
                         use_bias=self.use_scale_bias,
                         use_scale=self.use_scale_bias,
                         dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        return x.astype(orig)


def zeros_conv_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class ZeroConv(nn.Module):
    """Zero-initialised conv (ControlNet residual heads / zero_module parity,
    `controlnet/control_utils.py:6-9`)."""
    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, self.kernel_size, padding="SAME",
                       kernel_init=zeros_conv_init, bias_init=zeros_conv_init,
                       dtype=self.dtype, name="conv")(x)


class SiluConv(nn.Module):
    """SiLU -> 3x3 SAME conv, param-tree-identical to nn.Conv (same
    'kernel'/'bias' names, shapes, and default inits) so converters and
    checkpoints are unaffected.  Dispatches to the fused halo-DMA Pallas
    kernel (`ops.conv_pallas`) when `DIFFCODEC_FUSED_SILU_CONV=1` and the
    shape is in the kernel's measured win window (VAE 512px/128ch stages);
    otherwise emits the exact ops flax's Conv lowers to.

    When `scale`/`shift` (a folded GroupNorm affine from
    `GroupNorm32(return_affine=True)`) are given, the normalization is
    fused in too — and `residual` adds a tensor in the kernel epilogue
    (the resnet shortcut), removing two more HBM round trips."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale=None, shift=None, residual=None):
        from diffcodec_tpu.ops.conv_pallas import (gn_silu_conv3x3,
                                                   silu_conv3x3)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        if scale is None:
            assert residual is None
            x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                      dtype=self.dtype)
            return silu_conv3x3(x, kernel, bias)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        return gn_silu_conv3x3(x, scale, shift, kernel, bias, residual)


class ResnetBlock2D(nn.Module):
    """SD resnet block: GN-SiLU-conv, +time, GN-SiLU-conv, +shortcut."""
    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        from diffcodec_tpu.ops.conv_pallas import gn_silu_conv_qualifies
        residual = x
        g1 = GroupNorm32(self.groups, self.eps, dtype=self.dtype,
                         name="norm1")
        c1 = SiluConv(self.out_channels, dtype=self.dtype, name="conv1")
        if gn_silu_conv_qualifies(x, self.out_channels):
            sc, sh = g1(x, return_affine=True)
            h = c1(x, scale=sc, shift=sh)
        else:
            h = c1(g1(x))
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        g2 = GroupNorm32(self.groups, self.eps, dtype=self.dtype,
                         name="norm2")
        c2 = SiluConv(self.out_channels, dtype=self.dtype, name="conv2")
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        if gn_silu_conv_qualifies(h, self.out_channels):
            sc, sh = g2(h, return_affine=True)
            return c2(h, scale=sc, shift=sh, residual=residual)
        return c2(g2(h)) + residual


def _flash_self_attention(q, k, v, scale):
    """Pallas TPU flash attention for long self-attention sequences.

    Inputs [B, L, H, D]; pads head_dim to 128 lanes (zero-padded K => same
    logits; zero-padded V columns stay zero) and seq to a block multiple.
    The naive XLA path materializes [B, H, L, L] logits in HBM (at 64x64
    latents that is GBs of traffic per layer); flash keeps tiles in VMEM.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    B, L, H, D = q.shape
    Dp = max(128, (D + 127) // 128 * 128)
    block = min(512, L)
    Lp = (L + block - 1) // block * block

    def prep(t):
        t = t.transpose(0, 2, 1, 3)  # [B, H, L, D]
        return jnp.pad(t, ((0, 0), (0, 0), (0, Lp - L), (0, Dp - D)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    if Lp != L:
        # mask padded KV rows via segment ids (padding gets a different id)
        ids = (jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1) < L)
        seg = fa.SegmentIds(q=ids.astype(jnp.int32),
                            kv=ids.astype(jnp.int32))
    else:
        seg = None
    sizes = fa.BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block)
    out = fa.flash_attention(qp, kp, vp, segment_ids=seg, causal=False,
                             sm_scale=scale, block_sizes=sizes)
    return out[:, :, :L, :D].transpose(0, 2, 1, 3)  # [B, L, H, D]


def _qblock_self_attention(q, k, v, scale, q_block: int = 512):
    """Exact attention scanned over Q blocks.

    Each step computes a full-row softmax over all keys for one block of
    queries, so the math is identical to the einsum path (same matmul
    shapes, no online-softmax correction arithmetic) but the fp32 logits
    buffer is [B, H, q_block, Lk] instead of [B, H, Lq, Lk] — at 64x64
    latents that is 8x less HBM, which is what unlocks multi-GOP decode
    batches (the reference-scale einsum logits are ~15 GB at 28 frames
    with CFG).

    q, k, v: [B, L, H, D]; returns [B, Lq, H, D] in v.dtype.
    """
    B, Lq, H, D = q.shape
    pad = (-Lq) % q_block
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nb = (Lq + pad) // q_block
    qb = q.reshape(B, nb, q_block, H, D).transpose(1, 0, 2, 3, 4)

    def body(_, qblk):
        s = jnp.einsum("bqhd,bkhd->bhqk", qblk, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        return None, o

    _, outs = jax.lax.scan(body, None, qb)  # [nb, B, q_block, H, D]
    out = outs.transpose(1, 0, 2, 3, 4).reshape(B, Lq + pad, H, D)
    return out[:, :Lq]


def _chunked_self_attention(q, k, v, scale, chunk: int = 1024):
    """Memory-efficient attention: lax.scan over KV chunks with online
    softmax (f32 running max / denominator / accumulator).  Peak memory
    O(B*H*Lq*chunk) instead of O(B*H*Lq*Lk) — unlocks multi-GOP decode
    batches that OOM the einsum path's logits.

    q, k, v: [B, L, H, D]; returns [B, L, H, D] in v.dtype.
    """
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    chunk = min(chunk, Lk)
    pad = (-Lk) % chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nc = (Lk + pad) // chunk
    kc = k.reshape(B, nc, chunk, H, D).transpose(1, 0, 2, 3, 4)
    vc = v.reshape(B, nc, chunk, H, D).transpose(1, 0, 2, 3, 4)
    # mask for the padded tail chunk
    valid = (jnp.arange(nc * chunk) < Lk).reshape(nc, 1, 1, 1, chunk)

    m0 = jnp.full((B, H, Lq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, Lq, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, Lq, D), jnp.float32)

    def body(carry, xs):
        m, l, acc = carry
        kb, vb, vmask = xs
        s = jnp.einsum("bqhd,bkhd->bhqk", q, kb,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(vmask, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhqk,bkhd->bhqd", p.astype(vb.dtype), vb,
                        preferred_element_type=jnp.float32)
        acc = acc * corr + pv
        return (m_new, l, acc), None

    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), (kc, vc, valid))
    out = acc / l
    return out.transpose(0, 2, 1, 3).astype(v.dtype)  # [B, Lq, H, D]


def pick_self_attn_impl(B: int, heads: int, Lq: int, Lk: int,
                        on_tpu: bool, logits_budget: int):
    """Static (trace-time) long-self-attention implementation choice.

    Returns (impl, q_block).  The boundaries are MEASURED on v5e at the
    SD shapes (D=40, bf16 operands / f32 softmax; scripts/profile_train.py
    history + the round-2 chained timings):

      * Lq < 2048: flash (2.4 vs einsum 3.2 ms at B14 L1024 D80).
      * Lq >= 2048, B*heads <= 64: flash — the einsum path hits a flat
        ~6.9 ms/block floor regardless of batch while flash scales with
        the padded FLOPs (3.05 vs 6.91 ms fwd at B*H=32; 11.6 vs 23.8 ms
        fwd+bwd).  This is the branch that lifts training (batch 4-8) and
        the no-CFG distilled decode (GOP batch 7) off the floor.
      * Lq >= 2048, B*heads > 64: einsum while the f32 logits fit the
        budget (einsum 6.88 vs flash 9.57 ms at B*H=112, the CFG decode
        batch), else qchunk with the block sized to ~2 GiB of logits.
    """
    q_block = 2048
    logits_bytes = 4 * B * heads * Lq * Lk
    if on_tpu and Lq < 2048:
        return "flash", q_block
    if on_tpu and B * heads <= 64:
        return "flash", q_block
    if logits_bytes <= logits_budget:
        return "einsum", q_block
    per_row = 4 * B * heads * Lk
    q_block = max(256, min(2048, (2 << 30) // per_row // 256 * 256))
    return "qchunk", q_block


class Attention(nn.Module):
    """Multi-head attention with optional cross-attention context.

    Projections are bias-free q/k/v + out (SD convention).  Long
    self-attention sequences (>= flash_min_len tokens on TPU) use the Pallas
    flash kernel; everything else uses fp32-softmax einsum attention.
    """
    heads: int
    head_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    # long self-attention implementation (all equivalent math; measured
    # chained-op times on v5e at SD shapes, bf16 operands / f32 softmax):
    #   'auto'   - static shape-based dispatch (the default):
    #              L in [1024, 2048) -> flash (2.4ms vs einsum 3.2ms at
    #              B14 L1024 D80); L >= 2048 -> einsum while the f32
    #              logits fit the budget (7.8ms at B14 L4096 D40), else
    #              qchunk (15.0ms at B28 L4096 where einsum OOMs; flash
    #              is 20.3ms there - MXU-bound on 40->128 lane padding)
    #   'einsum' - full [B,H,L,L] f32 logits
    #   'qchunk' - exact softmax scanned over Q blocks, O(L*block) logits
    #   'flash'  - stock Pallas kernel (pads head_dim to 128 lanes)
    #   'chunked'- online-softmax KV scan, lowest memory
    self_attn_impl: str = "auto"
    # einsum logits budget for 'auto' (bytes); 8 GiB keeps the single-GOP
    # decode batch (14 CFG samples at 64x64 -> 7 GiB logits) on the fast
    # einsum path while pushing 2+-GOP batches to qchunk
    auto_logits_budget: int = 8 * 1024 ** 3
    # impls other than einsum kick in only for self-attention sequences at
    # least this long
    long_attn_min_len: int = 1024

    @nn.compact
    def __call__(self, x, context=None):
        is_self = context is None
        context = x if context is None else context
        inner = self.heads * self.head_dim
        out_dim = self.out_dim or x.shape[-1]
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_v")(context)

        B, Lq, _ = q.shape
        Lk = k.shape[1]
        q = q.reshape(B, Lq, self.heads, self.head_dim)
        k = k.reshape(B, Lk, self.heads, self.head_dim)
        v = v.reshape(B, Lk, self.heads, self.head_dim)
        scale = 1.0 / math.sqrt(self.head_dim)

        long_self = (is_self and Lq >= self.long_attn_min_len and Lq == Lk)
        impl = self.self_attn_impl
        q_block = 2048
        if long_self and impl == "auto":
            # Trace-time override (same pattern as DIFFCODEC_FUSED_SILU_CONV):
            # the 'auto' boundaries are measured for INFERENCE; under
            # gradients the einsum branch additionally saves its f32 logits
            # + probs for the backward pass (8 GB + 4 GB at batch 16,
            # L=4096, 8 heads — the measured single-chip OOM constraint for
            # batch>8 training, scripts/bench_train.py).  The training
            # harnesses set this to 'flash' (bounded-memory Pallas kernel
            # with its own fwd/bwd, already auto-picked at batch<=8 where
            # B*heads <= 64).
            env = os.environ.get("DIFFCODEC_LONG_ATTN_IMPL", "")
            if env:
                impl = env
            else:
                impl, q_block = pick_self_attn_impl(
                    B, self.heads, Lq, Lk,
                    on_tpu=jax.default_backend() == "tpu",
                    logits_budget=self.auto_logits_budget)
        if long_self and impl == "flash" and \
                jax.default_backend() == "tpu":
            out = _flash_self_attention(q, k, v, scale)
        elif long_self and impl == "qchunk":
            out = _qblock_self_attention(q, k, v, scale, q_block=q_block)
        elif long_self and impl == "chunked":
            out = _chunked_self_attention(q, k, v, scale)
        else:
            # bf16 operands with f32 MXU accumulation (one MXU pass instead
            # of the ~6 an f32xf32 matmul costs) + f32 softmax.  Measured
            # fastest of {f32-operand einsum, bf16 softmax, pallas-flash
            # with lane padding} for SD-1.5 shapes on v5e.
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            if long_self and self.head_dim % 128 != 0:
                # transposed-PV orientation for lane-padded head dims:
                # o^T = v^T @ p^T streams d rows at 8/16-granule SUBLANE
                # padding (40->48, 1.2x) instead of padding d to 128
                # output LANES (3.2x).  Isolated PV: 4.45 vs 9.08 ms at
                # [14,8,4096,40]; fused full-attention: 3.64 vs 3.87 ms
                # there and 4.96 vs 5.07 at [14,8,1024,80], output
                # bit-identical at both shapes
                # (artifacts/attn_orientation_experiment.json,
                # scripts/attn_orientation_experiment.py)
                out = jnp.einsum("bkhd,bhqk->bhdq", v,
                                 probs).transpose(0, 3, 1, 2)
            else:
                out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(B, Lq, inner)
        return nn.Dense(out_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU: HF GEGLU uses torch F.gelu's default, not the
        # tanh approximation (flax's default) — the ~1e-3 divergence is
        # visible in real-weight numerics
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU-FF, each residual."""
    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # eps 1e-5: torch nn.LayerNorm default, used by HF
        # BasicTransformerBlock (flax's default is 1e-6)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.heads, self.head_dim, dtype=self.dtype,
                          name="attn1")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(self.heads, self.head_dim, dtype=self.dtype,
                          name="attn2")(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(dtype=self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> 1x1 proj_in -> blocks -> 1x1 proj_out + res."""
    heads: int
    head_dim: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = GroupNorm32(32, 1e-6, dtype=self.dtype, name="norm")(x)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        for i in range(self.depth):
            h = BasicTransformerBlock(self.heads, self.head_dim,
                                      dtype=self.dtype,
                                      name=f"blocks_{i}")(h, context)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class Downsample2D(nn.Module):
    """Strided 3x3 downsampling conv.

    The UNet variant pads symmetrically (HF downsample_padding=1); the VAE
    encoder variant (`asymmetric_pad=True`) pads right/bottom only — HF's
    Encoder builds Downsample2D with padding=0 and F.pads (0,1,0,1) in
    forward.  Same output shape on even inputs, different values.
    """
    out_channels: int
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((0, 1), (0, 1)) if self.asymmetric_pad else ((1, 1), (1, 1))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding=pad, dtype=self.dtype, name="conv")(x)


class _UpsampleConv(nn.Module):
    """conv3x3(nearest_up2(x)) computed as four phase convs.

    For nearest 2x upsampling, output pixel (2i+di, 2j+dj) reads input
    pixels {i + floor((di+a-1)/2)} for tap a — i.e. each output phase
    (di, dj) in {0,1}^2 sees only a 2x2 window of the ORIGINAL input,
    with adjacent 3x3 taps collapsing onto the same input pixel:

        di=0: rows (i-1: W[0],  i: W[1]+W[2])
        di=1: rows (i:  W[0]+W[1], i+1: W[2])      (same for columns)

    So the op equals four 2x2 convs at the input resolution whose outputs
    interleave into the 2x-upsampled grid: 16 taps per input pixel instead
    of 36, and the 4x-upsampled input tensor is never materialized.  Param
    layout is identical to the nn.Conv it replaces (kernel [3,3,C,O] +
    bias), so checkpoints and the HF weight converters are unaffected.
    """
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        O = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, C, O), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (O,), jnp.float32)
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        from diffcodec_tpu.ops import conv_pallas as _cp
        if _cp.upsample_conv_qualifies(x, O):
            # fused halo-DMA kernel: streams x once, all 16 collapsed taps
            # per tile, row phases interleaved in-register (measured
            # 1.24-2.16x at the VAE stages — gate docstring)
            return _cp.upsample_conv3x3(x, k, bias.astype(self.dtype))
        # collapse rows: [2, 3, C, O] per row phase
        rows = {0: jnp.stack([k[0], k[1] + k[2]], axis=0),
                1: jnp.stack([k[0] + k[1], k[2]], axis=0)}
        outs = []
        for di in (0, 1):
            for dj in (0, 1):
                kr = rows[di]
                kp = (jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], axis=1)
                      if dj == 0 else
                      jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], axis=1))
                pad = ((1 - di, di), (1 - dj, dj))
                outs.append(jax.lax.conv_general_dilated(
                    x, kp, window_strides=(1, 1), padding=pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=self.dtype))
        y = jnp.stack(outs, axis=3).reshape(B, H, W, 2, 2, O)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, O)
        return y + bias.astype(self.dtype)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # nearest-2x upsample + 3x3 conv, fused into phase convs (see
        # _UpsampleConv); named "conv" to keep the param tree of the
        # broadcast+nn.Conv formulation it replaces
        return _UpsampleConv(self.out_channels, dtype=self.dtype,
                             name="conv")(x)


class AttentionBlock2D(nn.Module):
    """Single-head spatial self-attention used in the VAE mid block."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(32, 1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        scale = 1.0 / math.sqrt(C)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class ConvBlock(nn.Module):
    """conv3x3(+stride)-SiLU-conv3x3-SiLU, `extractors.py:14-24` parity."""
    out_channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = (self.stride, self.stride)
        pad = ((1, 1), (1, 1))
        x = nn.Conv(self.out_channels, (3, 3), strides=s, padding=pad,
                    dtype=self.dtype, name="conv1")(x)
        # conv2 is silu-preceded: SiluConv (identical param tree / exact
        # fallback) lets the 512px small-channel extractor stages ride the
        # fused halo kernel under DIFFCODEC_FUSED_SILU_CONV=1
        x = SiluConv(self.out_channels, dtype=self.dtype, name="conv2")(x)
        return nn.silu(x)
