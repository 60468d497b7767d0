"""CLIP ViT-L/14 text encoder in flax (SD-1.5 text conditioning).

Architecture parity with the frozen HF `CLIPTextModel` the reference loads
(`train_controlnet.py:798-800`): token + position embeddings, 12 pre-LN
transformer layers (quick-GELU MLP), causal mask, final LayerNorm.  The
pipeline consumes `last_hidden_state` ([B, 77, 768]) as cross-attention
context (`pipeline.py:223-236`).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import CLIPTextConfig


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        B, L, D = x.shape
        head_dim = D // self.heads
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(D, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, L, self.heads, head_dim)
        k = k.reshape(B, L, self.heads, head_dim)
        v = v.reshape(B, L, self.heads, head_dim)
        scale = 1.0 / math.sqrt(head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * scale
        logits = jnp.where(causal_mask, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.heads, dtype=self.dtype,
                              name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(x.shape[-1] * 4, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        """input_ids [B, L] int32 -> last_hidden_state [B, L, D]."""
        c = self.cfg
        B, L = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_dim, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (c.max_length, c.hidden_dim))
        x = tok + pos[None, :L].astype(tok.dtype)
        mask = jnp.tril(jnp.ones((L, L), bool))[None, None]
        for i in range(c.layers):
            x = CLIPLayer(c.heads, dtype=self.dtype,
                          name=f"layers_{i}")(x, mask)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
