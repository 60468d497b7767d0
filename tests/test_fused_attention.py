"""Fused Pallas attention vs the f32 einsum oracle (interpret mode on CPU;
the kernel is re-verified on real TPU by the perf harness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcodec_tpu.ops.attention import fused_attention


def _oracle(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return np.asarray(out)


@pytest.mark.parametrize("B,L,H,D", [(2, 256, 2, 40), (1, 512, 4, 80),
                                     (1, 128, 2, 160), (2, 256, 1, 128)])
def test_fused_attention_matches_oracle(B, L, H, D):
    scale = 1.0 / np.sqrt(D)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, L, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, L, H, D), jnp.float32)
    v = jax.random.normal(kv, (B, L, H, D), jnp.float32)
    ref = _oracle(q, k, v, scale)
    got = np.asarray(fused_attention(q, k, v, scale, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_fused_attention_bf16_close():
    B, L, H, D = 1, 256, 2, 40
    scale = 1.0 / np.sqrt(D)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (B, L, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, L, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, L, H, D), jnp.bfloat16)
    ref = _oracle(q, k, v, scale)
    got = np.asarray(fused_attention(q, k, v, scale,
                                     interpret=True)).astype(np.float32)
    assert np.abs(got - ref).max() < 0.05


@pytest.mark.parametrize("Lk", [128, 77])
def test_fused_attention_cross_short_kv(Lk):
    """Cross-attention: true 77-token CLIP context (padded keys must get
    zero softmax mass, matching torch SDPA) and the 128 tile boundary."""
    B, Lq, H, D = 2, 256, 2, 40
    scale = 1.0 / np.sqrt(D)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(kq, (B, Lq, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, Lk, H, D), jnp.float32)
    v = jax.random.normal(kv, (B, Lk, H, D), jnp.float32)
    ref = _oracle(q, k, v, scale)
    got = np.asarray(fused_attention(q, k, v, scale, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_fused_attention_ragged_lq():
    """Lq not a multiple of the block: padded query rows are sliced off."""
    B, Lq, Lk, H, D = 1, 200, 77, 2, 40
    scale = 1.0 / np.sqrt(D)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (B, Lq, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, Lk, H, D), jnp.float32)
    v = jax.random.normal(kv, (B, Lk, H, D), jnp.float32)
    ref = _oracle(q, k, v, scale)
    got = np.asarray(fused_attention(q, k, v, scale, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_pick_block_q_divides_headline_shapes():
    """Regression (ADVICE r2): the picker must return a divisor of Lq at
    every SD latent length, for bf16 and fp32, within the VMEM budget."""
    from diffcodec_tpu.ops.attention import _pick_block_q
    for Lq in (4096, 1024, 256, 128):
        for Dp in (128, 256):
            for itemsize in (2, 4):
                bq = _pick_block_q(Lq, Lq, Dp, itemsize)
                assert Lq % bq == 0, (Lq, Dp, itemsize, bq)
                need = (2 * Lq * Dp * itemsize + bq * Lq * (4 + itemsize)
                        + 4 * bq * Dp * itemsize)
                # soft budget 12 MB; the minimum-block fallback may use up
                # to the 16 MB scoped-VMEM hard limit
                assert need <= 16 * 1024 * 1024
