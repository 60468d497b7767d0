"""Attention implementation equivalence tests.

The denoise loop's hot op is the 64x64-latent self-attention
(`pipeline.py:308-385` UNet/ControlNet transformer blocks).  All memory-
bounded implementations must match the reference einsum math exactly
(qchunk: identical ops, just scanned) or to fp32-accumulation tolerance
(chunked online softmax).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcodec_tpu.models.layers import (Attention,
                                         _chunked_self_attention,
                                         _qblock_self_attention)


def _einsum_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _qkv(L, seed=0, B=2, H=3, D=40, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, L, H, D)), dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("L,q_block", [(1024, 512), (1536, 512), (640, 512)])
def test_qblock_matches_einsum_exactly(L, q_block):
    q, k, v = _qkv(L)
    scale = 0.158
    expected = _einsum_attention(q, k, v, scale)
    got = _qblock_self_attention(q, k, v, scale, q_block=q_block)
    # same math, but XLA fuses the scanned and monolithic graphs
    # differently -> fp32 roundoff-level differences only
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-6)


def test_qblock_bf16_close_to_einsum():
    q, k, v = _qkv(1024, dtype=jnp.bfloat16)
    scale = 0.158
    expected = _einsum_attention(q, k, v, scale).astype(jnp.float32)
    got = _qblock_self_attention(q, k, v, scale).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-2)  # bf16 resolution


def test_chunked_close_to_einsum():
    q, k, v = _qkv(1024)
    scale = 0.1
    expected = _einsum_attention(q, k, v, scale)
    got = _chunked_self_attention(q, k, v, scale, chunk=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)


def test_attention_module_impl_dispatch_equivalence():
    """The module output must not depend on the impl choice."""
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 1024, 32)),
                    jnp.float32)
    outs = {}
    for impl in ("einsum", "qchunk", "chunked"):
        m = Attention(heads=4, head_dim=8, self_attn_impl=impl,
                      long_attn_min_len=1024)
        params = m.init(jax.random.PRNGKey(0), x)
        outs[impl] = np.asarray(m.apply(params, x))
    np.testing.assert_allclose(outs["qchunk"], outs["einsum"], atol=1e-6)
    np.testing.assert_allclose(outs["chunked"], outs["einsum"], atol=1e-5)


def test_auto_dispatch_matches_einsum():
    """'auto' must be output-equivalent whichever branch it picks (on CPU:
    einsum when the logits fit the budget, qchunk when forced over it)."""
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 1024, 32)),
                    jnp.float32)
    ref = None
    for budget in (8 << 30, 1):  # fits -> einsum; tiny budget -> qchunk
        m = Attention(heads=4, head_dim=8, self_attn_impl="auto",
                      auto_logits_budget=budget, long_attn_min_len=1024)
        params = m.init(jax.random.PRNGKey(0), x)
        out = np.asarray(m.apply(params, x))
        if ref is None:
            ref = out
        else:
            np.testing.assert_allclose(out, ref, atol=1e-6)


def test_cross_attention_uses_einsum_path():
    """Cross-attention (L_kv=77) never routes through the long-self paths."""
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4096, 32)),
                    jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(3).standard_normal((1, 77, 32)),
                      jnp.float32)
    m = Attention(heads=4, head_dim=8, self_attn_impl="qchunk")
    params = m.init(jax.random.PRNGKey(0), x, ctx)
    out = m.apply(params, x, ctx)
    assert out.shape == (1, 4096, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_pick_self_attn_impl_policy():
    """The measured v5e dispatch boundaries (see pick_self_attn_impl
    docstring): flash below the 2048 length and at small B*heads, einsum
    at CFG-decode batches within the logits budget, qchunk beyond it with
    a ~2 GiB-bounded block."""
    from diffcodec_tpu.models.layers import pick_self_attn_impl

    GiB = 1024 ** 3
    # short-seq flash
    assert pick_self_attn_impl(14, 8, 1024, 1024, True, 8 * GiB)[0] == \
        "flash"
    # training batch at L=4096: flash (B*H = 32 <= 64)
    assert pick_self_attn_impl(4, 8, 4096, 4096, True, 8 * GiB)[0] == \
        "flash"
    # no-CFG GOP decode batch (B*H = 56): flash
    assert pick_self_attn_impl(7, 8, 4096, 4096, True, 8 * GiB)[0] == \
        "flash"
    # CFG decode batch (B*H = 112, logits 7.5 GiB <= 8 GiB): einsum
    assert pick_self_attn_impl(14, 8, 4096, 4096, True, 8 * GiB)[0] == \
        "einsum"
    # 2-GOP CFG batch (logits 15 GiB > budget): qchunk, block bounded
    impl, qb = pick_self_attn_impl(28, 8, 4096, 4096, True, 8 * GiB)
    assert impl == "qchunk"
    assert 256 <= qb <= 2048 and qb % 256 == 0
    assert 4 * 28 * 8 * 4096 * qb <= (2 << 30)
    # off-TPU: einsum within budget (flash is a TPU kernel)
    assert pick_self_attn_impl(4, 8, 4096, 4096, False, 8 * GiB)[0] == \
        "einsum"


def test_einsum_pvT_orientation_matches_std():
    """The lane-padded einsum branch (head_dim % 128 != 0) computes PV in
    the transposed orientation (o^T = v^T @ p^T, models/layers.py) —
    measured 3.64 vs 3.87 ms at the CFG decode shape with bit-identical
    output on TPU (artifacts/attn_orientation_experiment.json).  Pin the
    orientations equal at fp32 roundoff on any backend."""
    rng = np.random.default_rng(7)
    B, L, H, D = 2, 1024, 4, 40
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * (D ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    std = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    pvt = jnp.einsum("bkhd,bhqk->bhdq", v, p).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(pvt), np.asarray(std),
                               atol=2e-5, rtol=1e-5)
