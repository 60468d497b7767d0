"""Packed-lane conv chain (`ops/packed_conv.py`) vs the plain conv path.

The packed reformulation must be numerically equivalent to the
nn.Conv-identical reference chain (same math, different contraction
grouping/lane packing), including gradients, across the two pre-extractor
architectures it serves (`controlnet/extractors.py:215-238` and `:87-96`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffcodec_tpu.ops.packed_conv import (packed_chain_qualifies,
                                           packed_conv3x3, pack_nhwc,
                                           reference_chain, run_packed_chain,
                                           unpack_words, _cin_pad)

FEATURE_SPECS = [(16, 1), (32, 2), (32, 1), (64, 2), (64, 1)]
RESIDUE_SPECS = [(32, 1), (64, 2), (64, 2)]


def _assert_close(got, ref, tol=2e-6):
    """max|diff| <= tol * max|ref|: the two schedules differ only in f32
    contraction grouping, so the honest metric is error relative to the
    output scale (elementwise rtol trips on near-zero elements)."""
    got, ref = np.asarray(got), np.asarray(ref)
    scale = np.abs(ref).max() + 1e-12
    assert np.abs(got - ref).max() <= tol * scale, (
        np.abs(got - ref).max(), scale)


def _params(specs, cin, key, dtype=jnp.float32):
    ks, bs, ss = [], [], []
    for cout, s in specs:
        key, k1, k2 = jax.random.split(key, 3)
        ks.append(jax.random.normal(k1, (3, 3, cin, cout), dtype) * 0.3)
        bs.append(jax.random.normal(k2, (cout,), dtype) * 0.1)
        ss.append(s)
        cin = cout
    return ks, bs, ss


@pytest.mark.parametrize("specs", [FEATURE_SPECS, RESIDUE_SPECS])
@pytest.mark.parametrize("hw", [(32, 64), (64, 64)])
def test_packed_chain_matches_reference_f32(specs, hw):
    H, W = hw
    ks, bs, ss = _params(specs, 3, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 3), jnp.float32)
    ref = reference_chain(x, ks, bs, ss)
    got = run_packed_chain(x, ks, bs, ss)
    assert got.shape == ref.shape
    _assert_close(got, ref)


def test_packed_single_conv_stride1_and_2():
    # one stage in isolation, both strides, odd channel count (pad path)
    for cin, cout, stride in [(3, 16, 1), (16, 32, 2), (32, 32, 1),
                              (32, 64, 2)]:
        cp = _cin_pad(cin)
        k = jax.random.normal(jax.random.PRNGKey(cin), (3, 3, cin, cout),
                              jnp.float32) * 0.3
        b = jax.random.normal(jax.random.PRNGKey(cout), (cout,)) * 0.1
        x = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 128, cin))
        ref = reference_chain(x, [k], [b], [stride])
        xp = pack_nhwc(x, cp)
        got_p = packed_conv3x3(xp, k, b, cp, stride)
        got = unpack_words(jax.nn.silu(got_p), cout)
        _assert_close(got, ref)


def test_packed_chain_gradients_match():
    ks, bs, ss = _params(FEATURE_SPECS, 3, jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 64, 3))

    def loss(fn, ks_):
        return jnp.sum(fn(x, ks_, bs, ss) ** 2)

    g_ref = jax.grad(lambda k_: loss(reference_chain, k_))(ks)
    g_pkd = jax.grad(lambda k_: loss(run_packed_chain, k_))(ks)
    for a, b_ in zip(g_ref, g_pkd):
        _assert_close(b_, a, tol=5e-6)


def test_qualifier_gate():
    ks, bs, ss = _params(FEATURE_SPECS, 3, jax.random.PRNGKey(4),
                         jnp.bfloat16)
    big = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
    assert packed_chain_qualifies(big, ks, ss)
    # too small a spatial extent -> out (XLA is fine there)
    small = jnp.zeros((1, 128, 128, 3), jnp.bfloat16)
    assert not packed_chain_qualifies(small, ks, ss)
    # f32 -> out (padding waste is the bf16 lane tiling's)
    assert not packed_chain_qualifies(big.astype(jnp.float32), ks, ss)
    # word grid must divide W (p=8 at cin 3)
    ragged = jnp.zeros((1, 512, 500, 3), jnp.bfloat16)
    assert not packed_chain_qualifies(ragged, ks, ss)


def test_extractor_packed_path_matches_reference(monkeypatch):
    """End-to-end: BiDirFeatureExtractor with the packed path forced on
    (qualifier bypassed for the small CPU shape) equals the plain path."""
    import diffcodec_tpu.models.extractors as ex

    cond = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 6))
    flow = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 4))
    ext = ex.BiDirFeatureExtractor(dtype=jnp.float32)
    p = ext.init(jax.random.PRNGKey(2), cond, flow)
    ref = ext.apply(p, cond, flow)
    monkeypatch.setattr(ex, "packed_chain_enabled", lambda: True)
    monkeypatch.setattr(ex, "packed_chain_qualifies",
                        lambda *a, **k: True)
    got = ext.apply(p, cond, flow)
    for a, b in zip(ref, got):
        _assert_close(b, a)
