"""im2col small-channel conv3x3 vs the flax/XLA reference lowering.

Numeric parity on CPU; the TPU timing evidence lives in
scripts/profile_extractor.py / artifacts/profile_extractor.json."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from diffcodec_tpu.ops.conv_im2col import (_conv3x3_im2col, _conv3x3_ref,
                                           _im2col_bwd, conv3x3_act)


def _data(B=2, H=16, W=16, C=8, O=8, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, C, O) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)
    return x, k, b


@pytest.mark.parametrize("stride", [1, 2, 4])
@pytest.mark.parametrize("acts", [("none", "silu"), ("silu", "none"),
                                  ("none", "none")])
def test_im2col_matches_ref(stride, acts):
    x, k, b = _data()
    got = _conv3x3_im2col(x, k, b, stride, *acts)
    want = _conv3x3_ref(x, k, b, stride, *acts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("H,W", [(15, 14), (13, 16)])
def test_im2col_odd_spatial(H, W):
    x, k, b = _data(H=H, W=W)
    for stride in (1, 2):
        got = _conv3x3_im2col(x, k, b, stride, "none", "silu")
        want = _conv3x3_ref(x, k, b, stride, "none", "silu")
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_ref_matches_flax_conv_bitexact():
    """Flag-off path must be numerically identical to nn.Conv + silu
    (what the extractors emitted before ConvAct existed)."""
    x, k, b = _data()
    for stride in (1, 2):
        conv = nn.Conv(k.shape[-1], (3, 3), strides=(stride, stride),
                       padding=((1, 1), (1, 1)))
        want = nn.silu(conv.apply({"params": {"kernel": k, "bias": b}}, x))
        got = _conv3x3_ref(x, k, b, stride, "none", "silu")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_custom_vjp_matches_ref_grad():
    x, k, b = _data()

    def loss(x, k, b):
        return jnp.sum(jnp.sin(_conv3x3_ref(x, k, b, 2, "none", "silu")))

    gx, gk, gb = jax.grad(loss, argnums=(0, 1, 2))(x, k, b)
    g = jax.grad(lambda y: jnp.sum(jnp.sin(y)))(
        _conv3x3_ref(x, k, b, 2, "none", "silu"))
    gx2, gk2, gb2 = _im2col_bwd(2, "none", "silu", (x, k, b), g)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb2), atol=1e-5)


def test_dispatch_fallback_off_tpu():
    """On CPU the dispatcher must take the reference path even when the
    env flag is set (im2col is a TPU scheduling decision)."""
    import os
    x, k, b = _data()
    os.environ["DIFFCODEC_FUSED_SILU_CONV"] = "1"
    try:
        got = conv3x3_act(x, k, b, 1, "none", "silu")
    finally:
        del os.environ["DIFFCODEC_FUSED_SILU_CONV"]
    want = _conv3x3_ref(x, k, b, 1, "none", "silu")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("pad", [((1, 1), (1, 1)), ((0, 1), (0, 1))])
@pytest.mark.parametrize("H,W", [(16, 16), (15, 14), (13, 17)])
def test_s2d_stride2_matches_ref(pad, H, W):
    """Space-to-depth 3x3/s2 == direct conv for both pad conventions
    (extractor (1,1) and SD-VAE downsample (0,1)).  Dispatch is disabled
    (measured loss, see _s2_qualifies) — the math stays verified."""
    from diffcodec_tpu.ops.conv_im2col import (_conv3x3_s2_ref,
                                               _conv3x3_s2_s2d)
    x, k, b = _data(H=H, W=W)
    got = _conv3x3_s2_s2d(x, k, b, pad, "none", "silu")
    want = _conv3x3_s2_ref(x, k, b, pad, "none", "silu")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_s2d_custom_vjp_matches_ref_grad():
    from diffcodec_tpu.ops.conv_im2col import _conv3x3_s2_ref, _s2d_bwd
    x, k, b = _data()
    pad = ((0, 1), (0, 1))
    g = jax.grad(lambda y: jnp.sum(jnp.sin(y)))(
        _conv3x3_s2_ref(x, k, b, pad, "none", "silu"))
    gx2, gk2, gb2 = _s2d_bwd(pad, "none", "silu", (x, k, b), g)
    gx, gk, gb = jax.grad(
        lambda x, k, b: jnp.sum(jnp.sin(
            _conv3x3_s2_ref(x, k, b, pad, "none", "silu"))),
        argnums=(0, 1, 2))(x, k, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb2), atol=1e-5)
