"""Tests for the residual pixel DDPM UNet, CMP, CLIP text encoder, LPIPS."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import CLIPTextConfig
from diffcodec_tpu.models.clip_text import CLIPTextEncoder
from diffcodec_tpu.models.cmp import CMP, fuse_discrete_flow
from diffcodec_tpu.models.unet2d import UNet2DModel
from diffcodec_tpu.train.lpips import LPIPS


def test_residual_unet2d_shapes():
    unet = UNet2DModel(block_out_channels=(8, 16), layers_per_block=1,
                       attn_blocks=(False, True))
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.asarray([5])
    params = unet.init(jax.random.PRNGKey(0), x, t)
    out = unet.apply(params, x, t)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_fuse_discrete_flow_expectation():
    # peaked logits at a single bin -> expectation == that bin's center
    nbins, fmax = 99, 50.0
    step = 2 * fmax / nbins
    prob = np.zeros((1, 2, 2, 2 * nbins), np.float32)
    prob[..., 10] = 50.0       # u bin 10
    prob[..., nbins + 90] = 50.0  # v bin 90
    flow = np.asarray(fuse_discrete_flow(jnp.asarray(prob), nbins, fmax))
    np.testing.assert_allclose(flow[..., 0], 10 * step - fmax + step / 2,
                               atol=1e-3)
    np.testing.assert_allclose(flow[..., 1], 90 * step - fmax + step / 2,
                               atol=1e-3)


def test_cmp_shapes():
    # H, W >= 64: the decoder's pool-8 branch needs >= 1 px at stride /8
    # (same constraint as the reference decoder at decoder.py:138-151)
    cmp = CMP(img_enc_dim=16, sparse_enc_dim=4, nbins=9, fmax=50.0)
    img = jnp.zeros((1, 64, 64, 3))
    sparse = jnp.zeros((1, 64, 64, 4))
    variables = cmp.init(jax.random.PRNGKey(0), img, sparse)
    flow = cmp.apply(variables, img, sparse)
    assert flow.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(flow)).all()
    # flow magnitudes bounded by fmax (softmax expectation over bin centers)
    assert np.abs(np.asarray(flow)).max() <= 50.0


def test_clip_text_encoder():
    cfg = CLIPTextConfig.tiny()
    enc = CLIPTextEncoder(cfg)
    ids = jnp.asarray([[1, 4, 7, 2, 0, 0, 0, 0]], jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids)
    out = enc.apply(params, ids)
    assert out.shape == (1, 8, cfg.hidden_dim)
    # causal: changing a later token must not affect earlier positions
    ids2 = ids.at[0, 5].set(9)
    out2 = enc.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(out[:, :5]), np.asarray(out2[:, :5]),
                               atol=1e-5)
    assert np.abs(np.asarray(out[:, 5:]) - np.asarray(out2[:, 5:])).max() > \
        1e-6


def test_lpips_zero_for_identical_positive_for_different():
    lp = LPIPS()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    params = lp.init(jax.random.PRNGKey(0), a, b)
    d_same = np.asarray(lp.apply(params, a, a))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    d_diff = np.asarray(lp.apply(params, a, b))
    assert d_diff.shape == (1,)
    # random lin weights can be any sign; nonzero magnitude is the check
    assert np.abs(d_diff).max() > 1e-8
