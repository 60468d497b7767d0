"""Shape/behaviour tests for the model layer (tiny configs, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import ControlNetConfig, UNetConfig, VAEConfig
from diffcodec_tpu.models.controlnet import DualFlowControlNet, ResControlNet
from diffcodec_tpu.models.extractors import (BiDirFeatureExtractor,
                                             FeatureWarperSoftsplat,
                                             WarpExtractor)
from diffcodec_tpu.models.unet2d_condition import (UNet2DConditionModel,
                                                   fourier_filter)
from diffcodec_tpu.models.vae import (AutoencoderKL, decode_from_latents,
                                      encode_to_latents)


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_vae_roundtrip_shapes(rng):
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params = vae.init(rng, x)
    mean, logvar = vae.apply(params, x, method=vae.encode)
    # tiny cfg has 2 levels -> /2 spatial
    assert mean.shape == (1, 16, 16, cfg.latent_channels)
    assert logvar.shape == mean.shape
    recon = vae.apply(params, mean, method=vae.decode)
    assert recon.shape == x.shape
    lat = encode_to_latents(vae, params, x)
    assert lat.shape == mean.shape
    out = decode_from_latents(vae, params, lat)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_unet_shapes_and_residual_injection(rng):
    cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(cfg)
    B, h, w = 2, 16, 16
    sample = jnp.ones((B, h, w, 4)) * 0.1
    t = jnp.asarray([10, 500])
    ctx = jnp.ones((B, 7, cfg.cross_attention_dim)) * 0.02
    params = unet.init(rng, sample, t, ctx)
    out = unet.apply(params, sample, t, ctx)
    assert out.shape == (B, h, w, 4)

    # residual injection for the 3-block tiny config: conv_in + per block
    # (1 resnet + downsample except last) = 6 residuals
    down = [jnp.zeros((B, h, w, 32)), jnp.zeros((B, h, w, 32)),
            jnp.zeros((B, h // 2, w // 2, 32)),
            jnp.zeros((B, h // 2, w // 2, 64)),
            jnp.zeros((B, h // 4, w // 4, 64)),
            jnp.zeros((B, h // 4, w // 4, 64))]
    mid = jnp.zeros((B, h // 4, w // 4, 64))
    out_zero = unet.apply(params, sample, t, ctx,
                          down_block_additional_residuals=down,
                          mid_block_additional_residual=mid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_zero),
                               atol=1e-6)
    # nonzero residuals must change the output
    down[0] = jnp.ones_like(down[0])
    out_inj = unet.apply(params, sample, t, ctx,
                         down_block_additional_residuals=down,
                         mid_block_additional_residual=mid)
    assert np.abs(np.asarray(out_inj) - np.asarray(out)).max() > 1e-4


def test_unet_freeu_changes_output(rng):
    cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(cfg)
    sample = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t = jnp.asarray([100])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 32))
    params = unet.init(rng, sample, t, ctx)
    base = unet.apply(params, sample, t, ctx)
    freeu = unet.apply(params, sample, t, ctx, freeu=(0.9, 0.2, 1.2, 1.4))
    assert np.abs(np.asarray(freeu) - np.asarray(base)).max() > 1e-5


def test_fourier_filter_identity_at_scale_one():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    out = fourier_filter(x, threshold=1, scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_fourier_filter_matches_fft_reference():
    """The projector-matmul fourier_filter equals the FFT oracle,
    including odd sizes and non-square maps."""
    from diffcodec_tpu.models.unet2d_condition import _fourier_filter_fft
    for shape, thr, scale in (((2, 16, 16, 8), 1, 0.9),
                              ((1, 8, 12, 4), 1, 1.2),
                              ((1, 9, 7, 4), 2, 0.5),
                              ((2, 32, 32, 3), 4, 0.2)):
        x = jax.random.normal(jax.random.PRNGKey(7), shape)
        ref = np.asarray(_fourier_filter_fft(x, thr, scale))
        got = np.asarray(fourier_filter(x, thr, scale))
        np.testing.assert_allclose(got, ref, atol=2e-4)


def test_bidir_feature_extractor_pyramid(rng):
    ext = BiDirFeatureExtractor(inject_channels=(32, 64))
    H = 64
    cond = jnp.ones((1, H, H, 6)) * 0.5
    flow = jnp.zeros((1, H, H, 4))
    params = ext.init(rng, cond, flow)
    feats = ext.apply(params, cond, flow)
    assert feats[0].shape == (1, H // 8, H // 8, 32)
    assert feats[1].shape == (1, H // 16, H // 16, 64)
    # zero convs -> exactly zero at init
    for f in feats:
        np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-7)


def test_warp_extractor_pyramid(rng):
    ext = WarpExtractor(inject_channels=(32, 64))
    x = jnp.ones((1, 64, 64, 3))
    params = ext.init(rng, x)
    feats = ext.apply(params, x)
    assert feats[0].shape == (1, 8, 8, 32)
    assert feats[1].shape == (1, 4, 4, 64)


def test_feature_warper_moves_features(rng):
    warper = FeatureWarperSoftsplat()
    feat = jnp.zeros((1, 8, 8, 4)).at[:, 2, 2].set(1.0)
    flow = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(3.0)
    params = warper.init(rng, feat, flow)
    warped, metric = warper.apply(params, feat, flow)
    assert warped.shape == feat.shape
    assert metric.shape == (1, 8, 8, 1)
    w = np.asarray(warped)
    assert w[0, 2, 5].sum() > 0.5  # moved +3 in x
    assert w[0, 2, 2].sum() < 1e-5


def test_dual_flow_controlnet_outputs(rng):
    cfg = ControlNetConfig.tiny()
    net = DualFlowControlNet(cfg)
    B, H = 1, 64
    h = H // 8
    sample = jnp.ones((B, h, h, 4)) * 0.1
    t = jnp.asarray([3])
    ctx = jnp.ones((B, 7, cfg.unet.cross_attention_dim)) * 0.01
    cond = jnp.ones((B, H, H, 6)) * 0.5
    flow = jnp.zeros((B, H, H, 4))
    params = net.init(rng, sample, t, ctx, cond, flow)
    down, mid = net.apply(params, sample, t, ctx, cond, flow)
    # 3 blocks x 1 layer: conv_in + res0 + down0 + res1 + down1 + res2 = 6
    assert len(down) == 6
    assert down[0].shape == (B, h, h, 32)
    assert down[-1].shape == (B, h // 4, h // 4, 64)
    assert mid.shape == (B, h // 4, h // 4, 64)
    # zero-conv heads -> zeros at init
    for d in down:
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(mid), 0.0, atol=1e-7)
    # conditioning_scale scales everything
    down2, mid2 = net.apply(params, sample, t, ctx, cond, flow,
                            conditioning_scale=2.0)
    for a, b in zip(down + (mid,), down2 + (mid2,)):
        np.testing.assert_allclose(np.asarray(b), 2 * np.asarray(a),
                                   atol=1e-7)


def test_res_controlnet_outputs(rng):
    cfg = ControlNetConfig.tiny()
    net = ResControlNet(cfg)
    B, H = 1, 64
    h = H // 8
    sample = jnp.ones((B, h, h, 4)) * 0.1
    t = jnp.asarray([3])
    ctx = jnp.ones((B, 7, cfg.unet.cross_attention_dim)) * 0.01
    cond = jnp.ones((B, H, H, 6)) * 0.5
    flow = jnp.zeros((B, H, H, 4))
    warp = jnp.ones((B, H, H, 3)) * 0.3
    params = net.init(rng, sample, t, ctx, cond, flow, warp)
    down, mid = net.apply(params, sample, t, ctx, cond, flow, warp)
    assert len(down) == 6
    assert mid.shape == (B, h // 4, h // 4, 64)


def test_upsample_phase_conv_matches_naive():
    """_UpsampleConv (four 2x2 phase convs) equals nearest-up2 + conv3x3."""
    from diffcodec_tpu.models.layers import Upsample2D
    rng = jax.random.PRNGKey(11)
    x = jax.random.normal(rng, (2, 7, 5, 6))
    up = Upsample2D(out_channels=8)
    params = up.init(jax.random.PRNGKey(12), x)
    got = np.asarray(up.apply(params, x))
    kernel = np.asarray(params["params"]["conv"]["kernel"])
    bias = np.asarray(params["params"]["conv"]["bias"])
    B, H, W, C = x.shape
    x_up = jnp.broadcast_to(x[:, :, None, :, None, :],
                            (B, H, 2, W, 2, C)).reshape(B, 2 * H, 2 * W, C)
    ref = jax.lax.conv_general_dilated(
        x_up, jnp.asarray(kernel), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-4, rtol=1e-4)
