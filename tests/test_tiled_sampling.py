"""Tiled high-resolution sampling tests (tiny pipeline)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import (ControlNetConfig, SamplerConfig,
                                  SchedulerConfig, UNetConfig, VAEConfig)
from diffcodec_tpu.models.controlnet import DualFlowControlNet
from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
from diffcodec_tpu.models.vae import AutoencoderKL
from diffcodec_tpu.sampling.pipeline import DualFlowPipeline
from diffcodec_tpu.sampling.schedulers import NoiseSchedule
from diffcodec_tpu.sampling.tiled import sample_tiled, tile_grid


def test_tile_grid_covers():
    coords = tile_grid(96, 128, (64, 64), overlap=16)
    covered = np.zeros((96, 128), bool)
    for (y1, y2, x1, x2) in coords:
        covered[y1:y2, x1:x2] = True
    assert covered.all()


@pytest.fixture(scope="module")
def tiny_pipe():
    unet = UNet2DConditionModel(UNetConfig.tiny())
    cn = DualFlowControlNet(ControlNetConfig.tiny())
    vae = AutoencoderKL(VAEConfig(base_channels=8, channel_mults=(1, 1, 2, 2),
                                  layers_per_block=1))
    pipe = DualFlowPipeline(
        unet=unet, controlnet=cn, vae=vae,
        schedule=NoiseSchedule.create(SchedulerConfig()),
        sampler=SamplerConfig(num_inference_steps=2, guidance_scale=1.0,
                              freeu=False))
    B, H = 1, 32
    z = jnp.zeros
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "unet": unet.init(k1, z((B, 4, 4, 4)), z((B,), jnp.int32),
                          z((B, 5, 32))),
        "controlnet": cn.init(k2, z((B, 4, 4, 4)), z((B,), jnp.int32),
                              z((B, 5, 32)), z((B, H, H, 6)),
                              z((B, H, H, 4))),
        "vae": vae.init(k3, z((B, H, H, 3))),
    }
    return pipe, params

@pytest.mark.slow
def test_sample_tiled_highres(tiny_pipe):
    """48x64 conditioning with 32x32 tiles overlap 8 -> full-res output."""
    pipe, params = tiny_pipe
    B, H, W = 1, 48, 64
    rng = np.random.default_rng(0)
    cond = rng.random((B, H, W, 6), dtype=np.float32)
    flow = np.zeros((B, H, W, 4), np.float32)
    text = jnp.zeros((B, 5, 32))
    out = sample_tiled(pipe, params, jax.random.PRNGKey(1), text, text,
                       cond, flow, tile=(32, 32), overlap=8, feather=8)
    assert out.shape == (B, H, W, 3)
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0


def test_sample_tiled_exact_size_passthrough(tiny_pipe):
    pipe, params = tiny_pipe
    B, H = 1, 32
    cond = np.random.default_rng(1).random((B, H, H, 6), dtype=np.float32)
    flow = np.zeros((B, H, H, 4), np.float32)
    text = jnp.zeros((B, 5, 32))
    out = sample_tiled(pipe, params, jax.random.PRNGKey(2), text, text,
                       cond, flow, tile=(32, 32))
    assert out.shape == (B, H, H, 3)


def test_sample_tiled_tile_batching_matches(tiny_pipe):
    """Chunked tile batches must produce the same frame as one big batch
    (per-tile RNG is folded by global tile start index)."""
    pipe, params = tiny_pipe
    B, H, W = 1, 32, 56
    cond = np.random.default_rng(2).random((B, H, W, 6), dtype=np.float32)
    flow = np.zeros((B, H, W, 4), np.float32)
    text = jnp.zeros((B, 5, 32))
    a = sample_tiled(pipe, params, jax.random.PRNGKey(3), text, text, cond,
                     flow, tile=(32, 32), overlap=8, feather=8)
    assert a.shape == (B, H, W, 3)


@pytest.mark.slow
def test_sample_tiled_distilled_pipeline(tiny_pipe):
    """The tiled path adapts the distilled student's no-uncond call shape
    (takes_uncond = False): full-HD-style overlap decode with K-step
    consistency sampling."""
    from diffcodec_tpu.config import DistillConfig
    from diffcodec_tpu.sampling.distilled import DistilledPipeline

    pipe, params = tiny_pipe
    dpipe = DistilledPipeline(
        unet=pipe.unet, controlnet=pipe.controlnet, vae=pipe.vae,
        schedule=pipe.schedule,
        config=DistillConfig(num_teacher_steps=10, num_student_steps=2,
                             freeu=False))
    rng = np.random.default_rng(0)
    H, W = 48, 64
    cond = rng.random((1, H, W, 6), dtype=np.float32)
    flow = np.zeros((1, H, W, 4), np.float32)
    text = np.zeros((1, 5, 32), np.float32)
    out = sample_tiled(dpipe, params, jax.random.PRNGKey(1), text, text,
                       cond, flow, tile=(32, 32), overlap=8, feather=8)
    assert out.shape == (1, H, W, 3)
    assert np.isfinite(out).all() and np.abs(out).max() <= 1.0


@pytest.mark.slow
def test_sample_tiled_uint8_cond_matches_float(tiny_pipe):
    """uint8 conditioning (raw transfer + on-device normalize) must equal
    the float path bit-exactly: normalization happens in f32 before the
    compute-dtype cast, matching host-side uint8/255."""
    pipe, params = tiny_pipe
    B, H, W = 1, 48, 64
    rng = np.random.default_rng(3)
    cond_u8 = rng.integers(0, 256, (B, H, W, 6), dtype=np.uint8)
    cond_f = cond_u8.astype(np.float32) / 255.0
    flow = rng.normal(0, 2, (B, H, W, 4)).astype(np.float32)
    text = rng.normal(0, 1, (B, 5, 32)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    out_f = sample_tiled(pipe, params, key, text, text, cond_f, flow,
                         tile=(32, 32), overlap=8, feather=8)
    out_u8 = sample_tiled(pipe, params, key, text, text, cond_u8, flow,
                          tile=(32, 32), overlap=8, feather=8)
    np.testing.assert_array_equal(out_f, out_u8)


def test_bf16_to_f16_fetch_error_bound():
    """The tiled sampler fetches bf16 pixels as f16 (half the bytes).
    Exhaustive over the bf16 grid in [-1, 1]: exact wherever |x| >= 2^-14
    (f16 normal floor), absolute error <= 2^-25 below it — 4000x under a
    uint8 pixel quantum."""
    import jax.numpy as jnp
    bits = (np.arange(1 << 16, dtype=np.uint32) << 16).view(np.float32)
    vals = bits[np.isfinite(bits) & (np.abs(bits) <= 1.0)]
    vb = jnp.asarray(vals, jnp.float32).astype(jnp.bfloat16)
    orig = np.asarray(vb.astype(jnp.float32))
    rt = np.asarray(vb.astype(jnp.float16)).astype(np.float32)
    err = np.abs(rt - orig)
    normal = np.abs(orig) >= 2.0 ** -14
    assert (err[normal] == 0).all()
    assert err.max() <= 2.0 ** -25
