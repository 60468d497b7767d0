"""Decoder-side mesh sharding: a GOP batch sharded over the data axis must
decode identically to the unsharded run (the (GOP inter-frames x tiles)
parallelism story of SURVEY.md sections 2.5/5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import (ControlNetConfig, MeshConfig,
                                  SamplerConfig, SchedulerConfig, UNetConfig,
                                  VAEConfig)
from diffcodec_tpu.models.controlnet import DualFlowControlNet
from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
from diffcodec_tpu.models.vae import AutoencoderKL
from diffcodec_tpu.parallel.mesh import make_mesh, shard_batch
from diffcodec_tpu.sampling.pipeline import DualFlowPipeline
from diffcodec_tpu.sampling.schedulers import NoiseSchedule

@pytest.mark.slow
def test_gop_batch_decode_sharded_matches_unsharded():
    unet = UNet2DConditionModel(UNetConfig.tiny())
    cn = DualFlowControlNet(ControlNetConfig.tiny())
    vae = AutoencoderKL(VAEConfig(base_channels=8, channel_mults=(1, 1, 2, 2),
                                  layers_per_block=1))
    pipe = DualFlowPipeline(
        unet=unet, controlnet=cn, vae=vae,
        schedule=NoiseSchedule.create(SchedulerConfig()),
        sampler=SamplerConfig(num_inference_steps=2, guidance_scale=2.0,
                              freeu=False))
    B, H = 8, 32  # a GOP batch spread over the 8 virtual devices
    z = jnp.zeros
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "unet": unet.init(k1, z((1, 4, 4, 4)), z((1,), jnp.int32),
                          z((1, 5, 32))),
        "controlnet": cn.init(k2, z((1, 4, 4, 4)), z((1,), jnp.int32),
                              z((1, 5, 32)), z((1, H, H, 6)),
                              z((1, H, H, 4))),
        "vae": vae.init(k3, z((1, H, H, 3))),
    }
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((B, 4, 4, 4))
                          .astype(np.float32))
    text = jnp.asarray(rng.standard_normal((B, 5, 32)).astype(np.float32)
                       * 0.1)
    uncond = z((B, 5, 32))
    cond = jnp.asarray(rng.random((B, H, H, 6), dtype=np.float32))
    flow = z((B, H, H, 4))

    denoise = jax.jit(pipe.denoise)
    ref = np.asarray(denoise(params, latents, text, uncond, cond, flow))

    mesh = make_mesh(MeshConfig())
    batch = shard_batch(mesh, {"latents": latents, "text": text,
                               "uncond": uncond, "cond": cond, "flow": flow})
    out = denoise(params, batch["latents"], batch["text"], batch["uncond"],
                  batch["cond"], batch["flow"])
    # output really is sharded over the mesh
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=1e-4)
