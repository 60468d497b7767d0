"""Residual path, validation, logging utilities tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.train.residue import make_residue_batch, warp_and_fuse
from diffcodec_tpu.utils.logging import (AverageMeter, MetricsLogger,
                                         StepTimer, create_logger)


def test_warp_and_fuse_zero_flow_identity():
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    zero = jnp.zeros((1, 16, 16, 2))
    fused, occ1, occ2 = warp_and_fuse(img1, img2, zero, zero)
    # zero flow: no occlusion, fused = average of the two anchors
    assert float(occ1.sum()) == 0.0 and float(occ2.sum()) == 0.0
    np.testing.assert_allclose(np.asarray(fused),
                               np.asarray(0.5 * (img1 + img2)),
                               rtol=1e-4, atol=1e-5)


def test_warp_and_fuse_uses_both_directions():
    """Regression for the reference bug (dataset.py:239-250) that warped
    image1 twice: warping must read from img2 for direction 2."""
    img1 = jnp.zeros((1, 8, 8, 3))
    img2 = jnp.ones((1, 8, 8, 3))
    zero = jnp.zeros((1, 8, 8, 2))
    fused, _, _ = warp_and_fuse(img1, img2, zero, zero)
    np.testing.assert_allclose(np.asarray(fused), 0.5, atol=1e-5)


def test_make_residue_batch():
    rng = np.random.default_rng(1)
    B, H = 2, 16
    batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (B, H, H, 3))
                             .astype(np.float32)),
        "cond": jnp.asarray(rng.uniform(0, 1, (B, H, H, 6))
                            .astype(np.float32)),
        "flow": jnp.zeros((B, H, H, 4)),
    }
    out = make_residue_batch(batch)
    assert out["warped"].shape == (B, H, H, 3)
    assert out["residual"].shape == (B, H, H, 3)
    np.testing.assert_allclose(
        np.asarray(out["residual"]),
        np.asarray(batch["image"] - out["warped"]), atol=1e-6)
    want = np.asarray(batch["cond"][..., :3] + batch["cond"][..., 3:]) - 1.0
    np.testing.assert_allclose(np.asarray(out["warped"]), want,
                               rtol=1e-4, atol=1e-5)


def test_validation_run(tmp_path):
    from diffcodec_tpu.config import (ControlNetConfig, SamplerConfig,
                                      SchedulerConfig, UNetConfig, VAEConfig)
    from diffcodec_tpu.models.controlnet import DualFlowControlNet
    from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
    from diffcodec_tpu.models.vae import AutoencoderKL
    from diffcodec_tpu.sampling.pipeline import DualFlowPipeline
    from diffcodec_tpu.sampling.schedulers import NoiseSchedule
    from diffcodec_tpu.train.validation import make_panel, run_validation

    unet = UNet2DConditionModel(UNetConfig.tiny())
    cn = DualFlowControlNet(ControlNetConfig.tiny())
    vae = AutoencoderKL(VAEConfig(base_channels=8,
                                  channel_mults=(1, 1, 2, 2),
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
    batch = {
        "cond": np.random.default_rng(2).random((B, H, H, 6),
                                                dtype=np.float32),
        "flow": np.zeros((B, H, H, 4), np.float32),
        "image": np.random.default_rng(3).uniform(
            -1, 1, (B, H, H, 3)).astype(np.float32),
    }
    out_dir = str(tmp_path / "panels")
    metrics = run_validation(pipe, params, batch, z((B, 5, 32)),
                             z((B, 5, 32)), jax.random.PRNGKey(9),
                             out_dir=out_dir, step=7)
    assert np.isfinite(metrics["val_psnr"])
    files = os.listdir(out_dir)
    assert any(f.startswith("val_0000007") for f in files)
    panel = make_panel(*[np.zeros((8, 8, 3), np.uint8)] * 4)
    assert panel.shape == (8, 32, 3)


def test_average_meter_and_timer():
    m = AverageMeter()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.0
    mw = AverageMeter(window=2)
    for v in (1.0, 2.0, 3.0):
        mw.update(v)
    assert mw.avg == 2.5
    t = StepTimer()
    with t:
        pass
    assert t.steps_per_sec > 0


def test_metrics_logger(tmp_path, capsys):
    logger = MetricsLogger()
    logger.log({"loss": 1.5}, step=3)  # must not raise
