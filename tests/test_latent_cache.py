"""Latent-moments cache: equality with the online VAE encode.

The train step's frozen-encoder forward (`train_controlnet.py:1081-1082`
in the reference; 78 ms of the 425 ms batch-8 step here) is skippable by
caching the posterior moments per sample — these tests pin the equality
contract (same rng => same math; loss and gradients agree to float
fusion-order rounding across the two XLA programs) and the safety gates.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import (ControlNetConfig, SchedulerConfig,
                                  TrainConfig, UNetConfig, VAEConfig)
from diffcodec_tpu.models.controlnet import DualFlowControlNet
from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
from diffcodec_tpu.models.vae import AutoencoderKL
from diffcodec_tpu.sampling.schedulers import NoiseSchedule
from diffcodec_tpu.train.latent_cache import (LatentCachedDataset,
                                              cache_complete,
                                              precompute_latent_moments)
from diffcodec_tpu.train.trainer import ControlNetTrainer


class _FakeDataset:
    """Indexable sample-dict dataset (UniDataset surface, in-memory)."""

    transform = False

    def __init__(self, n=5, H=32, seed=0):
        rng = np.random.default_rng(seed)
        self.samples = [{
            "image": (rng.random((H, H, 3), np.float32) * 2 - 1),
            "cond": rng.random((H, H, 6), np.float32),
            "flow": np.zeros((H, H, 4), np.float32),
            "text": f"caption {i}",
        } for i in range(n)]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return dict(self.samples[i])


def _tiny_stack(rng, B=2, H=32):
    unet_cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(unet_cfg)
    controlnet = DualFlowControlNet(ControlNetConfig.tiny())
    vae = AutoencoderKL(VAEConfig(base_channels=8,
                                  channel_mults=(1, 1, 2, 2),
                                  layers_per_block=1))
    h = H // 8
    k1, k2, k3 = jax.random.split(rng, 3)
    cn_params = controlnet.init(
        k1, jnp.zeros((B, h, h, 4)), jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, 5, unet_cfg.cross_attention_dim)),
        jnp.zeros((B, H, H, 6)), jnp.zeros((B, H, H, 4)))
    frozen = {
        "unet": unet.init(k2, jnp.zeros((B, h, h, 4)),
                          jnp.zeros((B,), jnp.int32),
                          jnp.zeros((B, 5, unet_cfg.cross_attention_dim))),
        "vae": vae.init(k3, jnp.zeros((B, H, H, 3))),
    }
    schedule = NoiseSchedule.create(SchedulerConfig())
    trainer = ControlNetTrainer(unet=unet, controlnet=controlnet, vae=vae,
                                schedule=schedule,
                                config=TrainConfig(learning_rate=1e-4))
    return trainer, cn_params, frozen, unet_cfg


def test_cached_step_matches_online_encode(tmp_path):
    ds = _FakeDataset(n=4, H=32)
    trainer, cn_params, frozen, unet_cfg = _tiny_stack(jax.random.PRNGKey(0))
    n = precompute_latent_moments(trainer.vae, frozen["vae"], ds,
                                  str(tmp_path / "cache"), batch_size=3)
    assert n == 4
    cached = LatentCachedDataset(ds, str(tmp_path / "cache"))

    B = 2
    imgs = np.stack([ds[i]["image"] for i in range(B)])
    batch = {
        "image": jnp.asarray(imgs),
        "cond": jnp.asarray(np.stack([ds[i]["cond"] for i in range(B)])),
        "flow": jnp.zeros((B, 32, 32, 4)),
        "text_embeds": jax.random.normal(
            jax.random.PRNGKey(7), (B, 5, unet_cfg.cross_attention_dim))
        * 0.1,
    }
    moments = jnp.asarray(np.stack(
        [cached[i]["latent_moments"] for i in range(B)]))
    batch_cached = dict(batch, latent_moments=moments)

    rng = jax.random.PRNGKey(3)
    # jit both sides (the production step is jitted); the two programs
    # differ only by the encoder subgraph vs the cached constant, so any
    # difference is XLA fusion-order float rounding on the moments
    vg = jax.jit(jax.value_and_grad(trainer.loss_fn, has_aux=True))
    (loss_a, metrics_a), grads_a = vg(cn_params, frozen, batch, rng)
    (loss_b, metrics_b), grads_b = vg(cn_params, frozen, batch_cached, rng)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=3e-6)
    for k in metrics_a:
        np.testing.assert_allclose(float(metrics_a[k]),
                                   float(metrics_b[k]), rtol=3e-6, err_msg=k)
    # the ~1e-6 moment rounding amplifies per-element through the deep
    # backward; the robust contract is per-leaf relative L2 agreement
    for pa, pb in zip(jax.tree.leaves(grads_a), jax.tree.leaves(grads_b)):
        a, b = np.asarray(pa, np.float64), np.asarray(pb, np.float64)
        denom = np.linalg.norm(a) + 1e-30
        assert np.linalg.norm(a - b) / denom < 1e-3


def test_wrapper_iter_batches_carries_moments(tmp_path):
    ds = _FakeDataset(n=5, H=32)
    trainer, cn_params, frozen, _ = _tiny_stack(jax.random.PRNGKey(0))
    precompute_latent_moments(trainer.vae, frozen["vae"], ds,
                              str(tmp_path / "c"), batch_size=2)
    cached = LatentCachedDataset(ds, str(tmp_path / "c"))
    b = next(cached.iter_batches(2, shuffle=False))
    assert set(b) >= {"image", "cond", "flow", "text", "latent_moments"}
    assert b["latent_moments"].shape[0] == 2
    # 2 * latent_channels moments at H/8
    assert b["latent_moments"].shape[1:] == (4, 4, 8)
    np.testing.assert_array_equal(b["latent_moments"][0],
                                  cached[0]["latent_moments"])


def test_jitter_guard_and_completeness(tmp_path):
    ds = _FakeDataset(n=3, H=32)
    ds.transform = True
    trainer, _, frozen, _ = _tiny_stack(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="transform=False"):
        precompute_latent_moments(trainer.vae, frozen["vae"], ds,
                                  str(tmp_path / "x"))
    with pytest.raises(ValueError, match="transform=False"):
        LatentCachedDataset(ds, str(tmp_path / "x"))
    ds.transform = False
    assert not cache_complete(str(tmp_path / "x"), 3)
    with pytest.raises(FileNotFoundError):
        LatentCachedDataset(ds, str(tmp_path / "x"))
