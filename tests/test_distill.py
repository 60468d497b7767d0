"""Consistency (step) distillation: boundary math, teacher DDIM step,
train step mechanics, and the K-step distilled sampler (tiny models)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from diffcodec_tpu.config import (ControlNetConfig, DistillConfig,
                                  SchedulerConfig, UNetConfig, VAEConfig)
from diffcodec_tpu.models.controlnet import DualFlowControlNet
from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
from diffcodec_tpu.models.vae import AutoencoderKL
from diffcodec_tpu.sampling.distilled import DistilledPipeline
from diffcodec_tpu.sampling.schedulers import NoiseSchedule
from diffcodec_tpu.train.distill import (ConsistencyDistiller, DistillState,
                                         boundary_scalings, ddim_grid,
                                         ddim_step)


def test_boundary_condition_at_zero():
    c_skip, c_out = boundary_scalings(jnp.asarray([0, 10, 999]))
    assert float(c_skip[0]) == 1.0 and float(c_out[0]) == 0.0
    # monotone handoff: c_skip decreases, c_out increases with t
    assert float(c_skip[1]) > float(c_skip[2])
    assert float(c_out[1]) < float(c_out[2])
    # never exceed [0, 1]
    assert np.all(np.asarray(c_skip) <= 1.0) and np.all(
        np.asarray(c_out) <= 1.0)


def test_ddim_grid_shape_and_range():
    sched = NoiseSchedule.create(SchedulerConfig())
    grid = ddim_grid(sched, 50)
    assert grid.shape == (50,)
    assert int(grid[0]) == sched.cfg.num_train_timesteps - 1
    g = np.asarray(grid)
    assert (np.diff(g) < 0).all() and g[-1] >= 0


def test_ddim_step_recovers_known_x0():
    """With model_output = the exact eps used to noise x0, one DDIM step
    lands exactly on sqrt(abar_m) x0 + sqrt(1-abar_m) eps."""
    sched = NoiseSchedule.create(SchedulerConfig())
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 4, 4, 4), jnp.float32)
    eps = jnp.asarray(rng.randn(2, 4, 4, 4), jnp.float32)
    t_n = jnp.asarray([700, 300])
    t_m = jnp.asarray([500, 100])
    x_tn = sched.add_noise(x0, eps, t_n)
    got = ddim_step(sched, x_tn, eps, t_n, t_m)
    abar = np.asarray(sched.alphas_cumprod)[np.asarray(t_m)]
    want = (np.sqrt(abar)[:, None, None, None] * np.asarray(x0) +
            np.sqrt(1 - abar)[:, None, None, None] * np.asarray(eps))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_distill_setup():
    unet_cfg = UNetConfig.tiny()
    cn_cfg = ControlNetConfig.tiny()
    vae_cfg = VAEConfig(base_channels=8, channel_mults=(1, 1, 2, 2),
                        layers_per_block=1)
    unet = UNet2DConditionModel(unet_cfg)
    controlnet = DualFlowControlNet(cn_cfg)
    vae = AutoencoderKL(vae_cfg)
    schedule = NoiseSchedule.create(SchedulerConfig())

    B, H = 2, 32
    h = H // 8
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    sample = jnp.zeros((B, h, h, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 5, unet_cfg.cross_attention_dim))
    cond0 = jnp.zeros((B, H, H, 6))
    flow0 = jnp.zeros((B, H, H, 4))
    teacher = {
        "unet": unet.init(k1, sample, t, ctx),
        "controlnet": controlnet.init(k2, sample, t, ctx, cond0, flow0),
    }
    frozen = dict(teacher)
    frozen["vae"] = vae.init(k3, jnp.zeros((B, H, H, 3)))
    # student warm-starts from the teacher
    student = jax.tree.map(jnp.copy, teacher)

    rngs = jax.random.split(jax.random.PRNGKey(1), 5)
    batch = {
        "image": jax.random.uniform(rngs[0], (B, H, H, 3)) * 2 - 1,
        "cond": jax.random.uniform(rngs[1], (B, H, H, 6)),
        "flow": jax.random.normal(rngs[2], (B, H, H, 4)),
        "text_embeds": jax.random.normal(
            rngs[3], (B, 5, unet_cfg.cross_attention_dim)) * 0.1,
        "uncond_embeds": jnp.zeros((B, 5, unet_cfg.cross_attention_dim)),
    }
    cfg = DistillConfig(num_teacher_steps=10, freeu=False,
                        num_student_steps=3, ema_decay=0.9)
    distiller = ConsistencyDistiller(unet=unet, controlnet=controlnet,
                                     vae=vae, schedule=schedule, config=cfg)
    return distiller, student, frozen, batch


@pytest.mark.slow
def test_consistency_fn_identity_at_t0(tiny_distill_setup):
    """f(x, 0) == x regardless of the network output (boundary cond)."""
    distiller, student, frozen, batch = tiny_distill_setup
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 4))
    t = jnp.zeros((2,), jnp.int32)
    f = distiller.consistency_fn(student, x, t, batch["text_embeds"],
                                 batch["cond"], batch["flow"])
    np.testing.assert_allclose(np.asarray(f), np.asarray(x), atol=1e-6)


@pytest.mark.slow
def test_train_step_updates_student_and_ema(tiny_distill_setup):
    distiller, student, frozen, batch = tiny_distill_setup
    tx = optax.adam(1e-3)
    state = DistillState.create(student, tx)
    step = jax.jit(distiller.train_step)
    new_state, metrics = step(state, frozen, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # student params moved
    moved = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(new_state.params),
                        jax.tree.leaves(student)))
    assert moved > 0.0
    # EMA is a convex mix: strictly between old ema (==student warm start)
    # and the new student params somewhere
    leaf_new = jax.tree.leaves(new_state.params)[0]
    leaf_ema = jax.tree.leaves(new_state.ema_params)[0]
    leaf_old = jax.tree.leaves(student)[0]
    d_full = float(jnp.max(jnp.abs(leaf_new - leaf_old)))
    d_ema = float(jnp.max(jnp.abs(leaf_ema - leaf_old)))
    if d_full > 0:
        assert 0 < d_ema < d_full
    # teacher/frozen untouched by construction (value_and_grad over
    # student params only); metrics carry the sampled timestep mean
    assert 0 <= float(metrics["t_mean"]) < 1000


@pytest.mark.slow
def test_distilled_sampler_end_to_end(tiny_distill_setup):
    distiller, student, frozen, batch = tiny_distill_setup
    params = dict(student)
    params["vae"] = frozen["vae"]
    pipe = DistilledPipeline(unet=distiller.unet,
                             controlnet=distiller.controlnet,
                             vae=distiller.vae, schedule=distiller.schedule,
                             config=distiller.config)
    ts = pipe.step_schedule()
    assert ts.shape == (3,)
    assert (np.diff(np.asarray(ts)) < 0).all()
    images = pipe.jit_sample()(params, jax.random.PRNGKey(9),
                               batch["text_embeds"], batch["cond"],
                               batch["flow"])
    assert images.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(images)).all()
    assert np.abs(np.asarray(images)).max() <= 1.0


@pytest.mark.slow
def test_distilled_sampler_k1_is_single_application(tiny_distill_setup):
    """K=1 must equal one consistency-function application at the top
    timestep followed by the VAE decode (no re-noising)."""
    from diffcodec_tpu.models.vae import decode_from_latents

    distiller, student, frozen, batch = tiny_distill_setup
    cfg1 = DistillConfig(num_teacher_steps=10, freeu=False,
                         num_student_steps=1)
    pipe = DistilledPipeline(unet=distiller.unet,
                             controlnet=distiller.controlnet,
                             vae=distiller.vae, schedule=distiller.schedule,
                             config=cfg1)
    params = dict(student)
    params["vae"] = frozen["vae"]
    B, h = 2, 4
    latents = jax.random.normal(jax.random.PRNGKey(5), (B, h, h, 4))
    got = pipe.sample(params, jax.random.PRNGKey(6), batch["text_embeds"],
                      batch["cond"], batch["flow"], latents=latents)
    d1 = ConsistencyDistiller(unet=distiller.unet,
                              controlnet=distiller.controlnet,
                              vae=distiller.vae, schedule=distiller.schedule,
                              config=cfg1)
    t0 = jnp.full((B,), int(pipe.step_schedule()[0]), jnp.int32)
    f = d1.consistency_fn(params, latents, t0, batch["text_embeds"],
                          batch["cond"], batch["flow"])
    want = jnp.clip(decode_from_latents(distiller.vae, params["vae"], f),
                    -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
