"""Training-step and multi-device sharding tests (8 virtual CPU devices)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import (ControlNetConfig, MeshConfig,
                                  SchedulerConfig, TrainConfig, UNetConfig,
                                  VAEConfig)
from diffcodec_tpu.models.controlnet import DualFlowControlNet
from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
from diffcodec_tpu.models.vae import AutoencoderKL
from diffcodec_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                         param_shardings, shard_batch)
from diffcodec_tpu.sampling.schedulers import NoiseSchedule
from diffcodec_tpu.train.trainer import (ControlNetTrainer, TrainState,
                                         make_lr_schedule, make_optimizer)


def _tiny_setup(rng):
    unet_cfg = UNetConfig.tiny()
    cn_cfg = ControlNetConfig.tiny()
    vae_cfg = VAEConfig(base_channels=8, channel_mults=(1, 1, 2, 2),
                        layers_per_block=1)
    unet = UNet2DConditionModel(unet_cfg)
    controlnet = DualFlowControlNet(cn_cfg)
    vae = AutoencoderKL(vae_cfg)
    B, H = 8, 32
    h = H // 8
    sample = jnp.zeros((B, h, h, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 5, unet_cfg.cross_attention_dim))
    cond = jnp.zeros((B, H, H, 6))
    flow = jnp.zeros((B, H, H, 4))
    k1, k2, k3 = jax.random.split(rng, 3)
    cn_params = controlnet.init(k1, sample, t, ctx, cond, flow)
    frozen = {
        "unet": unet.init(k2, sample, t, ctx),
        "vae": vae.init(k3, jnp.zeros((B, H, H, 3))),
    }
    batch = {
        "image": jax.random.uniform(jax.random.PRNGKey(5), (B, H, H, 3)) * 2
        - 1,
        "cond": jax.random.uniform(jax.random.PRNGKey(6), (B, H, H, 6)),
        "flow": jnp.zeros((B, H, H, 4)),
        "text_embeds": jax.random.normal(jax.random.PRNGKey(7),
                                         (B, 5, 32)) * 0.1,
    }
    return unet, controlnet, vae, cn_params, frozen, batch


def test_mesh_construction():
    mesh = make_mesh(MeshConfig(fsdp_size=2))
    assert mesh.shape == {"data": 4, "fsdp": 2}
    mesh = make_mesh(MeshConfig())
    assert mesh.shape == {"data": 8, "fsdp": 1}


def test_lr_schedules():
    cfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=10,
                      max_train_steps=100, lr_scheduler="linear")
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
    assert float(sched(100)) < 2e-5
    for name in ("constant", "constant_with_warmup", "cosine"):
        s = make_lr_schedule(TrainConfig(lr_scheduler=name))
        assert np.isfinite(float(s(50)))

@pytest.mark.slow
def test_train_step_decreases_nothing_blows_up():
    rng = jax.random.PRNGKey(0)
    unet, controlnet, vae, cn_params, frozen, batch = _tiny_setup(rng)
    schedule = NoiseSchedule.create(SchedulerConfig())
    cfg = TrainConfig(learning_rate=1e-4, lr_warmup_steps=0,
                      max_train_steps=10)
    trainer = ControlNetTrainer(unet=unet, controlnet=controlnet, vae=vae,
                                schedule=schedule, config=cfg)
    state = TrainState.create(cn_params, make_optimizer(cfg))
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, metrics = trainer.train_step(state, frozen, batch,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_mse"]))
    assert int(state.step) == 1
    # params changed
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(TrainState.create(
                            cn_params, make_optimizer(cfg)).params)))
    assert changed

@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    """The pjit'd step over an 8-device mesh must produce the same loss and
    updated params as the unsharded step (determinism across shardings)."""
    rng = jax.random.PRNGKey(0)
    unet, controlnet, vae, cn_params, frozen, batch = _tiny_setup(rng)
    schedule = NoiseSchedule.create(SchedulerConfig())
    cfg = TrainConfig(learning_rate=1e-4, lr_warmup_steps=0,
                      max_train_steps=10)
    trainer = ControlNetTrainer(unet=unet, controlnet=controlnet, vae=vae,
                                schedule=schedule, config=cfg)

    state1 = TrainState.create(cn_params, make_optimizer(cfg))
    state1, m1 = trainer.train_step(state1, frozen, batch,
                                    jax.random.PRNGKey(1))

    mesh = make_mesh(MeshConfig(fsdp_size=2))
    state2 = TrainState.create(cn_params, make_optimizer(cfg))
    state2 = trainer.shard_state(mesh, state2)
    sharded_batch = shard_batch(mesh, batch)
    step = trainer.jit_train_step(mesh)
    state2, m2 = step(state2, frozen, sharded_batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["loss_mse"]), float(m2["loss_mse"]),
                               rtol=1e-4)
    a = jax.tree.leaves(state1.params)
    b = jax.tree.leaves(state2.params)
    # atol covers sign flips of the +-lr first Adam update on elements whose
    # gradient is ~0 (fp reduction order differs across shardings)
    lr = 1e-4
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-3,
                                   atol=3 * lr)


def test_param_shardings_cover_tree():
    rng = jax.random.PRNGKey(0)
    _, controlnet, _, cn_params, _, _ = _tiny_setup(rng)
    mesh = make_mesh(MeshConfig(fsdp_size=2))
    sh = param_shardings(mesh, cn_params)
    assert jax.tree.structure(sh) == jax.tree.structure(cn_params)
    # at least one large param actually sharded
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, sh,
                     is_leaf=lambda x: hasattr(x, "spec")))
    assert any(any(ax is not None for ax in spec) for spec in specs)

@pytest.mark.slow
def test_res_controlnet_train_step():
    """Residual-variant training (train_rescontrolnet parity): residual
    target + warp_cond through the same trainer."""
    from diffcodec_tpu.models.controlnet import ResControlNet
    from diffcodec_tpu.train.residue import make_residue_batch

    rng = jax.random.PRNGKey(0)
    unet_cfg = UNetConfig.tiny()
    cn_cfg = ControlNetConfig.tiny()
    vae_cfg = VAEConfig(base_channels=8, channel_mults=(1, 1, 2, 2),
                        layers_per_block=1)
    unet = UNet2DConditionModel(unet_cfg)
    controlnet = ResControlNet(cn_cfg)
    vae = AutoencoderKL(vae_cfg)
    B, H = 2, 32
    h = H // 8
    z = jnp.zeros
    k1, k2, k3 = jax.random.split(rng, 3)
    cn_params = controlnet.init(
        k1, z((B, h, h, 4)), z((B,), jnp.int32), z((B, 5, 32)),
        z((B, H, H, 6)), z((B, H, H, 4)), z((B, H, H, 3)))
    frozen = {
        "unet": unet.init(k2, z((B, h, h, 4)), z((B,), jnp.int32),
                          z((B, 5, 32))),
        "vae": vae.init(k3, z((B, H, H, 3))),
    }
    base = {
        "image": jax.random.uniform(jax.random.PRNGKey(5),
                                    (B, H, H, 3)) * 2 - 1,
        "cond": jax.random.uniform(jax.random.PRNGKey(6), (B, H, H, 6)),
        "flow": z((B, H, H, 4)),
        "text_embeds": z((B, 5, 32)),
    }
    batch = make_residue_batch(base)
    cfg = TrainConfig(learning_rate=1e-4, lr_warmup_steps=0,
                      max_train_steps=5)
    trainer = ControlNetTrainer(unet=unet, controlnet=controlnet, vae=vae,
                                schedule=NoiseSchedule.create(
                                    SchedulerConfig()), config=cfg)
    state = TrainState.create(cn_params, make_optimizer(cfg))
    state, metrics = trainer.train_step(state, frozen, batch,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_mse"]))
    assert int(state.step) == 1


def test_real_tokenizer_text_embeds_and_loss_finite(tmp_path):
    """Regression: CLIPTextConfig.tiny() must cover the REAL tokenizer's
    id range (an nn.Embed lookup past the table fills NaN and silently
    poisons the whole training loss), and the loss stays finite with the
    encoder-produced embeddings."""
    from diffcodec_tpu.config import CLIPTextConfig
    from diffcodec_tpu.models.clip_text import CLIPTextEncoder
    from diffcodec_tpu.utils.tokenizer import default_tokenizer

    rng = jax.random.PRNGKey(0)
    clip_cfg = CLIPTextConfig.tiny()
    tok = default_tokenizer(clip_cfg.max_length)
    enc = CLIPTextEncoder(clip_cfg)
    ids = jnp.asarray(tok(["", "a video frame of a street"]))
    assert int(ids.max()) < clip_cfg.vocab_size
    p_text = enc.init(rng, ids)
    emb = enc.apply(p_text, ids)
    assert np.isfinite(np.asarray(emb)).all()

    unet, controlnet, vae, cn_params, frozen, batch = _tiny_setup(rng)
    B, L, D = batch["text_embeds"].shape
    # project the real embeddings to the tiny cross-attention width and
    # tile to the batch
    proj = jax.random.normal(rng, (emb.shape[-1], D)) * 0.1
    embp = jnp.asarray(emb[:, :L] @ proj)
    batch = dict(batch)
    batch["text_embeds"] = jnp.tile(embp, (B // embp.shape[0], 1, 1))[:B]
    trainer = ControlNetTrainer(
        unet=unet, controlnet=controlnet, vae=vae,
        schedule=NoiseSchedule.create(SchedulerConfig()),
        config=TrainConfig(learning_rate=1e-4, lr_warmup_steps=0,
                           max_train_steps=2, edge_weight=0.1))
    loss, metrics = trainer.loss_fn(cn_params, frozen, batch,
                                    jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), metrics


@pytest.mark.slow
def test_sharded_distill_step_matches_single_device():
    """The consistency-distillation step (train/distill.py) under the
    data x fsdp mesh must match the unsharded step: loss equal, updated
    student AND EMA trees equal within cross-sharding fp tolerance."""
    from diffcodec_tpu.config import DistillConfig
    from diffcodec_tpu.train.distill import (ConsistencyDistiller,
                                             DistillState)

    rng = jax.random.PRNGKey(0)
    unet, controlnet, vae, cn_params, frozen, batch = _tiny_setup(rng)
    schedule = NoiseSchedule.create(SchedulerConfig())
    cfg = TrainConfig(learning_rate=1e-4, lr_warmup_steps=0,
                      max_train_steps=10, adam_weight_decay=0.0)
    dcfg = DistillConfig(num_teacher_steps=10, freeu=False, ema_decay=0.9)
    distiller = ConsistencyDistiller(unet=unet, controlnet=controlnet,
                                     vae=vae, schedule=schedule, config=dcfg)
    frozen_d = dict(frozen)
    frozen_d["controlnet"] = cn_params
    batch = dict(batch)
    batch["uncond_embeds"] = jnp.zeros_like(batch["text_embeds"])
    student = {"unet": jax.tree.map(jnp.copy, frozen["unet"]),
               "controlnet": jax.tree.map(jnp.copy, cn_params)}

    state1 = DistillState.create(student, make_optimizer(cfg))
    state1, m1 = distiller.train_step(state1, frozen_d, batch,
                                      jax.random.PRNGKey(1))

    mesh = make_mesh(MeshConfig(fsdp_size=2))
    state2 = DistillState.create(student, make_optimizer(cfg))
    state2 = distiller.shard_state(mesh, state2)
    step = distiller.jit_train_step(mesh)
    state2, m2 = step(state2, frozen_d, shard_batch(mesh, batch),
                      jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    lr = 1e-4
    for tree1, tree2 in ((state1.params, state2.params),
                         (state1.ema_params, state2.ema_params)):
        for x, y in zip(jax.tree.leaves(tree1), jax.tree.leaves(tree2)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-3, atol=3 * lr)


@pytest.mark.slow
def test_remat_step_matches_plain():
    """cfg.remat=True (the reference's --gradient_checkpointing analogue,
    train_controlnet.py:421,:890-891) must not change the math — only the
    activation schedule."""
    rng = jax.random.PRNGKey(0)
    unet, controlnet, vae, cn_params, frozen, batch = _tiny_setup(rng)
    schedule = NoiseSchedule.create(SchedulerConfig())
    states = []
    for remat in (False, True):
        cfg = TrainConfig(learning_rate=1e-4, lr_warmup_steps=0,
                          max_train_steps=10, remat=remat)
        trainer = ControlNetTrainer(unet=unet, controlnet=controlnet,
                                    vae=vae, schedule=schedule, config=cfg)
        state = TrainState.create(cn_params, make_optimizer(cfg))
        state, m = trainer.train_step(state, frozen, batch,
                                      jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss_mse"]))
        states.append(state)
    # recompute reorders fp reductions, which can nudge Adam's +-lr first
    # update on near-zero-gradient elements (same effect as the sharded
    # test above) — tolerance covers that, not real divergence
    for a, b in zip(jax.tree.leaves(states[0].params),
                    jax.tree.leaves(states[1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)


def test_lowp_adam_matches_adamw():
    """bf16-moment Adam (the --use_8bit_adam analogue) must track fp32
    optax.adamw: same state tree STRUCTURE (fsdp sharding rules apply
    unchanged) and updates within bf16 moment rounding."""
    import dataclasses

    import optax

    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(32, 16), jnp.float32),
              "b": jnp.asarray(rng.randn(16), jnp.float32)}
    cfg_f32 = TrainConfig(learning_rate=1e-3, lr_warmup_steps=0,
                          max_train_steps=100)
    cfg_lowp = dataclasses.replace(cfg_f32, lowp_adam_moments=True)
    tx1, tx2 = make_optimizer(cfg_f32), make_optimizer(cfg_lowp)
    s1, s2 = tx1.init(params), tx2.init(params)
    assert (jax.tree.structure(s1) == jax.tree.structure(s2))
    # moments actually stored in bf16
    n_bf16 = sum(m.dtype == jnp.bfloat16 for m in jax.tree.leaves(s2)
                 if hasattr(m, "dtype"))
    assert n_bf16 == 4  # mu + nu for each of the two params
    p1, p2 = dict(params), dict(params)
    for step in range(5):
        g = {"w": jnp.asarray(rng.randn(32, 16), jnp.float32) * 0.1,
             "b": jnp.asarray(rng.randn(16), jnp.float32) * 0.1}
        u1, s1 = tx1.update(g, s1, p1)
        u2, s2 = tx2.update(g, s2, p2)
        p1 = optax.apply_updates(p1, u1)
        p2 = optax.apply_updates(p2, u2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=2e-5)


def test_chunked_adam_update_matches_unchunked():
    """sequential_chunks only changes scheduling (peak HBM), never values:
    the chunked lowp-Adam update must equal the fused one bit-for-bit."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffcodec_tpu.train.trainer import scale_by_adam_lowp

    rng = np.random.default_rng(0)
    params = {"a": jnp.asarray(rng.normal(size=(64, 32)), jnp.float32),
              "b": {"w": jnp.asarray(rng.normal(size=(128,)), jnp.float32),
                    "v": jnp.asarray(rng.normal(size=(16, 16, 3)),
                                     jnp.float32)}}
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), p.dtype), params)

    tx0 = scale_by_adam_lowp(0.9, 0.999, 1e-8)
    tx3 = scale_by_adam_lowp(0.9, 0.999, 1e-8, sequential_chunks=3)
    s0, s3 = tx0.init(params), tx3.init(params)
    for _ in range(3):
        u0, s0 = jax.jit(tx0.update)(grads, s0, params)
        u3, s3 = jax.jit(tx3.update)(grads, s3, params)
        for l0, l3 in zip(jax.tree.leaves(u0), jax.tree.leaves(u3)):
            np.testing.assert_array_equal(np.asarray(l0), np.asarray(l3))
        for l0, l3 in zip(jax.tree.leaves(s0.mu), jax.tree.leaves(s3.mu)):
            np.testing.assert_array_equal(np.asarray(l0), np.asarray(l3))
