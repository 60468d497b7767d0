"""ControlNet training harness: optax + pjit over the device mesh.

Parity targets (`train_controlnet.py`):
  * AdamW over controlnet params only; frozen vae/unet/text encoder
    (:871-873, :914-935)
  * diffusers-style LR schedules with warmup (:968-975)
  * grad clipping by global norm 1.0 (:1160-1162)
  * gradient accumulation (accelerate `--gradient_accumulation_steps`)
  * the training step itself (:1076-1166): vae-encode gt, add noise at
    uniform random t, controlnet -> unet -> mse (+ pixel losses)

TPU-native: a single jitted `train_step` with batch sharded over the mesh
'data' axis and params/opt-state over 'fsdp' (ZeRO analogue); gradients are
averaged by XLA-inserted collectives, not hand-written all-reduce
(`cmp/utils/distributed_utils.py:12-32` equivalent comes for free).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from diffcodec_tpu.config import TrainConfig
from diffcodec_tpu.parallel.mesh import replicated
from diffcodec_tpu.sampling.schedulers import NoiseSchedule
from diffcodec_tpu.train.losses import diffusion_loss, pixel_losses


def make_lr_schedule(cfg: TrainConfig):
    """diffusers `get_scheduler` parity for the common cases."""
    base = cfg.learning_rate
    warm = cfg.lr_warmup_steps
    total = cfg.max_train_steps
    if cfg.lr_scheduler == "constant":
        return optax.constant_schedule(base)
    if cfg.lr_scheduler == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warm),
             optax.constant_schedule(base)], [warm])
    if cfg.lr_scheduler == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warm),
             optax.linear_schedule(base, 0.0, max(total - warm, 1))], [warm])
    if cfg.lr_scheduler == "cosine":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warm),
             optax.cosine_decay_schedule(base, max(total - warm, 1))], [warm])
    raise ValueError(f"unknown lr scheduler {cfg.lr_scheduler!r}")


def scale_by_adam_lowp(b1: float, b2: float, eps: float,
                       moment_dtype=jnp.bfloat16,
                       sequential_chunks: int = 0):
    """Adam with both moments STORED in `moment_dtype` (math in f32).

    The TPU-native analogue of the reference's optional
    `bnb.optim.AdamW8bit` (`train_controlnet.py:469`, `:915-923`): cuts
    optimizer-state HBM from 8 to 4 bytes/param while keeping more
    precision than bitsandbytes' 8-bit dynamic quantization (bf16 has an
    8-bit mantissa vs bnb's shared-exponent blocks).  Update math matches
    optax.scale_by_adam up to the storage rounding.

    `sequential_chunks > 0` serializes the update over that many
    size-balanced leaf groups with `lax.optimization_barrier` chaining:
    XLA's buffer assignment otherwise keeps the whole-tree f32 transient
    copies of mu/nu live at the peak point (the measured binding
    constraint for batch>8 single-chip training — bench_train.py OOM
    table); chaining bounds the transient to one chunk (~tree/K), at the
    cost of less cross-leaf overlap in the (bandwidth-bound) update.
    """

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=moment_dtype)
        return optax.ScaleByAdamState(count=jnp.zeros((), jnp.int32),
                                      mu=jax.tree.map(z, params),
                                      nu=jax.tree.map(z, params))

    def _leaf_update(g, m, v, c1, c2):
        g32 = g.astype(jnp.float32)
        m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g32
        v32 = b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32
        out = (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
        return (out.astype(g.dtype), m32.astype(moment_dtype),
                v32.astype(moment_dtype))

    def update(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        flat_g, treedef = jax.tree.flatten(updates)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)

        if sequential_chunks and len(flat_g) > 1:
            # size-balanced contiguous grouping of the leaves
            K = min(sequential_chunks, len(flat_g))
            total = sum(g.size for g in flat_g)
            groups, cur, acc = [], [], 0
            for idx, g in enumerate(flat_g):
                cur.append(idx)
                acc += g.size
                if acc >= total * (len(groups) + 1) / K and len(groups) < K - 1:
                    groups.append(cur)
                    cur = []
            if cur:
                groups.append(cur)

            out_u = [None] * len(flat_g)
            out_m = [None] * len(flat_g)
            out_v = [None] * len(flat_g)
            token = count.astype(jnp.float32)
            for grp in groups:
                # tie this group's inputs to the previous group's outputs
                # so XLA cannot overlap their f32 transients
                tied = jax.lax.optimization_barrier(
                    tuple(flat_g[i] for i in grp) + (token,))
                gs, token = tied[:-1], tied[-1]
                outs = []
                for g, i in zip(gs, grp):
                    u, m, v = _leaf_update(g, flat_m[i], flat_v[i], c1, c2)
                    out_u[i], out_m[i], out_v[i] = u, m, v
                    outs.append(u)
                token = jax.lax.optimization_barrier(
                    tuple(outs) + (token,))[-1]
            new_updates = jax.tree.unflatten(treedef, out_u)
            mu = jax.tree.unflatten(treedef, out_m)
            nu = jax.tree.unflatten(treedef, out_v)
        else:
            trips = [_leaf_update(g, m, v, c1, c2)
                     for g, m, v in zip(flat_g, flat_m, flat_v)]
            new_updates = jax.tree.unflatten(treedef, [t[0] for t in trips])
            mu = jax.tree.unflatten(treedef, [t[1] for t in trips])
            nu = jax.tree.unflatten(treedef, [t[2] for t in trips])

        return new_updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig):
    if cfg.lowp_adam_moments:
        adam = optax.chain(
            scale_by_adam_lowp(cfg.adam_beta1, cfg.adam_beta2,
                               cfg.adam_epsilon,
                               sequential_chunks=cfg.adam_update_chunks),
            optax.add_decayed_weights(cfg.adam_weight_decay),
            optax.scale_by_learning_rate(make_lr_schedule(cfg)),
        )
    else:
        adam = optax.adamw(make_lr_schedule(cfg), b1=cfg.adam_beta1,
                           b2=cfg.adam_beta2, eps=cfg.adam_epsilon,
                           weight_decay=cfg.adam_weight_decay)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), adam)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any              # trainable controlnet params
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


@dataclasses.dataclass(frozen=True)
class ControlNetTrainer:
    """Bundles the frozen stack + trainable controlnet into a train step.

    `frozen` holds {'unet', 'vae'(, 'text')} param trees; the text encoder
    runs outside the step (embeddings precomputed by the data pipeline or
    passed in), mirroring how the reference computes them inline but frozen.
    """
    unet: Any
    controlnet: Any
    vae: Any
    schedule: NoiseSchedule
    config: TrainConfig
    lpips: Any = None

    def loss_fn(self, cn_params, frozen, batch, rng):
        """batch: img_gt 'image' [B,H,W,3] in [-1,1]; 'cond' [B,H,W,6];
        'flow' [B,H,W,4]; 'text_embeds' [B,L,D].  Residual variant
        (train_rescontrolnet.py:1081,1112): with 'residual'/'warped' keys
        the target image is the residual and the ControlNet receives the
        warped prediction as warp_cond."""
        cfg = self.config
        rng_noise, rng_t, rng_lat = jax.random.split(rng, 3)
        residual_mode = "residual" in batch
        img_gt = batch["residual"] if residual_mode else batch["image"]
        B = img_gt.shape[0]

        if "latent_moments" in batch:
            # precomputed frozen-encoder moments (train/latent_cache.py):
            # identical math from here on given the same rng (equal to
            # fusion-order float rounding) — minus the encoder forward
            # (78 ms of the 425 ms batch-8 step)
            lm = batch["latent_moments"].astype(self.vae.dtype)
            mean, logvar = jnp.split(lm, 2, axis=-1)
        else:
            mean, logvar = self.vae.apply(frozen["vae"], img_gt,
                                          method=self.vae.encode)
        std = jnp.exp(0.5 * logvar)
        latents = mean + std * jax.random.normal(rng_lat, mean.shape,
                                                 mean.dtype)
        latents = latents * self.vae.cfg.scaling_factor

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        timesteps = jax.random.randint(
            rng_t, (B,), 0, self.schedule.cfg.num_train_timesteps)
        noisy = self.schedule.add_noise(latents, noise, timesteps)

        cn_args = (noisy, timesteps, batch["text_embeds"], batch["cond"],
                   batch["flow"])
        if residual_mode:
            cn_args = cn_args + (batch["warped"],)

        def cn_fwd(p, *a):
            return self.controlnet.apply(p, *a)

        def unet_fwd(p, z, t, emb, down, mid):
            return self.unet.apply(
                p, z, t, emb, down_block_additional_residuals=down,
                mid_block_additional_residual=mid)

        if cfg.remat:
            # reference --gradient_checkpointing analogue (see
            # TrainConfig.remat): recompute both forwards in backward
            cn_fwd = jax.checkpoint(cn_fwd)
            unet_fwd = jax.checkpoint(unet_fwd)
        down, mid = cn_fwd(cn_params, *cn_args)
        model_pred = unet_fwd(frozen["unet"], noisy, timesteps,
                              batch["text_embeds"], down, mid)

        loss_mse = diffusion_loss(self.schedule, model_pred, noise, latents,
                                  timesteps)
        loss = loss_mse
        metrics = {"loss_mse": loss_mse}
        if cfg.lpips_weight or cfg.edge_weight:
            lp, edge = pixel_losses(
                self.schedule, self.vae, frozen["vae"], noisy, model_pred,
                timesteps, img_gt,
                lpips_model=self.lpips if cfg.lpips_weight else None,
                lpips_params=frozen.get("lpips"))
            if cfg.lpips_weight:
                loss = loss + cfg.lpips_weight * lp
                metrics["loss_lpips"] = lp
            if cfg.edge_weight:
                loss = loss + cfg.edge_weight * edge
                metrics["loss_edge"] = edge
        metrics["loss"] = loss
        return loss, metrics

    def train_step(self, state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(state.params, frozen, batch, rng)
        return state.apply_gradients(grads), metrics

    def shard_state(self, mesh, state: TrainState) -> TrainState:
        """Device-put params and optimizer state with fsdp sharding (the
        ZeRO analogue: adam moments inherit the same layout rule)."""
        from diffcodec_tpu.parallel.mesh import _fsdp_spec
        fsdp_axis = mesh.axis_names[1]
        fsdp_size = mesh.shape[fsdp_axis]

        def put(x):
            if getattr(x, "ndim", 0) > 0:
                sh = NamedSharding(mesh, _fsdp_spec(x.shape, fsdp_axis,
                                                    fsdp_size))
            else:
                sh = replicated(mesh)
            return jax.device_put(x, sh)

        return state.replace(step=jax.device_put(state.step,
                                                 replicated(mesh)),
                             params=jax.tree.map(put, state.params),
                             opt_state=jax.tree.map(put, state.opt_state))

    def jit_train_step(self, mesh):
        """Jitted train step: shard state via `shard_state` first; XLA
        propagates committed input shardings and inserts the gradient psum
        over 'data' plus fsdp all-gathers/reduce-scatters."""
        return jax.jit(self.train_step, donate_argnums=(0,))
