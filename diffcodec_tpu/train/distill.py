"""Latent consistency distillation of the DualFlow decoder (step distillation).

The reference pipeline always decodes with 30 UniPC steps under CFG
(`/root/reference/pipeline.py:341-350` — 60 denoiser evaluations per
frame); this module distills that teacher into a student that decodes in
K<=8 evaluations with NO CFG batch doubling, the one acceleration axis
the round-2/3 caching knobs (controlnet_interval / unet_encoder_interval)
cannot reach.  The reference has no equivalent — this is a capability the
TPU framework adds on top of parity.

Method: consistency distillation (Song et al. 2023, "Consistency
Models"; the latent/guided variant follows Luo et al. 2023, "Latent
Consistency Models") specialized to the codec setting:

  * The teacher is the frozen SD UNet + trained DualFlowControlNet with
    classifier-free guidance at a FIXED guidance/conditioning scale — a
    codec decodes at pinned settings (`validation.py` uses one scale), so
    we distill that operating point instead of LCM's w-conditioning,
    which would add a w-embedding to the UNet and break the converter/
    checkpoint param-tree compatibility (models/hf_import.py).
  * The student and its EMA target share the teacher's architecture and
    are warm-started from the teacher weights; BOTH the UNet and
    ControlNet copies train (the student must absorb the guidance and the
    large-step behavior into its weights).
  * Boundary-conditioned consistency parameterization:
        f(x_t, t) = c_skip(t) * x_t + c_out(t) * x̂0_theta(x_t, t)
    with c_skip(0)=1, c_out(0)=0 so f(x, 0) = x exactly (the consistency
    boundary condition), x̂0 via `NoiseSchedule.pred_original_sample`.
  * One-step DDIM teacher transitions over an `num_teacher_steps`-point
    discretization; the student matches its EMA target one teacher step
    earlier (the standard CD objective):
        L = huber( f_theta(x_{t_n}, t_n), sg[ f_ema(x̂_{t_{n-1}}, t_{n-1}) ] )

TPU-native: one jitted train step; batch shards over the mesh 'data'
axis and the three param trees (student / EMA / teacher+vae frozen) over
'fsdp' exactly like `ControlNetTrainer.shard_state`; the control pyramid
is hoisted once per tree per step.  Everything is `lax`-friendly: the
timestep-pair draw is a gather from the precomputed DDIM grid, no
data-dependent control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from diffcodec_tpu.config import DistillConfig
from diffcodec_tpu.sampling.schedulers import NoiseSchedule, cfg_combine


# ---------------------------------------------------------------------------
# consistency parameterization
# ---------------------------------------------------------------------------

def boundary_scalings(timesteps, sigma_data: float = 0.5,
                      timestep_scaling: float = 10.0):
    """c_skip/c_out for the boundary-conditioned consistency function.

    `timesteps` are raw integer train-schedule timesteps (0..T-1); the
    scaling maps them to a karras-like sigma axis (LCM appendix choice:
    sigma_data 0.5, scaling t/1000*10 == t/100).  Guarantees
    c_skip(0) = 1, c_out(0) = 0.
    """
    s = timesteps.astype(jnp.float32) * (timestep_scaling / 1000.0)
    c_skip = sigma_data ** 2 / (s ** 2 + sigma_data ** 2)
    c_out = s / jnp.sqrt(s ** 2 + sigma_data ** 2)
    return c_skip, c_out


def ddim_grid(schedule: NoiseSchedule, num_teacher_steps: int):
    """Descending teacher timestep grid [n] (trailing spacing, like the
    UniPC table construction): T-1, ..., down to ~0 in equal strides."""
    T = schedule.cfg.num_train_timesteps
    stride = T // num_teacher_steps
    ts = jnp.arange(num_teacher_steps - 1, -1, -1, jnp.int32) * stride
    ts = ts + (T - 1 - ts[0])  # shift so the grid starts at T-1
    return ts  # [n], ts[0] = T-1, ts[-1] >= 0


def ddim_step(schedule: NoiseSchedule, sample, eps, t, t_prev):
    """Deterministic DDIM x_t -> x_{t_prev} (epsilon param, eta=0).

    t_prev < 0 means "to x0" (abar_prev = 1), matching `ddpm_step`'s
    final-step convention.
    """
    x0 = schedule.pred_original_sample(sample, eps, t)
    abar_prev = jnp.where(
        t_prev >= 0,
        schedule.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
    abar_prev = abar_prev.reshape((-1,) + (1,) * (sample.ndim - 1))
    return (jnp.sqrt(abar_prev) * x0 +
            jnp.sqrt(1.0 - abar_prev) * eps.astype(jnp.float32))


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

class DistillState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any        # student {'unet','controlnet'}
    ema_params: Any    # EMA target, same tree
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   ema_params=jax.tree.map(jnp.copy, params),
                   opt_state=tx.init(params), tx=tx)


@dataclasses.dataclass(frozen=True)
class ConsistencyDistiller:
    """Bundles teacher + student module defs into a jittable CD step.

    `unet` / `controlnet` / `vae` are the module definitions (shared by
    teacher and student — identical architecture); the teacher params ride
    in `frozen` = {'unet', 'controlnet', 'vae'}.
    """
    unet: Any
    controlnet: Any
    vae: Any
    schedule: NoiseSchedule
    config: DistillConfig

    # -- denoiser application ------------------------------------------------
    @property
    def _freeu(self):
        # the deployment decoder runs FreeU (SamplerConfig defaults); the
        # teacher must be the decoder actually being distilled, and the
        # student is trained with the same setting it will decode with
        c = self.config
        return ((c.freeu_s1, c.freeu_s2, c.freeu_b1, c.freeu_b2)
                if c.freeu else None)

    def _eps(self, unet_p, cn_p, x, t, ctx, cond, flow, cond_scale):
        pyramid = self.controlnet.apply(cn_p, cond, flow,
                                        method=self.controlnet.extract_pyramid)
        down, mid = self.controlnet.apply(cn_p, x, t, ctx, pyramid,
                                          cond_scale,
                                          method=self.controlnet.backbone)
        return self.unet.apply(unet_p, x, t, ctx,
                               down_block_additional_residuals=tuple(down),
                               mid_block_additional_residual=mid,
                               freeu=self._freeu)

    def teacher_eps(self, frozen, x, t, text, uncond, cond, flow):
        """CFG-combined teacher prediction at the pinned guidance scale
        (the pipeline's doubled-batch CFG, `pipeline.py:313-320`)."""
        c = self.config
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        ctx2 = jnp.concatenate([uncond, text], axis=0)
        cond2 = jnp.concatenate([cond, cond], axis=0)
        flow2 = jnp.concatenate([flow, flow], axis=0)
        eps = self._eps(frozen["unet"], frozen["controlnet"], x2, t2, ctx2,
                        cond2, flow2, c.controlnet_conditioning_scale)
        eps_u, eps_t = jnp.split(eps, 2, axis=0)
        return cfg_combine(eps_u, eps_t, c.guidance_scale)

    def consistency_fn(self, params, x, t, text, cond, flow):
        """f(x_t, t): boundary-scaled x̂0 prediction, NO CFG batch."""
        eps = self._eps(params["unet"], params["controlnet"], x, t, text,
                        cond, flow,
                        self.config.controlnet_conditioning_scale)
        x0 = self.schedule.pred_original_sample(x, eps, t)
        c_skip, c_out = boundary_scalings(t, self.config.sigma_data,
                                          self.config.timestep_scaling)
        shape = (-1,) + (1,) * (x.ndim - 1)
        return (c_skip.reshape(shape) * x.astype(jnp.float32) +
                c_out.reshape(shape) * x0)

    # -- the CD objective ----------------------------------------------------
    def loss_fn(self, params, state_ema, frozen, batch, rng):
        c = self.config
        rng_n, rng_t, rng_lat = jax.random.split(rng, 3)
        img = batch["image"]
        B = img.shape[0]

        mean, logvar = self.vae.apply(frozen["vae"], img,
                                      method=self.vae.encode)
        std = jnp.exp(0.5 * logvar)
        latents = mean + std * jax.random.normal(rng_lat, mean.shape,
                                                 mean.dtype)
        latents = (latents * self.vae.cfg.scaling_factor).astype(jnp.float32)

        grid = ddim_grid(self.schedule, c.num_teacher_steps)     # [n] desc
        # draw a grid index with a valid successor (n in 0..len-2)
        idx = jax.random.randint(rng_t, (B,), 0, grid.shape[0] - 1)
        t_n = grid[idx]                 # current (noisier) timestep
        t_m = grid[idx + 1]             # one teacher step less noisy

        noise = jax.random.normal(rng_n, latents.shape, jnp.float32)
        x_tn = self.schedule.add_noise(latents, noise, t_n)
        x_tn = x_tn.astype(img.dtype)

        text, uncond = batch["text_embeds"], batch["uncond_embeds"]
        cond, flow = batch["cond"], batch["flow"]

        # teacher DDIM transition (stop-gradient by construction: frozen)
        eps_T = self.teacher_eps(frozen, x_tn, t_n, text, uncond, cond,
                                 flow)
        x_tm = ddim_step(self.schedule, x_tn, eps_T, t_n, t_m)
        x_tm = jax.lax.stop_gradient(x_tm).astype(img.dtype)

        f_student = self.consistency_fn(params, x_tn, t_n, text, cond, flow)
        f_target = jax.lax.stop_gradient(
            self.consistency_fn(state_ema, x_tm, t_m, text, cond, flow))

        err = f_student - f_target
        if c.loss == "huber":
            loss = jnp.mean(jnp.sqrt(err * err + c.huber_c ** 2) - c.huber_c)
        else:
            loss = jnp.mean(err * err)
        return loss, {"loss": loss,
                      "t_mean": jnp.mean(t_n.astype(jnp.float32))}

    def train_step(self, state: DistillState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.params, state.ema_params, frozen, batch, rng)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = optax.incremental_update(new_params, state.ema_params,
                                           1.0 - self.config.ema_decay)
        return state.replace(step=state.step + 1, params=new_params,
                             ema_params=new_ema, opt_state=new_opt), metrics

    def shard_state(self, mesh, state: DistillState) -> DistillState:
        """fsdp-shard student, EMA, and optimizer state (same layout rule
        as `ControlNetTrainer.shard_state` — the ZeRO analogue covers the
        EMA copy too, so three SD-scale trees fit alongside the teacher)."""
        from jax.sharding import NamedSharding
        from diffcodec_tpu.parallel.mesh import _fsdp_spec, replicated
        fsdp_axis = mesh.axis_names[1]
        fsdp_size = mesh.shape[fsdp_axis]

        def put(x):
            if getattr(x, "ndim", 0) > 0:
                sh = NamedSharding(mesh, _fsdp_spec(x.shape, fsdp_axis,
                                                    fsdp_size))
            else:
                sh = replicated(mesh)
            return jax.device_put(x, sh)

        return state.replace(
            step=jax.device_put(state.step, replicated(mesh)),
            params=jax.tree.map(put, state.params),
            ema_params=jax.tree.map(put, state.ema_params),
            opt_state=jax.tree.map(put, state.opt_state))

    def jit_train_step(self, mesh=None):
        return jax.jit(self.train_step, donate_argnums=(0,))
