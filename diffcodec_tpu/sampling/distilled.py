"""K-step consistency decode for a distilled student (train/distill.py).

Multistep consistency sampling (Song et al. 2023, alg. 1): start from
pure noise at the schedule's top timestep, map to x̂0 with the
consistency function, then for each remaining step re-noise x̂0 to the
next (lower) timestep and map again.  K = `DistillConfig.num_student_steps`
denoiser evaluations total, and — unlike the teacher pipeline — NO CFG
batch doubling: the student absorbed the guidance during distillation,
so a 4-step student decode costs ~4/(2*30) of the exact pipeline's
denoiser FLOPs (the VAE/extractor cost is unchanged).

Structure mirrors `DualFlowPipeline` (hoisted control pyramid, one jit,
static K unrolled — K<=8 keeps the program small), so `sample` is a
drop-in for `DualFlowPipeline.sample` minus the uncond embeddings.

No reference counterpart: the reference decodes only with the full
30-step CFG loop (`/root/reference/pipeline.py:341-350`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffcodec_tpu.config import DistillConfig
from diffcodec_tpu.models.vae import decode_from_latents
from diffcodec_tpu.sampling.schedulers import NoiseSchedule
from diffcodec_tpu.train.distill import boundary_scalings, ddim_grid


@dataclasses.dataclass(frozen=True)
class DistilledPipeline:
    """Frozen student {'unet','controlnet','vae'} -> K-step decoder."""
    unet: object
    controlnet: object
    vae: object
    schedule: NoiseSchedule
    config: DistillConfig = DistillConfig()
    # no CFG batch -> sample() takes no uncond embeddings; lets
    # sampling/tiled.sample_tiled adapt the call shape
    takes_uncond = False

    def _f(self, params, pyramid, x, t, text):
        """Consistency function with a pre-hoisted pyramid."""
        c = self.config
        down, mid = self.controlnet.apply(
            params["controlnet"], x, t, text, pyramid,
            c.controlnet_conditioning_scale,
            method=self.controlnet.backbone)
        freeu = ((c.freeu_s1, c.freeu_s2, c.freeu_b1, c.freeu_b2)
                 if c.freeu else None)
        eps = self.unet.apply(params["unet"], x, t, text,
                              down_block_additional_residuals=tuple(down),
                              mid_block_additional_residual=mid,
                              freeu=freeu)
        x0 = self.schedule.pred_original_sample(x, eps, t)
        c_skip, c_out = boundary_scalings(t, c.sigma_data,
                                          c.timestep_scaling)
        shape = (-1,) + (1,) * (x.ndim - 1)
        return (c_skip.reshape(shape) * x.astype(jnp.float32) +
                c_out.reshape(shape) * x0)

    def step_schedule(self):
        """K timesteps, descending, subsampled evenly from the teacher
        DDIM grid (first = top of the schedule)."""
        grid = ddim_grid(self.schedule, self.config.num_teacher_steps)
        K = self.config.num_student_steps
        idx = jnp.linspace(0, grid.shape[0] - 1, K).round().astype(jnp.int32)
        return grid[idx]

    def denoise(self, params, latents, text_embeds, controlnet_cond,
                flow_cond, rng):
        ts = self.step_schedule()
        B = latents.shape[0]
        pyramid = self.controlnet.apply(
            params["controlnet"], controlnet_cond, flow_cond,
            method=self.controlnet.extract_pyramid)
        t0 = jnp.full((B,), ts[0], jnp.int32)
        x0 = self._f(params, pyramid, latents, t0, text_embeds)
        for k in range(1, self.config.num_student_steps):
            rng, rk = jax.random.split(rng)
            tk = jnp.full((B,), ts[k], jnp.int32)
            noise = jax.random.normal(rk, x0.shape, jnp.float32)
            x_k = self.schedule.add_noise(x0, noise, tk)
            x0 = self._f(params, pyramid, x_k.astype(latents.dtype), tk,
                         text_embeds)
        return x0

    def sample(self, params, rng, text_embeds, controlnet_cond, flow_cond,
               latents=None):
        """Full decode: noise -> K consistency steps -> images in [-1,1]."""
        B, H, W = (controlnet_cond.shape[0], controlnet_cond.shape[1],
                   controlnet_cond.shape[2])
        rng_init, rng_steps = jax.random.split(rng)
        if latents is None:
            shape = (B, H // 8, W // 8, self.unet.cfg.in_channels)
            latents = jax.random.normal(rng_init, shape, jnp.float32)
        final = self.denoise(params, latents, text_embeds, controlnet_cond,
                             flow_cond, rng_steps)
        images = decode_from_latents(self.vae, params["vae"], final)
        return jnp.clip(images, -1.0, 1.0)

    def jit_sample(self):
        return jax.jit(self.sample)
