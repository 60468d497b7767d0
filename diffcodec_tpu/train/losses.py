"""Training loss for the DualFlow/Res ControlNets.

Parity target: `train_controlnet.py:1124-1157`:
  loss = MSE(model_pred, target)
       + perceptual_weight * NormFixLPIPS(x̂0_decoded, img_gt)
       + edge_weight * SobelEdgeLoss(x̂0_decoded, img_gt)
with target = noise (epsilon) or velocity (v-prediction).

Deliberate divergence (documented bug fix): the reference decodes x̂0 under
`torch.no_grad()` (`controlnet/utils.py:85-86`), which makes the LPIPS/edge
terms gradient-dead constants.  Here the decode is differentiable (wrapped in
`jax.checkpoint` to keep memory flat); set `stop_decode_gradient=True` to
reproduce the reference behaviour exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffcodec_tpu.ops.sobel import sobel_edge_loss
from diffcodec_tpu.sampling.schedulers import NoiseSchedule


def diffusion_loss(schedule: NoiseSchedule, model_pred, noise, latents,
                   timesteps):
    """MSE against the scheduler target (fp32)."""
    if schedule.cfg.prediction_type == "epsilon":
        target = noise
    elif schedule.cfg.prediction_type == "v_prediction":
        target = schedule.velocity(latents, noise, timesteps)
    else:
        raise ValueError(schedule.cfg.prediction_type)
    return jnp.mean((model_pred.astype(jnp.float32) -
                     target.astype(jnp.float32)) ** 2)


def pixel_losses(schedule: NoiseSchedule, vae, vae_params, noisy_latents,
                 model_pred, timesteps, img_gt, lpips_model=None,
                 lpips_params=None, stop_decode_gradient: bool = False):
    """Decode x̂0 and compute (lpips, edge) losses vs ground truth pixels."""
    x0 = schedule.pred_original_sample(noisy_latents, model_pred, timesteps)
    decode = jax.checkpoint(
        lambda p, z: vae.apply(p, z / vae.cfg.scaling_factor,
                               method=vae.decode))
    img_hat = decode(vae_params, x0)
    img_hat = jnp.clip(img_hat, -1.0, 1.0)
    if stop_decode_gradient:
        img_hat = jax.lax.stop_gradient(img_hat)
    edge = sobel_edge_loss(img_hat, img_gt)
    lp = jnp.asarray(0.0)
    if lpips_model is not None:
        lp = jnp.mean(lpips_model.apply(lpips_params, img_hat, img_gt))
    return lp, edge
