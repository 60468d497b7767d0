"""In-training validation: sample inter frames and score them.

Parity target: `log_validation` (`train_controlnet.py:84-255`) — run the
full sampling pipeline on held-out (anchors, flows, gt) triples, compute
PSNR / MS-SSIM, and emit [I0 | I1 | Pred | GT] panels; scalars go to the
MetricsLogger, panels to PNG files (TensorBoard images optional).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from diffcodec_tpu.eval.metrics import ms_ssim, psnr
from diffcodec_tpu.utils.logging import MetricsLogger


def make_panel(i0: np.ndarray, i1: np.ndarray, pred: np.ndarray,
               gt: np.ndarray) -> np.ndarray:
    """[I0 | I1 | Pred | GT] side-by-side uint8 panel
    (train_controlnet.py:222-248 layout)."""
    return np.concatenate([i0, i1, pred, gt], axis=1)


def run_validation(pipeline, params, batch: Dict[str, np.ndarray],
                   text_embeds, uncond_embeds, rng,
                   out_dir: Optional[str] = None,
                   logger: Optional[MetricsLogger] = None,
                   step: int = 0) -> Dict[str, float]:
    """Sample predictions for a validation batch and score vs ground truth.

    batch: {'cond' [B,H,W,6] in [0,1], 'flow' [B,H,W,4], 'image' [B,H,W,3]
    in [-1,1]}.  Returns {'val_psnr', 'val_ms_ssim'} means.
    """
    images = pipeline.sample(params, rng, text_embeds, uncond_embeds,
                             jnp.asarray(batch["cond"]),
                             jnp.asarray(batch["flow"]))
    pred_u8 = np.clip((np.asarray(images, np.float32) + 1) * 127.5,
                      0, 255).astype(np.uint8)
    gt_u8 = np.clip((np.asarray(batch["image"], np.float32) + 1) * 127.5,
                    0, 255).astype(np.uint8)
    p = np.asarray(psnr(jnp.asarray(pred_u8, jnp.float32),
                        jnp.asarray(gt_u8, jnp.float32)))
    p = p[np.isfinite(p)]
    m = np.asarray(ms_ssim(jnp.asarray(pred_u8, jnp.float32),
                           jnp.asarray(gt_u8, jnp.float32))) \
        if pred_u8.shape[1] >= 176 else np.asarray([np.nan])
    metrics = {"val_psnr": float(p.mean()) if p.size else float("inf"),
               "val_ms_ssim": float(np.nanmean(m))}
    if logger is not None:
        logger.log(metrics, step)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image
        cond_u8 = np.clip(np.asarray(batch["cond"]) * 255, 0,
                          255).astype(np.uint8)
        for b in range(pred_u8.shape[0]):
            panel = make_panel(cond_u8[b, ..., :3], cond_u8[b, ..., 3:],
                               pred_u8[b], gt_u8[b])
            Image.fromarray(panel).save(
                os.path.join(out_dir, f"val_{step:07d}_{b}.png"))
            if logger is not None:
                logger.log_image(f"validation/panel_{b}", panel, step)
    return metrics
