"""Residual-path data transform + warped prediction fusion.

Parity targets:
  * ResidueDataset (`controlnet/dataset.py:193-276`): warp both anchors to
    the target with softsplat, occlusion-fuse into a single warped
    prediction, residual = gt - fused.
  * WarpingDatasetWrapper (`controlnet/residual_utils.py:120-211`): same for
    the standalone residual DDPM.

Deliberate fixes over the reference (SURVEY.md section 7 "known bugs"):
  * the reference warps image1 by flow1 for BOTH directions
    (`dataset.py:239-250`) — here image2 is warped by flow2;
  * it fuses with raw occlusion masks as confidences (`dataset.py:256-261`)
    — here validity weights (1 - occlusion) are used, uniform-confidence
    fallback matching `residual_utils.py:182-187`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from diffcodec_tpu.ops.flow import compute_occlusion_mask
from diffcodec_tpu.ops.softsplat import softsplat


def warp_and_fuse(img1: jnp.ndarray, img2: jnp.ndarray, flow1: jnp.ndarray,
                  flow2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                               jnp.ndarray]:
    """Forward-warp both anchors to the target and occlusion-fuse.

    img* [B,H,W,3] (any range), flow* [B,H,W,2] pixel units
    (flow1: img1->target, flow2: img2->target).
    Returns (fused, occ1, occ2).
    """
    ones = jnp.ones(flow1.shape[:3] + (1,), jnp.float32)
    warped1 = softsplat(img1.astype(jnp.float32), flow1.astype(jnp.float32),
                        ones, "soft")
    warped2 = softsplat(img2.astype(jnp.float32), flow2.astype(jnp.float32),
                        ones, "soft")
    occ1 = compute_occlusion_mask(flow2, flow1)
    occ2 = compute_occlusion_mask(flow1, flow2)
    w1 = 1.0 - occ1
    w2 = 1.0 - occ2
    denom = w1 + w2
    uniform = 0.5 * (warped1 + warped2)
    fused = jnp.where(denom > 1e-6,
                      (w1 * warped1 + w2 * warped2) /
                      jnp.maximum(denom, 1e-6),
                      uniform)
    return fused, occ1, occ2


def make_residue_batch(batch: Dict[str, jnp.ndarray]
                       ) -> Dict[str, jnp.ndarray]:
    """UniDataset batch -> residue-training batch.

    In: {'image' [B,H,W,3] in [-1,1], 'cond' [B,H,W,6] in [0,1],
        'flow' [B,H,W,4]}.
    Out: adds 'warped' (fused prediction, [-1,1]) and 'residual'
    (gt - warped); `train_rescontrolnet.py:1081` trains on 'residual' with
    warp_cond='warped'.
    """
    img1 = batch["cond"][..., :3] * 2.0 - 1.0
    img2 = batch["cond"][..., 3:] * 2.0 - 1.0
    flow1 = batch["flow"][..., :2]
    flow2 = batch["flow"][..., 2:]
    fused, occ1, occ2 = warp_and_fuse(img1, img2, flow1, flow2)
    fused = jnp.clip(fused, -1.0, 1.0)
    out = dict(batch)
    out["warped"] = fused
    out["residual"] = batch["image"] - fused
    return out
