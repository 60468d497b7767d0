"""Flow-field utilities: resizing conventions, occlusion masks.

Parity targets in the reference:
  * `controlnet/control_utils.py:11-17`  compute_mask (fwd/bwd consistency)
  * `controlnet/control_utils.py:74-97`  resize_and_normalize_flow_batched
  * `controlnet/utils.py:21-28`          resize_flow_to (pixel-unit scaling)
  * `controlnet/extractors.py:181-183`   interpolate-then-divide-by-factor

The reference carries *two* distinct resize conventions; both are kept, with
explicit names.  All arrays are NHWC: flow is [B, H, W, 2], (u, v) = (x, y)
displacement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffcodec_tpu.ops.softsplat import softsplat


def resize_bilinear(x: jnp.ndarray, target_h: int, target_w: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of NHWC tensors.

    align_corners=False matches torch `F.interpolate(mode='bilinear')`
    (half-pixel centers); align_corners=True matches the torch flag used by
    `controlnet/utils.py:25`.
    """
    B, H, W, C = x.shape
    if (H, W) == (target_h, target_w):
        return x
    if align_corners:
        # corner-aligned sampling grid
        ys = jnp.linspace(0.0, H - 1.0, target_h)
        xs = jnp.linspace(0.0, W - 1.0, target_w)
    else:
        scale_y = H / target_h
        scale_x = W / target_w
        ys = (jnp.arange(target_h) + 0.5) * scale_y - 0.5
        xs = (jnp.arange(target_w) + 0.5) * scale_x - 0.5
    ys = jnp.clip(ys, 0.0, H - 1.0)
    xs = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def resize_flow_pixel_units(flow: jnp.ndarray, target_h: int,
                            target_w: int) -> jnp.ndarray:
    """Resize flow, rescaling vectors so they stay in *target* pixel units.

    Parity: `controlnet/utils.py:21-28` (align_corners=True + u*=(W'/W),
    v*=(H'/H)).
    """
    B, H, W, _ = flow.shape
    out = resize_bilinear(flow, target_h, target_w, align_corners=True)
    scale = jnp.asarray([target_w / max(W, 1), target_h / max(H, 1)],
                        dtype=out.dtype)
    return out * scale


def resize_and_normalize_flow(flow: jnp.ndarray, target_h: int,
                              target_w: int) -> jnp.ndarray:
    """Resize flow then normalize u by (W'-1)/2, v by (H'-1)/2.

    Parity: `controlnet/control_utils.py:74-97`.  Note the reference does NOT
    rescale the vectors for the new resolution before normalizing — the
    normalized magnitudes therefore depend on the source resolution.  This is
    the convention `Bi_Dir_FeatureExtractor` trains with, so we keep it.
    """
    out = resize_bilinear(flow, target_h, target_w, align_corners=False)
    norm = jnp.asarray([(target_w - 1) / 2.0, (target_h - 1) / 2.0],
                       dtype=out.dtype)
    return out / norm


def resize_flow_by_factor(flow: jnp.ndarray, target_h: int,
                          target_w: int) -> jnp.ndarray:
    """Bilinear resize then divide by the downscale factor (H // target_h).

    Parity: `controlnet/extractors.py:181-183` (Bi_Dir_ResidueExtractor).
    """
    H = flow.shape[1]
    factor = H // target_h
    out = resize_bilinear(flow, target_h, target_w, align_corners=False)
    return out / factor


def compute_occlusion_mask(flow_bwd: jnp.ndarray, flow_fwd: jnp.ndarray,
                           threshold: float = 0.3, *,
                           impl: str = "auto") -> jnp.ndarray:
    """Forward-backward consistency occlusion mask.

    Parity: `controlnet/control_utils.py:11-17` `compute_mask(flow_b, flow_f)`:
    splat the backward flow along the forward flow with unit metric ('soft'),
    mark occluded where ||flow_fwd + warped_bwd||_2 > threshold.

    Returns [B, H, W, 1] float mask (1 = occluded).  fp32 island, matching the
    reference's disabled-autocast block.
    """
    flow_bwd = flow_bwd.astype(jnp.float32)
    flow_fwd = flow_fwd.astype(jnp.float32)
    metric = jnp.ones(flow_fwd.shape[:3] + (1,), jnp.float32)
    warped_bwd = softsplat(flow_bwd, flow_fwd, metric, "soft", impl=impl)
    diff = flow_fwd + warped_bwd
    mag = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True))
    return (mag > threshold).astype(jnp.float32)


def soft_fuse(warped_a: jnp.ndarray, warped_b: jnp.ndarray,
              conf_a: jnp.ndarray, conf_b: jnp.ndarray,
              occ_a: jnp.ndarray = None, occ_b: jnp.ndarray = None,
              eps: float = 1e-6) -> jnp.ndarray:
    """Confidence-weighted fusion of two warped feature maps.

    Parity: `controlnet/extractors.py:297-310`: clamp confidences >= 0,
    normalize, blend; where both directions are occluded ("double holes",
    occ_a + occ_b > 1.5) fall back to the plain average.
    """
    conf = jnp.concatenate([conf_a, conf_b], axis=-1)
    conf = jnp.clip(conf, 0.0, None)
    w_sum = jnp.sum(conf, axis=-1, keepdims=True) + eps
    w = conf / w_sum
    fused = w[..., :1] * warped_a + w[..., 1:] * warped_b
    if occ_a is not None and occ_b is not None:
        holes = (occ_a + occ_b) > 1.5
        avg = 0.5 * (warped_a + warped_b)
        fused = jnp.where(holes, avg, fused)
    return fused
