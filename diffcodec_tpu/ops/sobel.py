"""Sobel gradient-magnitude edge op and edge loss.

Parity: `controlnet/edge_loss.py:5-38` (SobelEdgeLoss): per-channel grouped
3x3 Sobel convs, gradient magnitude sqrt(gx^2 + gy^2 + eps), L1 between pred
and target magnitudes, inputs rescaled from [-1, 1] to [0, 1] first.
NHWC layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_KX = jnp.asarray([[-1.0, 0.0, 1.0],
                   [-2.0, 0.0, 2.0],
                   [-1.0, 0.0, 1.0]], jnp.float32)
_KY = _KX.T


def sobel_magnitude(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Per-channel Sobel gradient magnitude of an NHWC tensor."""
    C = x.shape[-1]
    x = x.astype(jnp.float32)
    # depthwise conv: kernel HWIO with feature_group_count=C
    kx = jnp.tile(_KX[:, :, None, None], (1, 1, 1, C))
    ky = jnp.tile(_KY[:, :, None, None], (1, 1, 1, C))
    dn = lax.conv_dimension_numbers(x.shape, kx.shape, ("NHWC", "HWIO", "NHWC"))
    gx = lax.conv_general_dilated(x, kx, (1, 1), "SAME", dimension_numbers=dn,
                                  feature_group_count=C)
    gy = lax.conv_general_dilated(x, ky, (1, 1), "SAME", dimension_numbers=dn,
                                  feature_group_count=C)
    return jnp.sqrt(gx * gx + gy * gy + eps)


def sobel_edge_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 of Sobel magnitudes; inputs in [-1, 1] rescaled to [0, 1]."""
    pred01 = (pred + 1.0) / 2.0
    target01 = (target + 1.0) / 2.0
    return jnp.mean(jnp.abs(sobel_magnitude(pred01) -
                            sobel_magnitude(target01)))
