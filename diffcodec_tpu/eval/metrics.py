"""Image/video quality metrics in JAX: PSNR, SSIM, MS-SSIM.

Parity targets (`test_utils.py:23-82`): PSNR at 255 data range
(`test_utils.py:23-24`), MS-SSIM with data_range 255 (pytorch_msssim
defaults: 11x11 gaussian sigma 1.5, K=(0.01, 0.03), power weights
[0.0448, 0.2856, 0.3001, 0.2363, 0.1333]), batch helpers skipping PSNR >
1000 pairs (`test_utils.py:34-40`).  LPIPS lives in
`diffcodec_tpu.train.lpips`; FID/FVD in `diffcodec_tpu.eval.frechet`.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 255.0):
    """PSNR over full image ([..., H, W, C]), reference `test_utils.py:23-24`
    (20 log10(255/sqrt(mse)))."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mse = jnp.mean((a - b) ** 2, axis=(-3, -2, -1))
    finite = 20.0 * jnp.log10(data_range) - 10.0 * jnp.log10(
        jnp.maximum(mse, 1e-20))
    # identical frames -> inf, so the >1000 skip rule (test_utils.py:34-40)
    # applies exactly as in the reference
    return jnp.where(mse == 0.0, jnp.inf, finite)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _blur(x, kernel):
    """Separable valid-mode gaussian filter per channel (NHWC)."""
    C = x.shape[-1]
    k = kernel.reshape(1, -1, 1, 1)
    kx = jnp.tile(k, (1, 1, 1, C))
    dn = lax.conv_dimension_numbers(x.shape, (1, kernel.size, 1, C),
                                    ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(x, kx, (1, 1), "VALID",
                                 dimension_numbers=dn,
                                 feature_group_count=C)
    ky = jnp.tile(kernel.reshape(-1, 1, 1, 1), (1, 1, 1, C))
    dn = lax.conv_dimension_numbers(x.shape, (kernel.size, 1, 1, C),
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, ky, (1, 1), "VALID",
                                    dimension_numbers=dn,
                                    feature_group_count=C)


def _ssim_components(a, b, data_range, size=11, sigma=1.5,
                     k1=0.01, k2=0.03):
    kernel = _gaussian_kernel(size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a = _blur(a, kernel)
    mu_b = _blur(b, kernel)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _blur(a * a, kernel) - mu_aa
    sigma_bb = _blur(b * b, kernel) - mu_bb
    sigma_ab = _blur(a * b, kernel) - mu_ab
    cs = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    ssim_map = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    return ssim_map, cs


def ssim(a, b, data_range: float = 255.0):
    """Mean single-scale SSIM over [B, H, W, C] pairs -> [B]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    ssim_map, _ = _ssim_components(a, b, data_range)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def ms_ssim(a, b, data_range: float = 255.0,
            weights: Sequence[float] = _MSSSIM_WEIGHTS):
    """Multi-scale SSIM with exact pytorch_msssim semantics (the package
    the reference uses at data_range 255, `test_utils.py:41-42`):

      * per-channel spatial means of cs (coarse scales) / ssim (finest),
        relu-clamped, combined as prod(m^w) PER CHANNEL, then averaged
        over channels (channel-mean-of-products, not product-of-means);
      * 2x avg-pool downsampling between scales with symmetric zero
        padding of `dim % 2` on each side, zeros included in the average
        (torch `avg_pool2d(x, 2, padding=s%2)`, count_include_pad=True).

    Requires H, W >= 160 for the standard 5 scales (else reduce weights).
    Returns [B]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    levels = len(weights)
    w = jnp.asarray(weights)
    values = []
    for i in range(levels):
        ssim_map, cs_map = _ssim_components(a, b, data_range)
        if i < levels - 1:
            values.append(jnp.maximum(jnp.mean(cs_map, axis=(1, 2)), 0.0))
            pad_h = a.shape[1] % 2
            pad_w = a.shape[2] % 2
            a = _avg_pool2(a, pad_h, pad_w)
            b = _avg_pool2(b, pad_h, pad_w)
        else:
            values.append(jnp.maximum(jnp.mean(ssim_map, axis=(1, 2)),
                                      0.0))
    stacked = jnp.stack(values, axis=0)  # [levels, B, C]
    per_channel = jnp.prod(stacked ** w[:, None, None], axis=0)  # [B, C]
    return jnp.mean(per_channel, axis=-1)


def _avg_pool2(x, pad_h: int = 0, pad_w: int = 0):
    """torch F.avg_pool2d(x, 2, padding=(pad_h, pad_w)) semantics: zero
    padding on BOTH sides, padded zeros counted in the divisor."""
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                             "VALID") / 4.0


def calculate_metrics_batch(orig: np.ndarray, pred: np.ndarray,
                            psnr_skip_threshold: float = 1000.0,
                            lpips_fn=None, fid_fn=None, fvd_fn=None
                            ) -> Dict[str, float]:
    """Batch metric summary over [N, H, W, C] uint8/float frames.

    Parity: `test_utils.py:27-82` — mean PSNR with >1000 values skipped
    (identical frames), mean MS-SSIM at data_range 255; optional LPIPS
    (callable pred01, orig01 in [-1,1] -> [N]), FID feature fn (uint8
    frames -> feats), and FVD feature fn (videos -> feats, frames stacked
    as one clip like `test_utils.py:69-74`).
    """
    orig = jnp.asarray(np.asarray(orig, np.float32))
    pred = jnp.asarray(np.asarray(pred, np.float32))
    p = np.asarray(psnr(orig, pred))
    valid = p < psnr_skip_threshold
    mean_psnr = float(p[valid].mean()) if valid.any() else float("inf")
    m = np.asarray(ms_ssim(orig, pred))
    out = {"psnr": mean_psnr, "ms_ssim": float(m.mean())}
    if lpips_fn is not None:
        o = orig / 127.5 - 1.0
        q = pred / 127.5 - 1.0
        out["lpips"] = float(np.mean(np.asarray(lpips_fn(q, o))))
    if fid_fn is not None:
        from diffcodec_tpu.eval.frechet import fid_score
        out["fid"] = fid_score(np.asarray(orig, np.uint8),
                               np.asarray(pred, np.uint8), fid_fn)
    if fvd_fn is not None:
        from diffcodec_tpu.eval.frechet import fvd_score
        v_o = np.asarray(orig)[None] / 255.0
        v_p = np.asarray(pred)[None] / 255.0
        out["fvd"] = fvd_score(v_o, v_p, fvd_fn)
    return out
