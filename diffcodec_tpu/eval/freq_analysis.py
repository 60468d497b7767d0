"""Low/high frequency-band reconstruction-error analysis.

Parity target: the frequency-error study in `improv_experiments.ipynb`
(cells 0-2): split original and prediction into low-frequency (Gaussian
blur, kernel 15, sigma 3) and high-frequency (residual) bands, report the
per-band MSE, and plot the per-video bar chart.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel(kernel_size: int = 15, sigma: float = 3.0) -> np.ndarray:
    x = np.arange(-(kernel_size // 2), kernel_size // 2 + 1.0)
    xg = np.tile(x, (kernel_size, 1))
    k = np.exp(-(xg ** 2 + xg.T ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, kernel_size: int = 15,
                  sigma: float = 3.0) -> jnp.ndarray:
    """Depthwise Gaussian blur of NHWC images (zero padding, matching the
    notebook's conv2d padding=k//2)."""
    C = x.shape[-1]
    k = jnp.asarray(gaussian_kernel(kernel_size, sigma))
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, C))  # HWIO depthwise
    pad = kernel_size // 2
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kern, window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def frequency_errors(orig: np.ndarray, pred: np.ndarray,
                     kernel_size: int = 15, sigma: float = 3.0
                     ) -> Dict[str, float]:
    """Per-band MSE between images in [0, 1] (NHWC or HWC)."""
    orig = jnp.asarray(orig, jnp.float32)
    pred = jnp.asarray(pred, jnp.float32)
    if orig.ndim == 3:
        orig, pred = orig[None], pred[None]
    if orig.shape != pred.shape:
        raise ValueError(f"shape mismatch: {orig.shape} vs {pred.shape}")
    orig_low = gaussian_blur(orig, kernel_size, sigma)
    pred_low = gaussian_blur(pred, kernel_size, sigma)
    low_err = float(jnp.mean((orig_low - pred_low) ** 2))
    high_err = float(jnp.mean(((orig - orig_low) - (pred - pred_low)) ** 2))
    return {"low_error": low_err, "high_error": high_err}


def plot_frequency_errors(results: Mapping[str, Mapping[str, float]],
                          out_path: str, title: str =
                          "Low vs High Frequency Errors per Video") -> None:
    """Grouped bar chart of per-video band errors (notebook cell 2)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = list(results)
    x = np.arange(len(labels))
    width = 0.35
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.bar(x - width / 2, [results[v]["low_error"] for v in labels], width,
           label="Low-Freq Error")
    ax.bar(x + width / 2, [results[v]["high_error"] for v in labels], width,
           label="High-Freq Error")
    ax.set_ylabel("MSE Error")
    ax.set_title(title)
    ax.set_xticks(x)
    ax.set_xticklabels(labels)
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)
