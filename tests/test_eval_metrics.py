"""Metrics and BD-rate tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from diffcodec_tpu.eval.bd_rate import bd_quality, bd_rate, bd_rate_safe
from diffcodec_tpu.eval.metrics import (calculate_metrics_batch, ms_ssim,
                                        psnr, ssim)


def test_psnr_closed_form():
    a = np.zeros((1, 8, 8, 1), np.float32)
    b = np.full((1, 8, 8, 1), 16.0, np.float32)  # mse = 256 -> psnr ~ 24.08
    got = float(psnr(jnp.asarray(a), jnp.asarray(b))[0])
    want = 20 * np.log10(255) - 10 * np.log10(256)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_psnr_identical_is_huge():
    a = np.random.default_rng(0).random((1, 8, 8, 3)).astype(np.float32)
    assert float(psnr(jnp.asarray(a), jnp.asarray(a))[0]) > 100


def test_ssim_identical_and_ordering():
    rng = np.random.default_rng(1)
    a = (rng.random((1, 64, 64, 3)) * 255).astype(np.float32)
    s_same = float(ssim(jnp.asarray(a), jnp.asarray(a))[0])
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)
    noisy1 = a + rng.normal(0, 5, a.shape).astype(np.float32)
    noisy2 = a + rng.normal(0, 25, a.shape).astype(np.float32)
    s1 = float(ssim(jnp.asarray(a), jnp.asarray(noisy1))[0])
    s2 = float(ssim(jnp.asarray(a), jnp.asarray(noisy2))[0])
    assert 1.0 > s1 > s2 > 0.0


def test_ssim_matches_independent_numpy():
    """Cross-check against a direct scalar transcription of the SSIM
    formula (Wang et al.) with the same 11x11 sigma-1.5 window."""
    from scipy.ndimage import convolve
    rng = np.random.default_rng(2)
    a = (rng.random((32, 32)) * 255).astype(np.float64)
    b = a + rng.normal(0, 10, a.shape)

    x = np.arange(11) - 5
    g = np.exp(-(x ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()
    win = np.outer(g, g)

    def filt(img):
        return convolve(img, win, mode="constant")[5:-5, 5:-5]

    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu_a, mu_b = filt(a), filt(b)
    va = filt(a * a) - mu_a ** 2
    vb = filt(b * b) - mu_b ** 2
    vab = filt(a * b) - mu_a * mu_b
    want = np.mean(((2 * mu_a * mu_b + c1) * (2 * vab + c2)) /
                   ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))

    got = float(ssim(jnp.asarray(a[None, :, :, None], jnp.float32),
                     jnp.asarray(b[None, :, :, None], jnp.float32))[0])
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_ms_ssim_identical_and_ordering():
    rng = np.random.default_rng(3)
    a = (rng.random((1, 176, 176, 3)) * 255).astype(np.float32)
    m_same = float(ms_ssim(jnp.asarray(a), jnp.asarray(a))[0])
    np.testing.assert_allclose(m_same, 1.0, atol=1e-4)
    noisy = a + rng.normal(0, 20, a.shape).astype(np.float32)
    m_noisy = float(ms_ssim(jnp.asarray(a), jnp.asarray(noisy))[0])
    assert 0.0 < m_noisy < 1.0
    blur = a.copy()
    blur[:, ::2] = blur[:, 1::2]  # heavy structural distortion
    m_blur = float(ms_ssim(jnp.asarray(a), jnp.asarray(blur))[0])
    assert m_blur < 1.0


def test_calculate_metrics_batch_skips_identical():
    rng = np.random.default_rng(4)
    a = (rng.random((3, 176, 176, 3)) * 255).astype(np.uint8)
    pred = a.copy()
    pred[1] = np.clip(pred[1].astype(int) + 4, 0, 255).astype(np.uint8)
    out = calculate_metrics_batch(a, pred)
    # frames 0, 2 identical -> psnr > 1000 -> skipped; mean from frame 1 only
    assert 30 < out["psnr"] < 45
    assert 0.9 < out["ms_ssim"] <= 1.0


# ---------------------------------------------------------------------------
# BD-rate
# ---------------------------------------------------------------------------

def test_bd_rate_identical_curves_zero():
    R = [0.01, 0.02, 0.04]
    Q = [30.0, 33.0, 36.0]
    assert abs(bd_rate(R, Q, R, Q)) < 1e-9


def test_bd_rate_constant_rate_offset():
    """A codec needing exactly 2x the rate at every quality -> +100%."""
    R1 = np.asarray([0.01, 0.02, 0.04])
    Q = [30.0, 33.0, 36.0]
    got = bd_rate(R1, Q, 2 * R1, Q)
    np.testing.assert_allclose(got, 100.0, rtol=1e-6)
    # and half the rate -> -50%
    got = bd_rate(R1, Q, R1 / 2, Q)
    np.testing.assert_allclose(got, -50.0, rtol=1e-6)


def test_bd_rate_lower_better_metric_sign():
    R1 = np.asarray([0.01, 0.02, 0.04])
    L = [0.20, 0.15, 0.10]  # LPIPS decreasing with rate
    got = bd_rate(R1, L, R1 / 2, L, higher_better=False)
    np.testing.assert_allclose(got, -50.0, rtol=1e-6)


def test_bd_rate_no_overlap_nan():
    assert np.isnan(bd_rate([0.01, 0.02], [30, 31], [0.01, 0.02], [40, 41]))


def test_bd_rate_safe_extends_range():
    R1 = np.asarray([0.01, 0.02, 0.04])
    Q1 = [30.0, 33.0, 36.0]
    R2 = np.asarray([0.008, 0.016, 0.032])
    Q2 = [31.0, 34.0, 37.0]
    plain = bd_rate(R1, Q1, R2, Q2)
    safe = bd_rate_safe(R1, Q1, R2, Q2)
    assert np.isfinite(plain) and np.isfinite(safe)


def test_bd_quality():
    R = [0.01, 0.02, 0.04]
    Q1 = [30.0, 33.0, 36.0]
    Q2 = [31.0, 34.0, 37.0]  # +1 dB everywhere
    np.testing.assert_allclose(bd_quality(R, Q1, R, Q2), 1.0, rtol=1e-6)


def test_extrapolate_rd_curve():
    from diffcodec_tpu.eval.bd_rate import extrapolate_rd_curve
    bpp = [0.01, 0.02, 0.04]
    q = [30.0, 33.0, 36.0]
    nb, nq = extrapolate_rd_curve(bpp, q)
    assert len(nb) == 7
    assert nb[0] >= 0.001 and nb[0] < 0.01 and nb[-1] > 0.04
    assert np.all(np.diff(nq) >= 0)  # monotone increasing preserved
    # decreasing metric: monotone decreasing enforced
    nb2, nq2 = extrapolate_rd_curve(bpp, [0.2, 0.15, 0.1])
    assert np.all(np.diff(nq2) <= 0)


def test_bd_rate_extrapolated():
    from diffcodec_tpu.eval.bd_rate import bd_rate_extrapolated
    R1 = np.asarray([0.01, 0.02, 0.04])
    Q = [30.0, 33.0, 36.0]
    got = bd_rate_extrapolated(R1, Q, 2 * R1, Q)
    np.testing.assert_allclose(got, 100.0, rtol=0.02)
    # lower-better metric path
    L = [0.2, 0.15, 0.1]
    got = bd_rate_extrapolated(R1, L, R1 / 2, L, higher_better=False)
    np.testing.assert_allclose(got, -50.0, rtol=0.02)


def test_bd_rate_extrapolated_headline_points():
    """Runs on the reference's actual published operating points."""
    from diffcodec_tpu.eval.anchors_data import HEVC_UVG_GOP8, OURS_UVG
    from diffcodec_tpu.eval.bd_rate import bd_rate_extrapolated
    got = bd_rate_extrapolated(HEVC_UVG_GOP8["bpp"], HEVC_UVG_GOP8["ms_ssim"],
                               OURS_UVG[8]["bpp"], OURS_UVG[8]["ms_ssim"])
    assert np.isfinite(got) or np.isnan(got)  # protocol runs; value logged


def test_frequency_errors_band_split(tmp_path):
    """improv_experiments.ipynb frequency-error parity: a blurred copy has
    only high-frequency error; a brightness shift only low-frequency."""
    import numpy as np

    from diffcodec_tpu.eval.freq_analysis import (frequency_errors,
                                                  plot_frequency_errors)

    rng = np.random.default_rng(0)
    orig = rng.random((64, 64, 3)).astype(np.float32)

    res_blur = frequency_errors(orig, np.asarray(
        __import__("diffcodec_tpu.eval.freq_analysis",
                   fromlist=["gaussian_blur"]).gaussian_blur(
            orig[None], 15, 3.0))[0])
    # blurring removes high frequencies -> high error dominates
    assert res_blur["high_error"] > 5 * res_blur["low_error"]

    shifted = np.clip(orig + 0.1, 0, 1)
    inner = frequency_errors(orig[8:-8, 8:-8], shifted[8:-8, 8:-8])
    # a DC shift is almost all low-frequency error
    assert inner["low_error"] > 5 * inner["high_error"]

    # identical -> zero
    same = frequency_errors(orig, orig)
    assert same["low_error"] == 0.0 and same["high_error"] == 0.0

    out = str(tmp_path / "bands.png")
    plot_frequency_errors({"vidA": res_blur, "vidB": inner}, out)
    assert __import__("os").path.getsize(out) > 1000
