"""`bjontegaard` pip-library parity for the BD-rate implementations.

The reference's `bd_test.py:56-108` computes BD-rates through the
`bjontegaard` pip package (`bd.bd_rate(..., method='pchip',
min_overlap=0)`).  That package is not installed here, so its pchip core
math is vendored below as a ~30-line oracle: scipy PchipInterpolator of
log-rate over distortion, *exact* piecewise-polynomial integration over
the overlapping distortion range (`PchipInterpolator.integrate`), then
`(exp(avg_diff) - 1) * 100`.  Our `bd_rate` uses the reference's own
`BD_rate_eval.py:6-49` protocol (100-point trapezoid) — the two must agree
to well under a tenth of a BD-rate percentage point on the committed RD
operating points (`bd_test.py:7-53`).

Also quantifies the reference's decreasing-curve flattening bug
(`bd_test.py:76`): for every lower-is-better metric the buggy
monotonicity enforcement collapses the extrapolated curve to a constant,
which makes the library's BD-rate NaN — so the reference's extrapolated
LPIPS/FID BD numbers were never computable.  Our fixed enforcement yields
finite values.
"""

import numpy as np
import pytest
from scipy.interpolate import PchipInterpolator

from diffcodec_tpu.eval.anchors_data import (H264_UVG, HEVC_UVG_GOP4,
                                             HEVC_UVG_GOP8, OURS_UVG)
from diffcodec_tpu.eval.bd_rate import (bd_rate, bd_rate_extrapolated,
                                        extrapolate_rd_curve)


def oracle_bd_rate_pchip(rate_anchor, dist_anchor, rate_test, dist_test):
    """Vendored core math of `bjontegaard.bd_rate(method='pchip',
    min_overlap=0)`: pchip of log-rate over distortion, exact integral over
    the overlap, relative rate delta in percent."""
    ra, da = np.asarray(rate_anchor, float), np.asarray(dist_anchor, float)
    rt, dt = np.asarray(rate_test, float), np.asarray(dist_test, float)
    sa, st = np.argsort(da), np.argsort(dt)
    da, ra = da[sa], np.log(ra[sa])
    dt, rt = dt[st], np.log(rt[st])
    lo = max(da.min(), dt.min())
    hi = min(da.max(), dt.max())
    if hi <= lo:
        return float("nan")
    fa = PchipInterpolator(da, ra)
    ft = PchipInterpolator(dt, rt)
    int_a = fa.integrate(lo, hi)
    int_t = ft.integrate(lo, hi)
    avg_diff = (int_t - int_a) / (hi - lo)
    return float((np.exp(avg_diff) - 1) * 100)


def _pchip_slopes(x, y):
    """Hermite slopes of the JCT-VC / Excel-VBA `bdrate` implementation
    (the algorithm the pip `bjontegaard` package ports): interior points
    use the Fritsch-Butland weighted harmonic mean, endpoints the
    shape-preserving three-point `pchipend` formula.  Written WITHOUT
    scipy so it is an independent check on PchipInterpolator."""
    x, y = np.asarray(x, float), np.asarray(y, float)
    h = np.diff(x)
    delta = np.diff(y) / h
    n = len(x)
    d = np.zeros(n)

    def pchipend(h1, h2, del1, del2):
        dd = ((2.0 * h1 + h2) * del1 - h1 * del2) / (h1 + h2)
        if dd * del1 < 0:
            dd = 0.0
        elif del1 * del2 < 0 and abs(dd) > abs(3.0 * del1):
            dd = 3.0 * del1
        return dd

    for i in range(1, n - 1):
        if delta[i - 1] * delta[i] > 0:
            w1 = 2.0 * h[i] + h[i - 1]
            w2 = h[i] + 2.0 * h[i - 1]
            d[i] = (w1 + w2) / (w1 / delta[i - 1] + w2 / delta[i])
        else:
            d[i] = 0.0
    d[0] = pchipend(h[0], h[1], delta[0], delta[1])
    d[-1] = pchipend(h[-1], h[-2], delta[-1], delta[-2])
    return h, delta, d


def _pchip_integrate(x, y, lo, hi):
    """Exact integral of the Hermite pchip over [lo, hi], each cubic
    segment integrated analytically (clipped to the overlap) — the pip
    library's integration, independent of scipy."""
    x = np.asarray(x, float)
    h, delta, d = _pchip_slopes(x, y)
    total = 0.0
    for i in range(len(x) - 1):
        a = max(lo, x[i])
        b = min(hi, x[i + 1])
        if b <= a:
            continue
        # Hermite cubic on [x_i, x_{i+1}] in s = t - x_i:
        #   p(s) = y_i + d_i s + c_i s^2 + b_i s^3
        ci = (3.0 * delta[i] - 2.0 * d[i] - d[i + 1]) / h[i]
        bi = (d[i] + d[i + 1] - 2.0 * delta[i]) / (h[i] ** 2)
        s0, s1 = a - x[i], b - x[i]
        total += (y[i] * (s1 - s0) + d[i] * (s1**2 - s0**2) / 2.0 +
                  ci * (s1**3 - s0**3) / 3.0 + bi * (s1**4 - s0**4) / 4.0)
    return total


def vendored_bd_rate_pchip(rate_anchor, dist_anchor, rate_test, dist_test):
    """The pip `bjontegaard` package's `bd_rate(..., method='pchip',
    min_overlap=0)` core, vendored scipy-free: log10 rates, handwritten
    Hermite pchip of log-rate over distortion, analytic segment
    integration over the overlap, `(10**avg_diff - 1) * 100`."""
    ra = np.log10(np.asarray(rate_anchor, float))
    rt = np.log10(np.asarray(rate_test, float))
    da = np.asarray(dist_anchor, float)
    dt = np.asarray(dist_test, float)
    sa, st = np.argsort(da), np.argsort(dt)
    da, ra = da[sa], ra[sa]
    dt, rt = dt[st], rt[st]
    lo = max(da.min(), dt.min())
    hi = min(da.max(), dt.max())
    if hi <= lo:
        return float("nan")
    int_a = _pchip_integrate(da, ra, lo, hi)
    int_t = _pchip_integrate(dt, rt, lo, hi)
    avg_diff = (int_t - int_a) / (hi - lo)
    return float((10.0 ** avg_diff - 1) * 100)


def _cases():
    """(anchor, ours) RD point pairs from the committed bd_test.py tables,
    per metric, sign-flipped for lower-is-better the way bd_test.py does."""
    cases = []
    for gop, hevc in ((8, HEVC_UVG_GOP8), (4, HEVC_UVG_GOP4)):
        ours = OURS_UVG[gop]
        for anchor_name, anchor in (("H.264", H264_UVG), ("HEVC", hevc)):
            for metric, higher in (("psnr", True), ("ms_ssim", True),
                                   ("lpips", False), ("fid", False)):
                cases.append((f"gop{gop}-{anchor_name}-{metric}",
                              anchor, ours, metric, higher))
    return cases


@pytest.mark.parametrize("name,anchor,ours,metric,higher",
                         _cases(), ids=lambda c: c if isinstance(c, str)
                         else None)
def test_bd_rate_matches_pchip_oracle(name, anchor, ours, metric, higher):
    sign = 1.0 if higher else -1.0
    qa = sign * np.asarray(anchor[metric])
    qo = sign * np.asarray(ours[metric])
    expected = oracle_bd_rate_pchip(anchor["bpp"], qa, ours["bpp"], qo)
    got = bd_rate(anchor["bpp"], qa, ours["bpp"], qo, higher_better=True)
    if np.isnan(expected):
        assert np.isnan(got)
    else:
        # bd_rate is the BD_rate_eval.py protocol (100-point trapezoid);
        # the library integrates the pchip exactly.  On 3-point curves the
        # two estimators differ by up to ~0.2pp — a protocol difference,
        # not an implementation bug (bd_rate_pchip_exact matches exactly,
        # asserted below).
        assert abs(got - expected) < 0.25, (name, got, expected)
        from diffcodec_tpu.eval.bd_rate import bd_rate_pchip_exact
        exact = bd_rate_pchip_exact(anchor["bpp"], qa, ours["bpp"], qo,
                                    higher_better=True)
        np.testing.assert_allclose(exact, expected, rtol=1e-12)


@pytest.mark.parametrize("name,anchor,ours,metric,higher",
                         _cases(), ids=lambda c: c if isinstance(c, str)
                         else None)
def test_pchip_exact_matches_vendored_library_math(name, anchor, ours,
                                                   metric, higher):
    """`bd_rate_pchip_exact` (scipy PCHIP + .integrate, natural log) must
    agree with the scipy-free vendored pip-`bjontegaard` math (handwritten
    Fritsch-Butland Hermite + analytic integration, log10) to numerical
    precision — this is the internals-parity check VERDICT r03 asked for
    (ROADMAP #8): two fully independent code paths for the same spec."""
    from diffcodec_tpu.eval.bd_rate import bd_rate_pchip_exact
    sign = 1.0 if higher else -1.0
    qa = sign * np.asarray(anchor[metric])
    qo = sign * np.asarray(ours[metric])
    expected = vendored_bd_rate_pchip(anchor["bpp"], qa, ours["bpp"], qo)
    got = bd_rate_pchip_exact(anchor["bpp"], qa, ours["bpp"], qo,
                              higher_better=True)
    if np.isnan(expected):
        assert np.isnan(got)
    else:
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)


def test_vendored_slopes_match_scipy_pchip():
    """The handwritten Hermite slopes equal scipy's PchipInterpolator
    derivatives on a generic strictly-monotone curve — pins the vendored
    math to the library scipy itself implements."""
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 9))
    y = np.cumsum(rng.uniform(0.1, 2.0, 9))
    _, _, d = _pchip_slopes(x, y)
    f = PchipInterpolator(x, y)
    np.testing.assert_allclose(d, f.derivative()(x), rtol=1e-10, atol=1e-12)
    # and the analytic integral equals scipy's exact integral
    np.testing.assert_allclose(_pchip_integrate(x, y, x[1] + 0.3, x[-2]),
                               float(f.integrate(x[1] + 0.3, x[-2])),
                               rtol=1e-10)


def test_bd_rate_extrapolated_matches_extrapolated_oracle():
    """bd_rate_extrapolated == extrapolate both curves (fixed enforcement)
    then the library's pchip BD-rate, on a committed PSNR case."""
    anchor, ours = HEVC_UVG_GOP8, OURS_UVG[8]
    r1, q1 = extrapolate_rd_curve(np.asarray(anchor["bpp"]),
                                  np.asarray(anchor["psnr"]))
    r2, q2 = extrapolate_rd_curve(np.asarray(ours["bpp"]),
                                  np.asarray(ours["psnr"]))
    expected = oracle_bd_rate_pchip(r1, q1, r2, q2)
    got = bd_rate_extrapolated(anchor["bpp"], anchor["psnr"], ours["bpp"],
                               ours["psnr"], higher_better=True)
    assert np.isfinite(got)
    assert abs(got - expected) < 0.1, (got, expected)


def _buggy_extrapolate(bpp, quality, n_points=7, extend_factor=0.1):
    """The reference's `bd_test.py:56-78` verbatim semantics, including the
    decreasing-branch flattening bug at `bd_test.py:76`."""
    from scipy.interpolate import interp1d
    bpp = np.asarray(bpp, float)
    quality = np.asarray(quality, float)
    order = np.argsort(bpp)
    bpp, quality = bpp[order], quality[order]
    f = interp1d(bpp, quality, kind="linear", fill_value="extrapolate")
    new_bpp = np.linspace(max(bpp.min() * (1 - extend_factor), 0.001),
                          bpp.max() * (1 + extend_factor), n_points)
    new_q = f(new_bpp)
    if np.all(np.diff(quality) > 0):
        new_q = np.maximum.accumulate(new_q)
    elif np.all(np.diff(quality) < 0):
        new_q = np.minimum.accumulate(new_q[::-1])[::-1]  # the bug
    return new_bpp, new_q


def test_flattening_bug_impact_quantified():
    """With the reference's enforcement, every strictly-decreasing curve
    (LPIPS/FID vs bpp) collapses to a constant, so the distortion overlap
    is empty and the BD-rate is NaN; the fixed enforcement preserves the
    curve and yields a finite BD-rate."""
    anchor, ours = HEVC_UVG_GOP8, OURS_UVG[8]
    # HEVC GOP8 LPIPS is strictly decreasing in bpp -> bug branch fires
    _, q_buggy = _buggy_extrapolate(anchor["bpp"], anchor["lpips"])
    assert np.ptp(q_buggy) == 0.0  # collapsed to a constant
    r1, q1 = extrapolate_rd_curve(np.asarray(anchor["bpp"]),
                                  np.asarray(anchor["lpips"]))
    assert np.ptp(q1) > 0.0  # fixed enforcement keeps the curve

    # buggy pipeline -> NaN (flat anchor curve has zero overlap range)
    rb, qb = _buggy_extrapolate(anchor["bpp"], anchor["lpips"])
    r2, q2 = _buggy_extrapolate(ours["bpp"], ours["lpips"])
    buggy = oracle_bd_rate_pchip(rb, -qb, r2, -q2)
    assert np.isnan(buggy)
    # fixed pipeline -> finite
    fixed = bd_rate_extrapolated(anchor["bpp"], anchor["lpips"],
                                 ours["bpp"], ours["lpips"],
                                 higher_better=False)
    assert np.isfinite(fixed)
