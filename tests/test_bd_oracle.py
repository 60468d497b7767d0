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
