"""Published anchor RD points for BD-rate comparisons.

These are the benchmark *data* tables the reference hardcodes in its
BD/plot scripts (`bd_test.py:7-53`, `BD_rate_eval.py:84-133`,
`uvg_plots.py:97-148`, `inter_plots.py:34-53`) and BASELINE.md — the
operating points of "Ours" and the classical/learned anchors on UVG.
Format: {codec: {metric: [(bpp, quality), ...]}} ready for
`eval.plots.bd_rate_table` / `plot_rd_curves`.
"""

from __future__ import annotations

# "Ours" (the reference's published operating points), UVG, all frames.
# Columns per GOP: flow-rate modes none / sparse / dense.
OURS_UVG = {
    8: {
        "bpp": [0.008151, 0.013398, 0.024487],
        "psnr": [24.7537, 25.2568, 24.7502],
        "ms_ssim": [0.8587, 0.8702, 0.8514],
        "lpips": [0.1159, 0.1137, 0.1241],
        "fid": [1.2553, 1.2684, 1.2775],
    },
    4: {
        "bpp": [0.0163, 0.0208, 0.0303],
        "psnr": [26.0057, 27.3825, 25.9525],
        "ms_ssim": [0.9067, 0.9218, 0.9023],
        "lpips": [0.1295, 0.1217, 0.1365],
        "fid": [2.2353, 2.1344, 2.2206],
    },
}

# Anchors (bd_test.py tables), UVG
H264_UVG = {
    "bpp": [0.00511, 0.00862, 0.0469],
    "psnr": [24.363, 24.844, 25.617],
    "ms_ssim": [0.7921, 0.8038, 0.8097],
    "lpips": [0.1672, 0.1261, 0.0789],
    "fid": [1.2512, 0.6382, 0.0513],
}

HEVC_UVG_GOP8 = {
    "bpp": [0.00733, 0.00935, 0.0387],
    "psnr": [24.693, 24.925, 25.312],
    "ms_ssim": [0.8616, 0.8738, 0.8917],
    "lpips": [0.1757, 0.1346, 0.0602],
    "fid": [2.1156, 1.1488, 0.1045],
}

HEVC_UVG_GOP4 = {
    "bpp": [0.00873, 0.01087, 0.0387],
    "psnr": [24.110, 24.327, 25.197],
    "ms_ssim": [0.7920, 0.7986, 0.8085],
    "lpips": [0.2152, 0.1780, 0.0906],
    "fid": [3.7534, 2.2539, 0.1849],
}

# PLVC (benchmark_results/plvc_metrics_uvg.csv)
PLVC_UVG = {
    "bpp": [0.0229, 0.0497, 0.0745],
    "psnr": [35.12, 37.91, 39.98],
    "ms_ssim": [0.9774, 0.9861, 0.9895],
    "lpips": [0.0212, 0.0128, 0.0072],
    "fid": [0.0837, 0.0591, 0.0331],
}


def _to_curves(table):
    bpp = table["bpp"]
    return {m: list(zip(bpp, v)) for m, v in table.items() if m != "bpp"}


def uvg_rd_curves(gop: int = 8):
    """{codec: {metric: [(bpp, q), ...]}} for the UVG comparison at a GOP."""
    anchors = {
        "H.264": _to_curves(H264_UVG),
        "HEVC": _to_curves(HEVC_UVG_GOP8 if gop == 8 else HEVC_UVG_GOP4),
        "PLVC": _to_curves(PLVC_UVG),
    }
    ours = _to_curves(OURS_UVG[gop])
    return anchors, ours
