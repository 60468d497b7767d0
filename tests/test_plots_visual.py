"""Plot suite + visual study smoke tests (file outputs, not pixels)."""

import os

import numpy as np

from diffcodec_tpu.eval.plots import (bd_rate_table, format_bd_table,
                                      plot_rd_curves)
from diffcodec_tpu.eval.visual_study import comparison_figure, zoom_crop


def test_plot_rd_curves(tmp_path):
    curves = {
        "Ours": [(0.008, 24.75), (0.013, 25.26), (0.024, 24.75)],
        "HEVC": [(0.007, 24.69), (0.009, 24.93), (0.039, 25.31)],
    }
    out = str(tmp_path / "rd.pdf")
    plot_rd_curves(curves, "psnr", out)
    assert os.path.getsize(out) > 1000


def test_bd_rate_table_and_format():
    anchors = {"HEVC": {"psnr": [(0.007, 24.7), (0.009, 24.9),
                                 (0.039, 25.3)],
                        "lpips": [(0.007, 0.18), (0.009, 0.13),
                                  (0.039, 0.06)]}}
    ours = {"psnr": [(0.008, 24.8), (0.013, 25.3), (0.024, 24.8)],
            "lpips": [(0.008, 0.12), (0.013, 0.11), (0.024, 0.12)]}
    table = bd_rate_table(anchors, ours)
    assert "HEVC" in table and "psnr" in table["HEVC"]
    text = format_bd_table(table)
    assert "HEVC" in text and "%" in text


def test_comparison_figure(tmp_path):
    rng = np.random.default_rng(0)
    gt = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    methods = {"Ours": gt.copy(), "H264": (gt * 0.9).astype(np.uint8)}
    crop = (10, 20, 24, 24)
    assert zoom_crop(gt, crop).shape == (24, 24, 3)
    out = str(tmp_path / "cmp.png")
    comparison_figure(gt, methods, crop,
                      metrics={"Ours": {"psnr": 30.1, "lpips": 0.1},
                               "H264": {"psnr": 28.0, "lpips": 0.2}},
                      metric_higher_better={"psnr": True, "lpips": False},
                      out_path=out, title="ablation")
    assert os.path.getsize(out) > 1000


def test_anchor_rd_data_and_bd_table():
    from diffcodec_tpu.eval.anchors_data import uvg_rd_curves
    from diffcodec_tpu.eval.bd_rate import bd_rate

    anchors, ours = uvg_rd_curves(gop=8)
    assert set(anchors) == {"H.264", "HEVC", "DVC", "RLVC", "PLVC",
                            "DiffVC"}
    table = bd_rate_table(anchors, ours)
    # BD-rate vs HEVC on MS-SSIM computable (overlapping quality range)
    assert np.isfinite(table["HEVC"]["ms_ssim"])
    # spot-check the headline "Ours" GOP8 points made it through
    assert ours["psnr"][0] == (0.008151, 24.7537)
