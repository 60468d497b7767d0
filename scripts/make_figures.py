"""Regenerate the reference's RD-figure + BD-table set from anchors_data.

Reproduces (from the published data tables alone — no model run needed):
  * UVG GOP-8 and GOP-4 7-codec RD curves per metric
    (`uvg_plots.py:183-243` figure set),
  * Class-B anchor RD curves (`class_b_plots.py:186-243`; the reference's
    "Ours"/H.264/HEVC Class-B quality sweeps read uncommitted files, see
    anchors_data.classb_rd_curves),
  * inter-frame-only GOP-4 UVG curves (`inter_plots.py` figure, from the
    committed results_gop4_inter.npy means),
  * BD-rate tables of Ours vs every anchor per metric
    (`BD_rate_eval.py:199-221` output).

Usage: python scripts/make_figures.py [outdir]   (default artifacts/)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffcodec_tpu.eval.anchors_data import (classb_rd_curves,
                                             uvg_inter_rd_curves,
                                             uvg_rd_curves)
from diffcodec_tpu.eval.plots import (bd_rate_table, format_bd_table,
                                      plot_rd_curves)

METRICS = ("psnr", "ms_ssim", "lpips", "fid", "fvd")


def figures_for(anchors, ours, tag, outdir):
    for metric in METRICS:
        curves = {name: m[metric] for name, m in anchors.items()
                  if metric in m}
        if ours and metric in ours:
            curves["Ours"] = ours[metric]
        if not curves:
            continue
        plot_rd_curves(curves, metric,
                       os.path.join(outdir, f"{tag}_{metric}.png"),
                       title=f"{tag.replace('_', ' ')} — {metric.upper()}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "artifacts"
    figdir = os.path.join(outdir, "figures")
    os.makedirs(figdir, exist_ok=True)

    sections = []
    for gop in (8, 4):
        anchors, ours = uvg_rd_curves(gop=gop)
        figures_for(anchors, ours, f"uvg_gop{gop}", figdir)
        table = bd_rate_table(anchors, ours)
        sections.append(f"## UVG GOP {gop}: BD-rate of Ours vs anchor "
                        f"(negative = Ours cheaper at equal quality)\n\n"
                        + format_bd_table(table))

    figures_for(classb_rd_curves(), None, "classb", figdir)

    inter_anchors, inter_ours = uvg_inter_rd_curves()
    figures_for(inter_anchors, inter_ours, "uvg_gop4_inter", figdir)
    inter_table = bd_rate_table(inter_anchors, inter_ours)
    sections.append("## UVG GOP 4, inter-frame-only bits\n\n"
                    + format_bd_table(inter_table))

    report = os.path.join(outdir, "bd_tables.md")
    with open(report, "w") as f:
        f.write("# BD-rate tables (regenerated from "
                "diffcodec_tpu.eval.anchors_data)\n\n"
                + "\n\n".join(sections) + "\n")
    n_figs = len(os.listdir(figdir))
    print(f"wrote {n_figs} figures to {figdir} and {report}")


if __name__ == "__main__":
    main()
