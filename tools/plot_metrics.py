"""Plot training curves from a metrics.jsonl stream.

The reference's only observability is stdout prints plus commented-out TF1
TensorBoard remnants (reference: train.py:1530-1531,1910-1950); here the
train CLI streams machine-readable metrics to logs/metrics.jsonl (train
rows: step/loss/psnr/component losses/it_per_sec; val rows: step/val_psnr
from the live i_img held-out renders) and this tool turns one or more such
streams into a PNG: loss on a log axis, train/val PSNR, and step rate.

Usage:
    python tools/plot_metrics.py experiments/exp/logs/metrics.jsonl \
        [more.jsonl ...] [-o curves.png]

With several files the same metric from each run is drawn in that run's
color (fixed assignment order, named by experiment folder).
"""

from __future__ import annotations

import argparse
import json
import os

# categorical slots (fixed assignment order) + chart chrome, light mode
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4"]
SURFACE, GRID, MUTED, INK, BASELINE = (
    "#fcfcfb", "#e1e0d9", "#898781", "#0b0b0b", "#c3c2b7")


def load_stream(path):
    train, val = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            (val if "val_psnr" in row else train).append(row)
    return train, val


def run_name(path):
    # experiments/<name>/logs/metrics.jsonl -> <name>
    parts = os.path.normpath(os.path.abspath(path)).split(os.sep)
    for i, p in enumerate(parts):
        if p == "logs" and i > 0:
            return parts[i - 1]
    return os.path.basename(os.path.dirname(path)) or path


def style_axis(ax, title, ylabel):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, color=INK, fontsize=11, loc="left")
    ax.set_ylabel(ylabel, color=MUTED, fontsize=9)
    ax.grid(True, color=GRID, linewidth=0.8)
    ax.tick_params(colors=MUTED, labelsize=8)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(BASELINE)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("metrics", nargs="+", help="metrics.jsonl path(s)")
    ap.add_argument("-o", "--out", default=None,
                    help="output PNG (default: curves.png next to the "
                         "first input)")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = []
    for path in args.metrics:
        train, val = load_stream(path)
        if not train and not val:
            raise SystemExit(f"{path}: no rows")
        runs.append((run_name(path), train, val))

    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6), dpi=140)
    fig.patch.set_facecolor(SURFACE)
    ax_loss, ax_psnr, ax_speed = axes
    style_axis(ax_loss, "Total loss", "loss")
    ax_loss.set_yscale("log")
    style_axis(ax_psnr, "PSNR (solid: train batch, dashed: val view)", "dB")
    style_axis(ax_speed, "Throughput", "steps/s")
    for ax in axes:
        ax.set_xlabel("step", color=MUTED, fontsize=9)

    for i, (name, train, val) in enumerate(runs):
        color = SERIES[i % len(SERIES)]
        if train:
            steps = [r["step"] for r in train]
            ax_loss.plot(steps, [r["loss"] for r in train],
                         color=color, linewidth=2, label=name)
            ax_psnr.plot(steps, [r["psnr"] for r in train],
                         color=color, linewidth=2, label=name)
            ax_speed.plot(steps, [r["it_per_sec"] for r in train],
                          color=color, linewidth=2, label=name)
        if val:
            ax_psnr.plot([r["step"] for r in val],
                         [r["val_psnr"] for r in val],
                         color=color, linewidth=1.2, linestyle="--")
    if len(runs) > 1:
        for ax in axes:
            leg = ax.legend(fontsize=8, frameon=False)
            for t in leg.get_texts():
                t.set_color(INK)

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.metrics[0])), "curves.png")
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    print("wrote", out)


if __name__ == "__main__":
    main()
