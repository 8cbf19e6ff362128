"""Dataset statistics plots (counterpart of reference
datasets/QM9/DatasetStastics/plotstatistics.py).

Renders per-property histograms + summary panels from the stats JSON and the
training losses.csv.  matplotlib is gated; everything degrades to no-ops
without it.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["plot_qm9_stats", "plot_loss_curves"]


def plot_qm9_stats(stats_json: str, out_dir: str):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    with open(stats_json) as f:
        j = json.load(f)
    stats = j.get("stats", j)
    names = list(stats.keys())
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(3, 4, figsize=(16, 10))
    for ax, name in zip(axes.flat, names):
        s = stats[name]
        mean, std = s["mean"], s["std"]
        lo = s.get("p1", mean - 3 * std)
        hi = s.get("p99", mean + 3 * std)
        xs = np.linspace(lo, hi, 200)
        ax.plot(xs, np.exp(-0.5 * ((xs - mean) / max(std, 1e-9)) ** 2))
        ax.axvline(mean, ls="--", lw=0.8)
        ax.set_title(f"{name}\nmean={mean:.3g} std={std:.3g}", fontsize=8)
    fig.tight_layout()
    path = os.path.join(out_dir, "qm9_stats.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_loss_curves(losses_csv: str, out_path: str):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    import csv

    rows = list(csv.DictReader(open(losses_csv)))
    if not rows:
        return None
    keys = [k for k in rows[0] if k not in ("epoch",)]
    epochs = [float(r["epoch"]) for r in rows]
    fig, ax = plt.subplots(figsize=(8, 5))
    for k in keys:
        try:
            ys = [float(r[k]) for r in rows]
        except ValueError:
            continue
        if all(np.isfinite(ys)):
            ax.plot(epochs, ys, label=k)
    ax.set_xlabel("epoch")
    ax.legend(fontsize=8)
    ax.set_yscale("symlog")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
