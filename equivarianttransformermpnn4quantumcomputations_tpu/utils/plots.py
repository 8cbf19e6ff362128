"""Dataset statistics plots (counterpart of reference
datasets/QM9/DatasetStastics/plotstatistics.py).

Two tiers:
* quick panels from the stats JSON / losses.csv (``plot_qm9_stats``,
  ``plot_loss_curves``);
* the full per-property suite on the raw [n, 12] target array
  (``plot_qm9_full_stats`` — means±std, median+IQR, boxplots, per-property
  histogram / log-y histogram / CDF, violin-like, correlation heatmap,
  top-k correlated pair scatters, extended-stats JSON), matching the
  reference's output set (plotstatistics.py:107-339) including its
  extended_stats fields (:72-105).  CLI:
  ``python -m ...utils.plots <stats.npz|qm9.npz> --out_dir d --prefix p``.

matplotlib is gated; everything degrades to no-ops without it.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = [
    "plot_qm9_stats",
    "plot_loss_curves",
    "plot_qm9_full_stats",
    "extended_stats",
    "QM9_PROPERTY_NAMES",
]

# paper-order display names (reference plotstatistics.py:19-20)
QM9_PROPERTY_NAMES = [
    "alpha", "gap", "homo", "lumo", "mu", "Cv",
    "G", "H", "r2", "U", "U0", "zpve",
]


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


# ── full statistics suite (reference plotstatistics.py parity) ─────────────


def _mpl():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def extended_stats(col: np.ndarray) -> dict:
    """Extra stats for one 1-D column, NaNs ignored (reference
    plotstatistics.py:72-105 — same fields, Fisher kurtosis)."""
    col = np.asarray(col, np.float64)
    nan_count = int(np.isnan(col).sum())
    col = col[~np.isnan(col)]
    n = col.size
    if n == 0:
        return {}
    mean = float(col.mean())
    std = float(col.std(ddof=1)) if n > 1 else 0.0
    if std == 0 or n < 3:
        skew, kurt = 0.0, -3.0
    else:
        z = (col - mean) / std
        skew = float(np.mean(z**3))
        kurt = float(np.mean(z**4)) - 3.0
    return {
        "count": int(n),
        "mean": mean,
        "std": std,
        "min": float(col.min()),
        "max": float(col.max()),
        "median": float(np.median(col)),
        "p25": float(np.percentile(col, 25.0)),
        "p75": float(np.percentile(col, 75.0)),
        "skewness": skew,
        "kurtosis": kurt,
        "zeros": int((col == 0).sum()),
        "nan_count": nan_count,
    }


def plot_qm9_full_stats(
    data: np.ndarray,
    out_dir: str,
    names: list | None = None,
    prefix: str = "qm9",
    topk_pairs: int = 6,
    bins: int = 100,
    sample_limit: int = 100_000,
    seed: int = 0,
):
    """Render the reference's full QM9 statistics suite from a raw
    [n_samples, 12] target array (paper units).

    Outputs into ``out_dir/<prefix>_plots/`` (reference layout):
    means±std errorbar, median+IQR, boxplots, per-property histogram +
    log-y histogram + CDF, violin-like jitter+IQR panel, Pearson
    correlation heatmap, top-k |corr| pair scatters, and
    ``<prefix>_extended_stats.json``.  Returns the plot directory (or None
    without matplotlib).
    """
    plt = _mpl()
    if plt is None:
        return None
    rng = np.random.default_rng(seed)
    data = np.asarray(data, np.float64)
    names = list(names) if names is not None else list(QM9_PROPERTY_NAMES)
    valid = ~np.isnan(data).all(axis=1)
    good = data[valid]
    outdir = os.path.join(out_dir, f"{prefix}_plots")
    os.makedirs(outdir, exist_ok=True)

    means = np.nanmean(good, axis=0)
    stds = np.nanstd(good, axis=0, ddof=1)
    medians = np.nanmedian(good, axis=0)
    p25 = np.nanpercentile(good, 25, axis=0)
    p75 = np.nanpercentile(good, 75, axis=0)
    x = np.arange(len(names))

    # 1) mean ± std errorbar
    plt.figure(figsize=(12, 5))
    plt.errorbar(x, means, yerr=stds, fmt="o", capsize=5, markersize=6)
    plt.xticks(x, names, rotation=45, ha="right")
    plt.title("QM9 target means ± std (paper units)")
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, f"{prefix}_means_std.png"), dpi=200)
    plt.close()

    # 2) median + IQR bars
    plt.figure(figsize=(12, 6))
    for i in range(len(names)):
        plt.plot([i, i], [p25[i], p75[i]], linewidth=6)
        plt.plot(i, medians[i], marker="o", markersize=6, markeredgecolor="k")
    plt.xticks(x, names, rotation=45, ha="right")
    plt.title("QM9 target median and IQR (p25-p75)")
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, f"{prefix}_median_iqr.png"), dpi=200)
    plt.close()

    # 3) boxplots
    cols_clean = [
        good[:, j][~np.isnan(good[:, j])] for j in range(good.shape[1])
    ]
    plt.figure(figsize=(12, 6))
    plt.boxplot(cols_clean, tick_labels=names, showfliers=True)
    plt.xticks(rotation=45, ha="right")
    plt.title("QM9 property boxplots")
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, f"{prefix}_boxplots.png"), dpi=200)
    plt.close()

    # 4) per-property histogram + log-y histogram + CDF
    for j, name in enumerate(names):
        col = cols_clean[j]
        if col.size == 0:
            continue
        col_s = (
            rng.choice(col, sample_limit, replace=False)
            if col.size > sample_limit
            else col
        )
        plt.figure(figsize=(8, 4))
        plt.hist(col_s, bins=bins)
        plt.title(f"Histogram: {name}")
        plt.xlabel("value")
        plt.ylabel("count")
        plt.tight_layout()
        plt.savefig(os.path.join(outdir, f"hist_{j}_{name}.png"), dpi=200)
        plt.close()

        counts, edges = np.histogram(col_s, bins=bins)
        plt.figure(figsize=(8, 4))
        plt.bar((edges[:-1] + edges[1:]) / 2, counts, width=edges[1] - edges[0])
        plt.yscale("log")
        plt.title(f"Histogram (log-y): {name}")
        plt.xlabel("value")
        plt.ylabel("count (log scale)")
        plt.tight_layout()
        plt.savefig(os.path.join(outdir, f"hist_logy_{j}_{name}.png"), dpi=200)
        plt.close()

        sorted_col = np.sort(col_s)
        cdf = np.arange(1, sorted_col.size + 1) / float(sorted_col.size)
        plt.figure(figsize=(8, 4))
        plt.plot(sorted_col, cdf)
        plt.title(f"CDF: {name}")
        plt.xlabel("value")
        plt.ylabel("cumulative prob")
        plt.tight_layout()
        plt.savefig(os.path.join(outdir, f"cdf_{j}_{name}.png"), dpi=200)
        plt.close()

    # 5) violin-like: jittered sample + IQR box + median
    plt.figure(figsize=(12, 6))
    ax = plt.gca()
    for j in range(len(names)):
        col = cols_clean[j]
        if col.size == 0:
            continue
        col_s = (
            rng.choice(col, 2000, replace=False) if col.size > 2000 else col
        )
        ax.scatter(
            rng.normal(loc=j, scale=0.06, size=col_s.size), col_s,
            alpha=0.3, s=6,
        )
        med, q1, q3 = np.median(col), np.percentile(col, 25), np.percentile(col, 75)
        ax.plot([j - 0.15, j + 0.15], [med, med], color="k", linewidth=3)
        ax.add_patch(plt.Rectangle((j - 0.15, q1), 0.3, q3 - q1, alpha=0.2))
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=45, ha="right")
    ax.set_title("Violin-like (sampled points + IQR + median)")
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, f"{prefix}_violin_like.png"), dpi=200)
    plt.close()

    # 6) correlation heatmap (NaNs imputed with column means, as reference)
    col_ok = ~np.isnan(good).all(axis=0)
    sub = good[:, col_ok].copy()
    col_means = np.nanmean(sub, axis=0)
    inds = np.where(np.isnan(sub))
    sub[inds] = np.take(col_means, inds[1])
    corr = np.corrcoef(sub, rowvar=False)
    tick_names = [names[i] for i, ok in enumerate(col_ok) if ok]
    plt.figure(figsize=(8, 6))
    im = plt.imshow(corr, vmin=-1, vmax=1, cmap="coolwarm")
    plt.colorbar(im, fraction=0.046, pad=0.04)
    plt.xticks(range(len(tick_names)), tick_names, rotation=45, ha="right")
    plt.yticks(range(len(tick_names)), tick_names)
    plt.title("Correlation matrix (Pearson)")
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, f"{prefix}_corr_heatmap.png"), dpi=200)
    plt.close()

    # 7) top-k |corr| pair scatters
    pairs = sorted(
        (
            (abs(corr[i, j]), i, j)
            for i in range(corr.shape[0])
            for j in range(i + 1, corr.shape[0])
        ),
        reverse=True,
    )
    col_indices = np.nonzero(col_ok)[0]
    for rank, (score, i, j) in enumerate(pairs[: max(topk_pairs, 0)]):
        a_idx, b_idx = int(col_indices[i]), int(col_indices[j])
        a, b = good[:, a_idx], good[:, b_idx]
        m = ~np.isnan(a) & ~np.isnan(b)
        a, b = a[m], b[m]
        if a.size == 0:
            continue
        if a.size > 20_000:
            sel = rng.choice(a.size, 20_000, replace=False)
            a, b = a[sel], b[sel]
        plt.figure(figsize=(5, 5))
        plt.scatter(a, b, s=6, alpha=0.3)
        plt.xlabel(names[a_idx])
        plt.ylabel(names[b_idx])
        plt.title(
            f"Pair scatter: {names[a_idx]} vs {names[b_idx]} "
            f"(|corr|={score:.3f})"
        )
        plt.tight_layout()
        plt.savefig(
            os.path.join(
                outdir,
                f"{prefix}_pair_{rank}_{names[a_idx]}_vs_{names[b_idx]}.png",
            ),
            dpi=200,
        )
        plt.close()

    # 8) extended stats JSON
    stats = {name: extended_stats(good[:, j]) for j, name in enumerate(names)}
    with open(os.path.join(outdir, f"{prefix}_extended_stats.json"), "w") as f:
        json.dump({"property_names": names, "extended_stats": stats}, f,
                  indent=2)
    return outdir


def _load_target_array(path: str) -> np.ndarray:
    """[n, 12] paper-unit targets from either a reference-format stats npz
    (``data`` key) or this repo's QM9 npz (``targets_raw`` in raw-key
    order — converted via data/qm9.py:paper_targets)."""
    npz = np.load(path, allow_pickle=True)
    if "data" in npz:
        return np.asarray(npz["data"], np.float64)
    if "targets_raw" in npz:
        from ..data.qm9 import RAW_KEY_ORDER, paper_targets

        return np.stack(
            [
                paper_targets(dict(zip(RAW_KEY_ORDER, row)))
                for row in np.asarray(npz["targets_raw"], np.float64)
            ]
        )
    return np.asarray(npz[npz.files[0]], np.float64)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="QM9 dataset-statistics plot suite "
        "(reference plotstatistics.py CLI)"
    )
    p.add_argument("stats_path", help=".npz with 'data' [n,12] or a repo "
                   "qm9 npz with 'targets_raw'")
    p.add_argument("--out_dir", default="stats_plots")
    p.add_argument("--prefix", default="qm9")
    p.add_argument("--topk_pairs", type=int, default=6)
    args = p.parse_args(argv)
    data = _load_target_array(args.stats_path)
    out = plot_qm9_full_stats(
        data, args.out_dir, prefix=args.prefix, topk_pairs=args.topk_pairs
    )
    print("All plots saved to:", out)


if __name__ == "__main__":
    main()
