"""Matplotlib artifact writers reproducing the reference's plot contracts.

Every reference analysis script ends in PNGs (≥30 distinct plots, SURVEY.md
§5). These helpers cover the recurring shapes: intervention grids, sweep
strips, heatmaps, ranked bars, reconstruction triptychs, uncertainty maps,
scatter diagnostics. All host-side (matplotlib Agg); device arrays are pulled
once with np.asarray.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _save(fig, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def _img(a) -> np.ndarray:
    a = np.asarray(a)
    return a[..., 0] if a.ndim == 3 else a


def intervention_grid(
    originals, grid, path: str, *, row_labels=None, col_labels=None,
    title: str = "do(T) intervention grid",
):
    """Originals column + (sources x targets) decode grid
    (I1, ref mnist_test/01 visualize.py:53-99)."""
    grid = np.asarray(grid)
    s, t = grid.shape[:2]
    fig, axes = plt.subplots(s, t + 1, figsize=(1.2 * (t + 1), 1.2 * s))
    axes = np.atleast_2d(axes)
    for i in range(s):
        axes[i, 0].imshow(_img(originals[i]), cmap="gray")
        axes[i, 0].set_ylabel(row_labels[i] if row_labels else f"src {i}", fontsize=7)
        for j in range(t):
            axes[i, j + 1].imshow(_img(grid[i, j]), cmap="gray")
            if i == 0:
                axes[i, j + 1].set_title(col_labels[j] if col_labels else str(j), fontsize=7)
    for ax in axes.ravel():
        ax.set_xticks([]), ax.set_yticks([])
    fig.suptitle(title)
    _save(fig, path)


def sweep_strip(images, values, path: str, *, feature_name: str = ""):
    """One row per swept feature value (I2 do(M) sweeps,
    ref check_mnist_counterfactual.py / generate_counterfactual.py)."""
    images = np.asarray(images)
    n = images.shape[0]
    fig, axes = plt.subplots(1, n, figsize=(1.4 * n, 1.6))
    for j in range(n):
        ax = axes[j] if n > 1 else axes
        ax.imshow(_img(images[j]), cmap="gray")
        ax.set_title(f"{values[j]:+.1f}", fontsize=7)
        ax.set_xticks([]), ax.set_yticks([])
    fig.suptitle(f"do(M_{feature_name})")
    _save(fig, path)


def heatmap(
    matrix, path: str, *, row_names=None, col_names=None, title: str = "",
    cmap: str = "viridis", annotate: bool = False, fmt: str = "{:.2f}",
):
    """Generic annotated heatmap (uncertainty σ(T), SNR matrices, CV maps)."""
    m = np.asarray(matrix)
    fig, ax = plt.subplots(figsize=(max(4, 0.45 * m.shape[1]), max(3, 0.35 * m.shape[0])))
    im = ax.imshow(m, cmap=cmap, aspect="auto")
    fig.colorbar(im, ax=ax, shrink=0.8)
    if col_names is not None:
        ax.set_xticks(range(m.shape[1]), col_names, rotation=90, fontsize=6)
    if row_names is not None:
        ax.set_yticks(range(m.shape[0]), row_names, fontsize=6)
    if annotate and m.size <= 400:
        for i in range(m.shape[0]):
            for j in range(m.shape[1]):
                ax.text(j, i, fmt.format(m[i, j]), ha="center", va="center", fontsize=5)
    ax.set_title(title)
    _save(fig, path)


def ranked_bar(scores: Dict[str, float], path: str, *, title: str = "",
               ylabel: str = ""):
    """Importance/sensitivity bar chart, descending (A4/A5/A18)."""
    names = list(scores.keys())
    vals = [scores[n] for n in names]
    fig, ax = plt.subplots(figsize=(max(4, 0.5 * len(names)), 3))
    ax.bar(range(len(names)), vals, color="#348ABD")
    ax.set_xticks(range(len(names)), names, rotation=60, ha="right", fontsize=7)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    _save(fig, path)


def phase_comparison_bars(comparison: Dict, path: str):
    """Side-by-side normalized phase-1/phase-2 bars (A6)."""
    names = comparison["features"]
    v1 = [comparison["phase1_norm"][n] for n in names]
    v2 = [comparison["phase2_norm"][n] for n in names]
    x = np.arange(len(names))
    fig, ax = plt.subplots(figsize=(max(5, 0.6 * len(names)), 3))
    ax.bar(x - 0.2, v1, width=0.4, label="Phase 1 (mechanism)")
    ax.bar(x + 0.2, v2, width=0.4, label="Phase 2 (measured)")
    ax.set_xticks(x, names, rotation=60, ha="right", fontsize=7)
    ax.legend()
    ax.set_title(f"Importance comparison (rank corr {comparison['rank_correlation']:.2f})")
    _save(fig, path)


def recon_triptych(x, recon, path: str, *, uncertainty=None, n: int = 4):
    """original | reconstruction | (optional per-pixel std) rows
    (T3 sample-recon PNGs, I4 ensemble uncertainty maps)."""
    n = min(n, len(np.asarray(x)))
    cols = 3 if uncertainty is not None else 2
    fig, axes = plt.subplots(n, cols, figsize=(3 * cols, 2.2 * n))
    axes = np.atleast_2d(axes)
    for i in range(n):
        axes[i, 0].imshow(_img(np.asarray(x)[i]), cmap="gray")
        axes[i, 1].imshow(_img(np.asarray(recon)[i]), cmap="gray")
        if uncertainty is not None:
            im = axes[i, 2].imshow(_img(np.asarray(uncertainty)[i]), cmap="hot")
            fig.colorbar(im, ax=axes[i, 2], shrink=0.7)
    for ax in axes.ravel():
        ax.set_xticks([]), ax.set_yticks([])
    for j, name in enumerate(["original", "reconstruction", "ensemble std"][:cols]):
        axes[0, j].set_title(name)
    _save(fig, path)


def scatter_diag(x_vals, y_vals, path: str, *, xlabel: str, ylabel: str,
                 title: str = "", hline: Optional[float] = None,
                 labels=None):
    """Reliability-style scatter (A16: R² vs σ with threshold line)."""
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.scatter(x_vals, y_vals, s=14, alpha=0.7)
    if labels is not None:
        for xv, yv, lb in zip(x_vals, y_vals, labels):
            ax.annotate(str(lb), (xv, yv), fontsize=5)
    if hline is not None:
        ax.axvline(hline, color="red", ls="--", lw=1, label=f"threshold {hline}")
        ax.legend()
    ax.set_xlabel(xlabel), ax.set_ylabel(ylabel)
    ax.set_title(title)
    _save(fig, path)


def embedding_scatter(emb, labels, path: str, *, title: str = "t-SNE",
                      highlight_idx=None):
    """2-D embedding colored by class; optional outlier highlights (A19)."""
    emb = np.asarray(emb)
    fig, ax = plt.subplots(figsize=(5, 5))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=np.asarray(labels), cmap="tab10", s=8)
    fig.colorbar(sc, ax=ax, shrink=0.8)
    if highlight_idx is not None:
        ax.scatter(emb[highlight_idx, 0], emb[highlight_idx, 1],
                   facecolors="none", edgecolors="red", s=60, label="outliers")
        ax.legend()
    ax.set_title(title)
    _save(fig, path)


def mip_quality_grid(images, group_labels, path: str, *, per_group: int = 4,
                     percentile: float = 99.0):
    """MIP visual QC grid per treatment group with percentile contrast
    (D7, ref scripts/visualize_mip.py:43-62)."""
    images = np.asarray(images)
    groups = np.unique(group_labels)
    fig, axes = plt.subplots(len(groups), per_group,
                             figsize=(2.2 * per_group, 1.8 * len(groups)),
                             squeeze=False)
    axes = np.asarray(axes).reshape(len(groups), per_group)
    for gi, g in enumerate(groups):
        sel = np.nonzero(np.asarray(group_labels) == g)[0][:per_group]
        for k in range(per_group):
            ax = axes[gi, k]
            if k < len(sel):
                img = _img(images[sel[k]])
                vmax = np.percentile(img, percentile)
                ax.imshow(img, cmap="gray", vmax=max(vmax, 1e-6))
            ax.set_xticks([]), ax.set_yticks([])
        axes[gi, 0].set_ylabel(str(g), fontsize=7)
    _save(fig, path)


def predictions_broken_axis(
    mu_by_group: Dict[str, np.ndarray], path: str, *,
    feature_name: str = "", break_quantile: float = 0.9,
):
    """Per-treatment prediction scatter with a broken y-axis isolating
    outlier groups (A14, ref vessel_analysis/05_analyze_uncertainty/
    plot_predictions_by_treatment.py:17-388 'broken-axis scatter')."""
    names = list(mu_by_group)
    vals = [np.asarray(mu_by_group[n]).ravel() for n in names]
    allv = np.concatenate(vals)
    cut = np.quantile(allv, break_quantile)
    hi_max = allv.max()
    broken = hi_max > cut * 1.5 and np.isfinite(cut)
    nrows = 2 if broken else 1
    fig, axes = plt.subplots(nrows, 1, sharex=True,
                             figsize=(max(6, 0.5 * len(names)), 5),
                             gridspec_kw={"height_ratios": [1, 3]} if broken else None)
    axes = np.atleast_1d(axes)
    for ax in axes:
        for i, v in enumerate(vals):
            ax.scatter(np.full(len(v), i), v, s=8, alpha=0.6)
            ax.errorbar([i], [v.mean()], yerr=[v.std()], fmt="_", color="k",
                        capsize=3)
    if broken:
        axes[0].set_ylim(cut, hi_max * 1.05)
        axes[1].set_ylim(allv.min(), cut)
        axes[0].spines["bottom"].set_visible(False)
        axes[1].spines["top"].set_visible(False)
        axes[0].tick_params(bottom=False)
    axes[-1].set_xticks(range(len(names)))
    axes[-1].set_xticklabels(names, rotation=90, fontsize=6)
    axes[0].set_title(f"Predictions by treatment {feature_name}".strip())
    _save(fig, path)


def per_feature_prediction_grid(
    mu_by_group: Dict[str, np.ndarray], feature_names: Sequence[str], path: str,
):
    """Grid of per-feature mean±std bars across treatments (A14, ref
    plot_predictions_by_treatment.py per-feature grid)."""
    names = list(mu_by_group)
    n_feat = len(feature_names)
    ncols = min(4, n_feat)
    nrows = (n_feat + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(3.2 * ncols, 2.2 * nrows), squeeze=False)
    for f, fname in enumerate(feature_names):
        ax = axes[f // ncols][f % ncols]
        means = [np.asarray(mu_by_group[n])[:, f].mean() for n in names]
        stds = [np.asarray(mu_by_group[n])[:, f].std() for n in names]
        ax.bar(range(len(names)), means, yerr=stds, capsize=2)
        ax.set_title(fname, fontsize=7)
        ax.set_xticks([])
    for f in range(n_feat, nrows * ncols):
        axes[f // ncols][f % ncols].axis("off")
    _save(fig, path)


def overlap_distributions(
    real_by_group: Dict[str, np.ndarray], pred_by_group: Dict[str, np.ndarray],
    path: str, *, feature_name: str = "",
):
    """Real-vs-predicted distribution overlap box+strip plot per treatment in
    real units (A16, ref plot_overlap_distributions.py:71-264)."""
    names = list(real_by_group)
    fig, ax = plt.subplots(figsize=(max(6, 0.6 * len(names)), 4))
    pos = np.arange(len(names), dtype=float)
    width = 0.35
    for i, n in enumerate(names):
        r = np.asarray(real_by_group[n]).ravel()
        p = np.asarray(pred_by_group[n]).ravel()
        ax.boxplot([r], positions=[pos[i] - width / 2], widths=width,
                   patch_artist=True,
                   boxprops={"facecolor": "#9ecae1"}, medianprops={"color": "k"})
        ax.boxplot([p], positions=[pos[i] + width / 2], widths=width,
                   patch_artist=True,
                   boxprops={"facecolor": "#fdae6b"}, medianprops={"color": "k"})
        ax.scatter(np.full(len(r), pos[i] - width / 2), r, s=4, alpha=0.4,
                   color="#3182bd")
        ax.scatter(np.full(len(p), pos[i] + width / 2), p, s=4, alpha=0.4,
                   color="#e6550d")
    ax.set_xticks(pos)
    ax.set_xticklabels(names, rotation=90, fontsize=6)
    ax.set_title(f"Real (blue) vs predicted (orange) {feature_name}".strip())
    _save(fig, path)
