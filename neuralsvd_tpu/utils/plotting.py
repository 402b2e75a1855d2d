"""Plotting artifacts: spectrum curves, orthogonality heatmaps,
eigenfunction images, density-ratio histograms.

Reference: methods/spectrum.py:172-231, examples/operator/pde/plot.py,
examples/cdk/utils.py.  Headless matplotlib (Agg); terminal spectrum plots
are plain-text (no termplotlib dependency).
"""
from __future__ import annotations

import os
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from mpl_toolkits.axes_grid1 import make_axes_locatable  # noqa: E402


def term_plot_spectrum(spectrum: dict, width: int = 72, height: int = 14):
    """ASCII spectrum plot for terminal logs."""
    lines = []
    for key, vals in spectrum.items():
        if vals is None:
            continue
        vals = np.asarray(vals, dtype=float)
        finite = vals[np.isfinite(vals)]
        if finite.size == 0:
            lines.append(f"{key}: all {len(vals)} values non-finite")
            continue
        lo, hi = float(finite.min()), float(finite.max())
        span = (hi - lo) or 1.0
        cols = np.linspace(0, len(vals) - 1, min(width, len(vals))).astype(int)
        # non-finite entries (under-trained / collapsed modes) clip to the
        # plot edges instead of crashing the training log
        rows = np.clip(
            np.nan_to_num((vals[cols] - lo) / span * (height - 1),
                          nan=0.0, posinf=height - 1, neginf=0.0),
            0, height - 1).round().astype(int)
        grid = [[" "] * len(cols) for _ in range(height)]
        for c, r in enumerate(rows):
            grid[height - 1 - r][c] = "*"
        lines.append(f"{key} (sum={vals.sum():.2f}) range=[{lo:.3g},{hi:.3g}]")
        lines.extend("".join(row) for row in grid)
    return "\n".join(lines)


def _plot_orth(ax, data, cmap="gray", linewidth=0.005):
    mesh = ax.pcolormesh(data[::-1, :], edgecolors="black",
                         linewidth=linewidth, cmap=cmap, vmin=0, vmax=1)
    ax.set_aspect("equal")
    ax.set_xticks([])
    ax.set_yticks([])
    return mesh


def plot_and_save_spectrum(spectrum: dict, orthogonality,
                           orthogonality_p=None, log_dir: Optional[str] = None,
                           tag: str = "", termplot: bool = True,
                           ground_truth_spectrum=None, ylim=None):
    if termplot:
        print(term_plot_spectrum(spectrum))
    ncols = 2 if orthogonality_p is None else 3
    fig, axes = plt.subplots(1, ncols, figsize=(5 * ncols, 4))
    for key, vals in spectrum.items():
        if vals is not None:
            axes[0].plot(vals, marker="o", label=f"{key}(sum={np.sum(vals):.2f})")
    if ground_truth_spectrum is not None:
        axes[0].plot(ground_truth_spectrum, marker="x", label="ground truth")
        axes[0].set_ylim([0, np.max(ground_truth_spectrum)])
    elif ylim is not None:
        axes[0].set_ylim(ylim)
    axes[0].legend()
    axes[0].set_title("Spectrum")
    axes[0].grid(True)
    mesh = _plot_orth(axes[1], np.abs(orthogonality))
    axes[1].set_title("Orthogonality (f)")
    if ncols == 3:
        mesh = _plot_orth(axes[2], np.abs(orthogonality_p))
        axes[2].set_title("Orthogonality (g)")
    divider = make_axes_locatable(axes[-1])
    cax = divider.append_axes("right", size="5%", pad=0.05)
    fig.colorbar(mesh, cax=cax, orientation="vertical")
    fig.suptitle(tag)
    fig.tight_layout()
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fig.savefig(os.path.join(log_dir, f"spectrum_{tag}.png"))
    plt.close(fig)


def plot_1d_eigfuncs(x, eigfuncs, log_dir: str, tag: str = "",
                     max_modes: int = 16):
    L = min(eigfuncs.shape[1], max_modes)
    order = np.argsort(x.ravel())
    fig, ax = plt.subplots(figsize=(8, 5))
    for l in range(L):
        ax.plot(x.ravel()[order], eigfuncs[order, l], label=f"mode {l}")
    ax.legend(ncol=4, fontsize=7)
    fig.tight_layout()
    os.makedirs(log_dir, exist_ok=True)
    fig.savefig(os.path.join(log_dir, f"eigfuncs_{tag}.png"))
    plt.close(fig)


def plot_2d_eigfuncs(eigfuncs, log_dir: str, tag: str = "",
                     max_modes: int = 36, titles=None, symmetric=False,
                     suptitle: str = ""):
    """Grid of 2D eigenfunction heatmaps (reference figure: figs/hydrogen_all.png,
    README.md:45).

    Eigenfunctions are signed fields: with ``symmetric=True`` each panel's
    color scale is centered on zero (diverging RdBu, neutral midpoint), so
    sign structure reads correctly across panels.  ``titles`` puts a short
    per-panel label (e.g. learned vs analytic eigenvalue) in plain text ink.
    """
    n = eigfuncs.shape[0]
    side = int(round(np.sqrt(n)))
    L = min(eigfuncs.shape[1], max_modes)
    ncols = int(np.ceil(np.sqrt(L)))
    nrows = int(np.ceil(L / ncols))
    fig, axes = plt.subplots(nrows, ncols, figsize=(2 * ncols, 2 * nrows))
    axes = np.atleast_1d(axes).ravel()
    for l in range(L):
        img = eigfuncs[: side * side, l].reshape(side, side)
        vmax = float(np.abs(img).max()) or 1.0
        kw = {"vmin": -vmax, "vmax": vmax} if symmetric else {}
        axes[l].imshow(img, cmap="RdBu", **kw)
        axes[l].set_xticks([])
        axes[l].set_yticks([])
        if titles is not None:
            axes[l].set_title(str(titles[l]), fontsize=7, color="0.2")
    for ax in axes[L:]:
        ax.axis("off")
    if suptitle:
        fig.suptitle(suptitle, fontsize=10, color="0.2")
    fig.tight_layout()
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"eigfuncs2d_{tag}.png")
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def plot_hist_ratios(rs_joint, rs_indep, log_dir: str, tag: str = "",
                     bins: int = 100):
    """Density-ratio histograms: joint (diagonal) vs product-of-marginals
    (off-diagonal) gram entries (reference: examples/cdk/utils.py:8-53)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(np.asarray(rs_indep).ravel(), bins=bins, alpha=0.5, density=True,
            label="indep (off-diag)")
    ax.hist(np.asarray(rs_joint).ravel(), bins=bins, alpha=0.5, density=True,
            label="joint (diag)")
    ax.legend()
    ax.set_xlabel("f(x)ᵀg(y)")
    fig.tight_layout()
    os.makedirs(log_dir, exist_ok=True)
    fig.savefig(os.path.join(log_dir, f"ratios_{tag}.png"))
    plt.close(fig)


class Plotter:
    """Accumulate named scalar series and render them to one PNG grid
    (reference: tools/plotter.py — matplotlib accumulation plotter)."""

    def __init__(self):
        self.series = {}

    def update(self, step: int, **scalars):
        for name, value in scalars.items():
            self.series.setdefault(name, ([], []))
            xs, ys = self.series[name]
            xs.append(step)
            ys.append(float(value))

    def save(self, path: str):
        import math
        import os

        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = max(len(self.series), 1)
        cols = min(3, n)
        rows = math.ceil(n / cols)
        fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 3 * rows),
                                 squeeze=False)
        for ax, (name, (xs, ys)) in zip(axes.ravel(), self.series.items()):
            ax.plot(xs, ys)
            ax.set_title(name)
            ax.grid(alpha=0.3)
        for ax in axes.ravel()[len(self.series):]:
            ax.axis("off")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.tight_layout()
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
