"""Publication figures (matplotlib): bar comparisons, line plots, heatmaps.

Mirrors the reference's visualization surface (reference
src/visualization.py:37-594: FigureStyle, bar_comparison,
beir_comparison_plot, heatmap, multi-format save) with a validated
fixed-order categorical palette (colorblind-safe adjacent pairs), one axis
per figure, thin marks, selective direct labels and recessive grids.

Static research outputs (PNG/PDF) — interaction rules don't apply.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# Validated categorical palette, fixed assignment order (never cycled;
# >8 series must fold into "Other" or facet).
CATEGORICAL = [
    "#2a78d6",  # blue
    "#eb6834",  # orange
    "#1baf7a",  # aqua
    "#eda100",  # yellow
    "#e87ba4",  # magenta
    "#008300",  # green
    "#4a3aa7",  # violet
    "#e34948",  # red
]
TEXT_PRIMARY = "#0b0b0b"
TEXT_SECONDARY = "#52514e"
SURFACE = "#fcfcfb"
GRID = "#e5e4e0"


class FigureStyle:
    """ACL/SIGIR-ish compact style (reference visualization.py:37-143)."""

    rc = {
        "figure.facecolor": SURFACE,
        "axes.facecolor": SURFACE,
        "axes.edgecolor": GRID,
        "axes.labelcolor": TEXT_PRIMARY,
        "axes.grid": True,
        "grid.color": GRID,
        "grid.linewidth": 0.6,
        "axes.axisbelow": True,
        "axes.spines.top": False,
        "axes.spines.right": False,
        "xtick.color": TEXT_SECONDARY,
        "ytick.color": TEXT_SECONDARY,
        "font.size": 9,
        "axes.titlesize": 10,
        "axes.labelsize": 9,
        "legend.frameon": False,
        "legend.fontsize": 8,
        "pdf.fonttype": 42,
        "ps.fonttype": 42,
    }

    def __enter__(self):
        self._ctx = plt.rc_context(self.rc)
        self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        self._ctx.__exit__(*exc)


def save_figure(fig, path, formats: Sequence[str] = ("png", "pdf"), dpi: int = 200):
    """Multi-format save (reference visualization.py save helper)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    written = []
    for fmt in formats:
        p = path.with_suffix(f".{fmt}")
        fig.savefig(p, dpi=dpi, bbox_inches="tight")
        written.append(p)
    plt.close(fig)
    return written


def bar_comparison(
    values: Dict[str, float],
    title: str = "",
    ylabel: str = "",
    baseline: Optional[str] = None,
    sort: bool = True,
    figsize=(5.0, 3.0),
):
    """One-series bar chart of method -> value with direct value labels.

    Single measure -> single hue; the optional baseline bar is marked with
    the secondary hue and a reference line rather than a second axis.
    """
    items = list(values.items())
    if sort:
        items.sort(key=lambda kv: -kv[1])
    names = [k for k, _ in items]
    vals = [v for _, v in items]
    with FigureStyle():
        fig, ax = plt.subplots(figsize=figsize)
        colors = [
            CATEGORICAL[1] if baseline is not None and n == baseline else CATEGORICAL[0]
            for n in names
        ]
        bars = ax.bar(range(len(names)), vals, color=colors, width=0.62, zorder=2)
        for rect, v in zip(bars, vals):
            ax.annotate(
                f"{v:.3f}", (rect.get_x() + rect.get_width() / 2, v),
                ha="center", va="bottom", fontsize=7.5, color=TEXT_PRIMARY,
            )
        if baseline is not None and baseline in values:
            ax.axhline(values[baseline], color=TEXT_SECONDARY, lw=0.8, ls="--", zorder=1)
        ax.set_xticks(range(len(names)))
        ax.set_xticklabels(names, rotation=30, ha="right")
        ax.set_ylabel(ylabel)
        ax.set_title(title)
        ax.grid(axis="x", visible=False)
    return fig


def line_plot(
    x: Sequence[float],
    series: Dict[str, Sequence[float]],
    title: str = "",
    xlabel: str = "",
    ylabel: str = "",
    figsize=(5.0, 3.0),
):
    """Multi-series line plot: 2px lines, fixed-order hues, end labels."""
    if len(series) > len(CATEGORICAL):
        raise ValueError(f"max {len(CATEGORICAL)} series; facet or fold into 'Other'")
    with FigureStyle():
        fig, ax = plt.subplots(figsize=figsize)
        for i, (name, ys) in enumerate(series.items()):
            ax.plot(x, ys, color=CATEGORICAL[i], lw=2.0, marker="o",
                    ms=4.0, label=name, zorder=2)
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        ax.set_title(title)
        if len(series) >= 2:
            ax.legend(loc="best")
        ax.grid(axis="x", visible=False)
    return fig


def heatmap(
    matrix: np.ndarray,
    row_labels: Sequence[str],
    col_labels: Sequence[str],
    title: str = "",
    fmt: str = "{:.2f}",
    figsize=None,
):
    """Sequential one-hue heatmap with in-cell values (light -> dark blue)."""
    matrix = np.asarray(matrix, dtype=float)
    figsize = figsize or (0.65 * len(col_labels) + 2.0, 0.45 * len(row_labels) + 1.4)
    with FigureStyle():
        fig, ax = plt.subplots(figsize=figsize)
        cmap = matplotlib.colors.LinearSegmentedColormap.from_list(
            "seq_blue", ["#cde2fb", "#0d366b"]
        )
        im = ax.imshow(matrix, cmap=cmap, aspect="auto")
        vmin, vmax = np.nanmin(matrix), np.nanmax(matrix)
        mid = (vmin + vmax) / 2 if vmax > vmin else vmax
        for i in range(matrix.shape[0]):
            for j in range(matrix.shape[1]):
                v = matrix[i, j]
                ax.text(j, i, fmt.format(v), ha="center", va="center", fontsize=7.5,
                        color="#ffffff" if v > mid else TEXT_PRIMARY)
        ax.set_xticks(range(len(col_labels)))
        ax.set_xticklabels(col_labels, rotation=30, ha="right")
        ax.set_yticks(range(len(row_labels)))
        ax.set_yticklabels(row_labels)
        ax.set_title(title)
        ax.grid(visible=False)
        fig.colorbar(im, ax=ax, shrink=0.8)
    return fig


def beir_comparison_plot(
    ours: Dict[str, float],
    published: Dict[str, float],
    dataset: str,
    metric: str = "nDCG@10",
    figsize=(5.5, 3.2),
):
    """Grouped bars: our retrievers vs published BEIR numbers
    (reference visualization.py beir_comparison_plot)."""
    names = sorted(set(ours) | set(published))
    x = np.arange(len(names))
    w = 0.36
    with FigureStyle():
        fig, ax = plt.subplots(figsize=figsize)
        ax.bar(x - w / 2 - 0.01, [ours.get(n, np.nan) for n in names],
               width=w, color=CATEGORICAL[0], label="this work", zorder=2)
        ax.bar(x + w / 2 + 0.01, [published.get(n, np.nan) for n in names],
               width=w, color=CATEGORICAL[1], label="BEIR published", zorder=2)
        ax.set_xticks(x)
        ax.set_xticklabels(names, rotation=30, ha="right")
        ax.set_ylabel(metric)
        ax.set_title(f"{dataset}: {metric} vs published BEIR")
        ax.legend()
        ax.grid(axis="x", visible=False)
    return fig


def table_figure(
    rows: Sequence[Sequence],
    col_labels: Sequence[str],
    row_labels: Optional[Sequence[str]] = None,
    title: str = "",
    figsize=None,
):
    """Render a table as a figure (reference visualization.py table render) —
    for result grids embedded in papers/slides where text tables don't fit."""
    n_rows = len(rows)
    figsize = figsize or (0.9 * len(col_labels) + 1.5, 0.35 * n_rows + 1.2)
    with FigureStyle():
        fig, ax = plt.subplots(figsize=figsize)
        ax.axis("off")
        table = ax.table(
            cellText=[[f"{v:.4f}" if isinstance(v, float) else str(v) for v in r]
                      for r in rows],
            colLabels=list(col_labels),
            rowLabels=list(row_labels) if row_labels else None,
            loc="center",
            cellLoc="center",
        )
        table.auto_set_font_size(False)
        table.set_fontsize(8)
        for (r, c), cell in table.get_celld().items():
            cell.set_edgecolor(GRID)
            if r == 0:
                cell.set_text_props(weight="bold", color=TEXT_PRIMARY)
        if title:
            ax.set_title(title, pad=10)
    return fig
