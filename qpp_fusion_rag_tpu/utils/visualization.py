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


class ResearchFigure:
    """Context manager for publication-ready figures (reference
    src/visualization.py:145-190): applies the compact style, yields a
    matplotlib Figure, and on clean exit saves it to ``output_path`` in
    every requested format (reference saved pdf+png at dpi=300).

        with ResearchFigure(size="single", output_path="fig1.pdf") as fig:
            ax = fig.add_subplot(111)
            ax.plot(x, y)
    """

    SIZES = {
        "single": (3.25, 2.5),   # one column
        "double": (6.75, 2.5),   # full width
        "square": (3.25, 3.25),
    }

    def __init__(self, size: str = "single", figsize=None,
                 output_path=None, formats: Sequence[str] = ("pdf", "png"),
                 dpi: int = 300):
        self.figsize = figsize or self.SIZES.get(size, (3.25, 2.5))
        self.output_path = output_path
        self.formats = list(formats)
        self.dpi = dpi
        self.fig = None
        self._style = None

    def __enter__(self):
        self._style = FigureStyle()
        self._style.__enter__()
        self.fig = plt.figure(figsize=self.figsize)
        return self.fig

    def __exit__(self, exc_type, exc_val, exc_tb):
        try:
            if exc_type is None and self.output_path:
                self.save()
        finally:
            plt.close(self.fig)
            self._style.__exit__(exc_type, exc_val, exc_tb)

    def save(self):
        return save_figure(self.fig, self.output_path,
                           formats=self.formats, dpi=self.dpi)


def _as_table(data):
    """DataFrame | {row: {col: val}} | list[dict] -> (columns, rows)."""
    if hasattr(data, "columns") and hasattr(data, "itertuples"):
        cols = [str(c) for c in data.columns]
        rows = [list(t) for t in data.itertuples(index=False, name=None)]
        return cols, rows
    if isinstance(data, dict):  # {row_name: {col: val}}
        cols = ["Method"] + sorted({c for v in data.values() for c in v})
        rows = [[name] + [v.get(c, "") for c in cols[1:]]
                for name, v in data.items()]
        return cols, rows
    if isinstance(data, (list, tuple)) and data and isinstance(data[0], dict):
        cols = list(data[0].keys())
        return [str(c) for c in cols], [[r.get(c, "") for c in cols]
                                        for r in data]
    raise TypeError(f"unsupported table input {type(data)!r}")


def table_comparison(data, output_path=None, caption: str = "",
                     label: str = "", highlight_best: bool = True,
                     highlight_cols=None, precision: int = 4,
                     format_type: str = "latex") -> str:
    """Publication table, LaTeX (booktabs) or Markdown, with the best
    value per numeric column bolded (reference src/visualization.py
    :374-460). Accepts a pandas DataFrame, {row: {col: val}}, or a list
    of dicts."""
    cols, rows = _as_table(data)
    numeric = [j for j in range(len(cols))
               if all(isinstance(r[j], (int, float)) and
                      not isinstance(r[j], bool) for r in rows) and rows]
    hl = set(numeric if highlight_cols is None
             else [cols.index(c) for c in highlight_cols if c in cols])

    def fmt(v, j):
        if j in numeric:
            best = highlight_best and j in hl and v == max(r[j] for r in rows)
            s = f"{v:.{precision}f}"
            if best:
                return (f"\\textbf{{{s}}}" if format_type == "latex"
                        else f"**{s}**")
            return s
        return str(v)

    body = [[fmt(v, j) for j, v in enumerate(r)] for r in rows]
    if format_type == "latex":
        lines = ["\\begin{table}[t]", "\\centering",
                 f"\\caption{{{caption}}}"]
        if label:
            lines.append(f"\\label{{{label}}}")
        lines += [f"\\begin{{tabular}}{{l{'c' * (len(cols) - 1)}}}",
                  "\\toprule", " & ".join(cols) + " \\\\", "\\midrule"]
        lines += [" & ".join(r) + " \\\\" for r in body]
        lines += ["\\bottomrule", "\\end{tabular}", "\\end{table}"]
        out = "\n".join(lines)
    elif format_type == "markdown":
        widths = [max(len(cols[j]), *(len(r[j]) for r in body)) if body
                  else len(cols[j]) for j in range(len(cols))]
        line = lambda cells: ("| " + " | ".join(
            c.ljust(w) for c, w in zip(cells, widths)) + " |")
        out = "\n".join([line(cols),
                         "|" + "|".join("-" * (w + 2) for w in widths) + "|"]
                        + [line(r) for r in body])
    else:
        raise ValueError(f"unknown format_type {format_type!r}")
    if output_path:
        p = Path(output_path)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(out + "\n")
    return out


def create_results_df(results, index_name: str = "Method"):
    """{method: {metric: value}} -> DataFrame with methods as rows
    (reference src/visualization.py:607-620)."""
    import pandas as pd

    df = pd.DataFrame(results).T
    df.index.name = index_name
    return df.reset_index()


def format_improvement(baseline: float, improved: float,
                       precision: int = 2) -> str:
    """Relative-improvement percentage string, '+x.xx%' / '-x.xx%'
    (reference src/visualization.py:624-631)."""
    if baseline == 0:
        return "N/A"
    pct = (improved - baseline) / baseline * 100
    sign = "+" if pct >= 0 else ""
    return f"{sign}{pct:.{precision}f}%"
