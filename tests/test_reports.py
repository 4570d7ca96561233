"""Stage 09/10 CLIs + visualization outputs."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def runs_world(tmp_path_factory):
    from qpp_fusion_rag_tpu.data.loaders import write_run_file

    root = tmp_path_factory.mktemp("rw")
    runs = root / "runs"
    runs.mkdir()
    rng = np.random.default_rng(0)
    qids = [str(i) for i in range(20)]
    with open(root / "qrels.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for q in qids:
            f.write(f"{q}\td{int(q)}\t1\n")
    for name, quality in [("bm25", 0.9), ("bge", 0.5)]:
        raw, norm = {}, {}
        for q in qids:
            docs = [f"d{rng.integers(100, 200)}" for _ in range(10)]
            if rng.uniform() < quality:
                docs[0] = f"d{q}"
            scores = np.linspace(5, 1, 10)
            raw[q] = list(zip(docs, scores.tolist()))
            norm[q] = list(zip(docs, np.linspace(1, 0, 10).tolist()))
        write_run_file(raw, runs / f"{name}.res", tag=name)
        write_run_file(norm, runs / f"{name}.norm.res", tag=name)
    return root


@pytest.mark.slow
def test_eval_rankers_cli(runs_world):
    from qpp_fusion_rag_tpu.pipeline.eval_rankers import main

    out = runs_world / "figs"
    rc = main([
        "--runs-dir", str(runs_world / "runs"),
        "--qrels", str(runs_world / "qrels.tsv"),
        "--output-dir", str(out),
        "--dataset", "nq",
    ])
    assert rc == 0
    data = json.loads((out / "ranker_eval_nq.json").read_text())
    assert data["results"]["bm25"]["metrics"]["nDCG@10"] > data["results"]["bge"]["metrics"]["nDCG@10"]
    assert data["results"]["bm25"]["category"] == "lexical"
    assert data["benchmark"]["BM25"] == 0.329
    assert (out / "ranker_eval_nq.md").exists()
    assert (out / "ranker_eval_nq.tex").exists()
    csv = (out / "ranker_eval_nq.csv").read_text().splitlines()
    assert csv[0].startswith("retriever,category,nDCG@10")
    assert len(csv) == 3
    tex = (out / "ranker_eval_nq.tex").read_text()
    assert "\\\\_" not in tex  # no double-backslash underscore escapes
    assert (out / "rankers_nq.png").exists()
    assert (out / "beir_comparison_nq.pdf").exists()


def test_oracle_cli(runs_world, tmp_path):
    from qpp_fusion_rag_tpu.pipeline.oracle import main

    report = tmp_path / "oracle.json"
    run_path = tmp_path / "oracle.res"
    rc = main([
        "--runs-dir", str(runs_world / "runs"),
        "--qrels", str(runs_world / "qrels.tsv"),
        "--output", str(report),
        "--write-run", str(run_path),
    ])
    assert rc == 0
    rep = json.loads(report.read_text())
    assert rep["oracle_metric"] >= rep["best_single"] - 1e-9
    assert run_path.exists()
    lines = run_path.read_text().strip().splitlines()
    assert len(lines) == 20 * 10


def test_visualization_primitives(tmp_path):
    from qpp_fusion_rag_tpu.utils.visualization import (
        bar_comparison,
        heatmap,
        line_plot,
        save_figure,
    )

    fig = bar_comparison({"a": 0.5, "b": 0.7}, title="t", ylabel="m", baseline="a")
    paths = save_figure(fig, tmp_path / "bar", formats=("png",))
    assert paths[0].exists()

    fig = line_plot([1, 2, 3], {"x": [1, 2, 3], "y": [3, 2, 1]}, title="l")
    save_figure(fig, tmp_path / "line", formats=("png",))

    fig = heatmap(np.random.rand(3, 4), ["r1", "r2", "r3"], ["a", "b", "c", "d"])
    save_figure(fig, tmp_path / "hm", formats=("png",))

    with pytest.raises(ValueError):
        line_plot([1], {f"s{i}": [1] for i in range(9)})


def test_table_figure(tmp_path):
    from qpp_fusion_rag_tpu.utils.visualization import save_figure, table_figure

    fig = table_figure(
        [["combsum", 0.494], ["learned", 0.5759]],
        col_labels=["method", "nDCG@10"],
        title="NQ",
    )
    paths = save_figure(fig, tmp_path / "table", formats=("png",))
    assert paths[0].exists()


def test_research_figure_saves_all_formats(tmp_path):
    """reference src/visualization.py:145-190 parity."""
    from qpp_fusion_rag_tpu.utils.visualization import ResearchFigure

    out = tmp_path / "figs" / "f1.pdf"
    with ResearchFigure(size="single", output_path=out) as fig:
        ax = fig.add_subplot(111)
        ax.plot([0, 1], [1, 2])
    assert (tmp_path / "figs" / "f1.pdf").exists()
    assert (tmp_path / "figs" / "f1.png").exists()
    # an exception inside the body must NOT save
    try:
        with ResearchFigure(output_path=tmp_path / "figs" / "f2.pdf"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not (tmp_path / "figs" / "f2.pdf").exists()


def test_table_comparison_latex_and_markdown(tmp_path):
    """reference src/visualization.py:374-460 parity: best-per-column
    bolding in both formats, file save."""
    from qpp_fusion_rag_tpu.utils.visualization import table_comparison

    res = {"combsum": {"nDCG@10": 0.494, "RR@10": 0.41},
           "learned": {"nDCG@10": 0.5759, "RR@10": 0.50}}
    tex = table_comparison(res, caption="NQ", label="tab:nq",
                           output_path=tmp_path / "t.tex")
    assert "\\textbf{0.5759}" in tex and "0.4940" in tex
    assert "\\toprule" in tex and "\\label{tab:nq}" in tex
    assert (tmp_path / "t.tex").exists()
    md = table_comparison(res, format_type="markdown", precision=3)
    assert "**0.576**" in md and "| combsum" in md


def test_create_results_df_and_format_improvement():
    """reference src/visualization.py:607-631 parity."""
    from qpp_fusion_rag_tpu.utils.visualization import (
        create_results_df, format_improvement, table_comparison)

    res = {"a": {"m": 1.0}, "b": {"m": 2.0}}
    df = create_results_df(res)
    assert list(df.columns) == ["Method", "m"]
    assert df.shape == (2, 2)
    # DataFrame input accepted by table_comparison
    assert "\\textbf{2.0000}" in table_comparison(df)
    assert format_improvement(0.494, 0.5759) == "+16.58%"
    assert format_improvement(1.0, 0.9) == "-10.00%"
    assert format_improvement(0.0, 1.0) == "N/A"
