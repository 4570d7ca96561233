"""Stage 09 — per-retriever evaluation + publication outputs CLI.

`python -m qpp_fusion_rag_tpu.pipeline.eval_rankers --runs-dir data/<ds>/runs
 --qrels data/<ds>/qrels/test.tsv --output-dir data/<ds>/results/figures
 [--dataset nq]`

Reference: scripts/09_eval_rankers.py:105-533 — evaluate every retriever
run against qrels, compare with the hardcoded published BEIR table, and
emit JSON + Markdown + LaTeX tables + PNG/PDF figures.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def to_markdown(results, metrics) -> str:
    lines = ["| retriever | category | " + " | ".join(metrics) + " |",
             "|---|---|" + "|".join(["---"] * len(metrics)) + "|"]
    for name, r in sorted(results.items(), key=lambda kv: -kv[1]["metrics"][metrics[0]]):
        vals = " | ".join(f"{r['metrics'][m]:.4f}" for m in metrics)
        lines.append(f"| {name} | {r['category']} | {vals} |")
    return "\n".join(lines) + "\n"


def to_latex(results, metrics, dataset) -> str:
    cols = "ll" + "r" * len(metrics)
    head = " & ".join(["Retriever", "Category"] + metrics)
    rows = []
    for name, r in sorted(results.items(), key=lambda kv: -kv[1]["metrics"][metrics[0]]):
        vals = " & ".join(f"{r['metrics'][m]:.4f}" for m in metrics)
        tex_name = name.replace("_", "\\_")  # escaped outside the f-string: py<3.12
        rows.append(f"{tex_name} & {r['category']} & {vals} \\\\")
    body = "\n".join(rows)
    return (
        f"\\begin{{table}}[t]\n\\centering\n\\caption{{Retriever quality on {dataset}}}\n"
        f"\\begin{{tabular}}{{{cols}}}\n\\toprule\n{head} \\\\\n\\midrule\n"
        f"{body}\n\\bottomrule\n\\end{{tabular}}\n\\end{{table}}\n"
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Evaluate individual retriever runs")
    ap.add_argument("--runs-dir", required=True)
    ap.add_argument("--qrels", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--metrics", nargs="*", default=None)
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.config import config, detect_dataset
    from qpp_fusion_rag_tpu.data.loaders import load_qrels, load_run_pairs
    from qpp_fusion_rag_tpu.evaluation.benchmark import (
        BEIR_BENCHMARK,
        CLOSEST_PUBLISHED,
        RETRIEVER_CATEGORIES,
        published_for,
    )
    from qpp_fusion_rag_tpu.evaluation.ir_evaluator import IREvaluator
    from qpp_fusion_rag_tpu.utils.visualization import (
        bar_comparison,
        beir_comparison_plot,
        save_figure,
    )

    runs_dir = Path(args.runs_dir)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    dataset = args.dataset or detect_dataset(runs_dir) or "unknown"
    qrels = load_qrels(args.qrels)
    metrics = args.metrics or ["nDCG@10", "RR@10", "R@100", "R@10"]
    ev = IREvaluator(metrics)

    results = {}
    for res in sorted(runs_dir.glob("*.res")):
        if res.name.endswith(".norm.res"):
            continue
        name = res.stem
        run2 = load_run_pairs(res)
        scores = ev.evaluate(run2, qrels)
        results[name] = {
            "metrics": scores,
            "category": RETRIEVER_CATEGORIES.get(name, "other"),
            "published_comparator": CLOSEST_PUBLISHED.get(name),
            "published_ndcg10": published_for(dataset, name),
        }
        line = "  ".join(f"{m}={scores[m]:.4f}" for m in metrics)
        print(f"[rankers] {name:16s} {line}")

    main_metric = metrics[0]
    # outputs: JSON, Markdown, LaTeX, figures
    (out_dir / f"ranker_eval_{dataset}.json").write_text(json.dumps({
        "dataset": dataset, "metrics": metrics, "results": results,
        "benchmark": BEIR_BENCHMARK.get(dataset, {}),
    }, indent=2))
    (out_dir / f"ranker_eval_{dataset}.md").write_text(
        f"# Retriever quality — {dataset}\n\n" + to_markdown(results, metrics)
    )
    (out_dir / f"ranker_eval_{dataset}.tex").write_text(
        to_latex(results, metrics, dataset)
    )
    # spreadsheet outputs: CSV + Excel (reference 09_eval_rankers.py:585
    # generate_excel_report; written here by the stdlib OOXML writer)
    ranked = sorted(results.items(), key=lambda kv: -kv[1]["metrics"][main_metric])
    csv_lines = ["retriever,category," + ",".join(metrics)]
    xlsx_rows = [["retriever", "category", *metrics]]
    for name, r in ranked:
        csv_lines.append(
            f"{name},{r['category']}," + ",".join(f"{r['metrics'][m]:.6f}" for m in metrics)
        )
        xlsx_rows.append(
            [name, r["category"], *[round(r["metrics"][m], 6) for m in metrics]]
        )
    (out_dir / f"ranker_eval_{dataset}.csv").write_text("\n".join(csv_lines) + "\n")
    from qpp_fusion_rag_tpu.utils.xlsx import write_xlsx

    write_xlsx(out_dir / f"ranker_eval_{dataset}.xlsx", {"results": xlsx_rows})

    fig = bar_comparison(
        {n: r["metrics"][main_metric] for n, r in results.items()},
        title=f"{dataset}: per-retriever {main_metric}", ylabel=main_metric,
    )
    save_figure(fig, out_dir / f"rankers_{dataset}")
    if dataset in BEIR_BENCHMARK:
        fig = beir_comparison_plot(
            {n: r["metrics"][main_metric] for n, r in results.items()},
            BEIR_BENCHMARK[dataset], dataset, metric=main_metric,
        )
        save_figure(fig, out_dir / f"beir_comparison_{dataset}")
    print(f"[rankers] outputs -> {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
