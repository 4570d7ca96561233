"""Stage 06 — fused-run evaluation CLI.

`python -m qpp_fusion_rag_tpu.pipeline.evaluate --fused-dir data/<ds>/fused
 --qrels data/<ds>/qrels/test.tsv [--output comparison_results.json]`

Reference: scripts/06_eval_fusion.py:52-140 — evaluate every fused `.res`
with the configured metrics, classify method type from the filename, print
Δ vs the first unweighted baseline, write `comparison_results.json`.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def classify_method(name: str) -> str:
    """Filename -> method family (reference 06_eval_fusion.py:64-84)."""
    n = name.lower()
    if n.startswith("learned") or "lgbm" in n or "mlp" in n or "multioutput" in n or "per_retriever" in n:
        return "learned"
    if n.startswith("w") or "weighted" in n:
        return "qpp_weighted"
    if "oracle" in n:
        return "oracle"
    return "unweighted"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Evaluate fused runs against qrels")
    ap.add_argument("--fused-dir", required=True)
    ap.add_argument("--qrels", required=True)
    ap.add_argument("--metrics", nargs="*", default=None)
    ap.add_argument("--output", default=None, help="defaults to <fused-dir>/comparison_results.json")
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.config import config
    from qpp_fusion_rag_tpu.data.loaders import load_qrels, load_run_pairs
    from qpp_fusion_rag_tpu.evaluation.ir_evaluator import IREvaluator

    fused_dir = Path(args.fused_dir)
    qrels = load_qrels(args.qrels)
    metrics = args.metrics or list(config.evaluation.ir_metrics)[:6]
    ev = IREvaluator(metrics)

    results = {}
    baseline_name, baseline = None, None
    for res in sorted(fused_dir.glob("*.res")):
        run2 = load_run_pairs(res)
        scores = ev.evaluate(run2, qrels)
        family = classify_method(res.stem)
        results[res.stem] = {"metrics": scores, "type": family}
        if family == "unweighted" and baseline is None:
            baseline_name, baseline = res.stem, scores
        line = "  ".join(f"{m}={scores[m]:.4f}" for m in metrics)
        print(f"[eval] {res.stem:28s} [{family:12s}] {line}")

    if baseline:
        main_metric = metrics[0]
        print(f"[eval] Δ vs {baseline_name} ({main_metric}):")
        for name, r in results.items():
            if name == baseline_name:
                continue
            delta = r["metrics"][main_metric] - baseline[main_metric]
            print(f"[eval]   {name:28s} {delta:+.4f}")

    out = Path(args.output) if args.output else fused_dir / "comparison_results.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[eval] wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
