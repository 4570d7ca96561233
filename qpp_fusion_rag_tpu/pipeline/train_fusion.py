"""Stage 04 — learned-fusion training CLI.

`python -m qpp_fusion_rag_tpu.pipeline.train_fusion --runs-dir data/<ds>/runs
 --qpp-dir data/<ds>/qpp --qrels data/<ds>/qrels/test.tsv
 --output-dir data/<ds>/models [--models per_retriever multioutput mlp]`

Reference: scripts/04_train_fusion.py:160-281.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Train learned fusion models")
    ap.add_argument("--runs-dir", required=True)
    ap.add_argument("--qpp-dir", required=True)
    ap.add_argument("--qrels", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--models", nargs="*", default=["per_retriever", "multioutput", "mlp"])
    ap.add_argument("--train-ratio", type=float, default=None)
    ap.add_argument("--target-metric", default="nDCG@10")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.data.loaders import load_qpp_scores, load_qrels
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor
    from qpp_fusion_rag_tpu.train.fusion_trainer import train_fusion_models

    rt = RunTensor.from_trec_dir(args.runs_dir, use_normalized=True)
    qpp_data = load_qpp_scores(args.qpp_dir)
    qrels = load_qrels(args.qrels)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    results = train_fusion_models(
        rt, qpp_data, qrels,
        model_types=args.models, train_ratio=args.train_ratio,
        target_metric=args.target_metric, output_dir=out_dir, seed=args.seed,
    )

    base = results["_baselines"]
    print(f"[train] split: {base['n_train']} train / {base['n_test']} test")
    print(f"[train] uniform {args.target_metric}: {base['uniform']:.4f}")
    print(f"[train] oracle  {args.target_metric}: {base['oracle']:.4f}")
    summary = {"baselines": {k: v for k, v in base.items()}}
    for mtype in args.models:
        r = results[mtype]
        key = f"fused_{args.target_metric}"
        print(f"[train] {mtype:14s} {args.target_metric}: {r[key]:.4f} -> {r.get('path')}")
        summary[mtype] = {key: r[key], "path": r.get("path")}
    with open(out_dir / "training_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
