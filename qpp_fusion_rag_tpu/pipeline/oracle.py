"""Stage 10 — oracle upper-bound CLI.

`python -m qpp_fusion_rag_tpu.pipeline.oracle --runs-dir data/<ds>/runs
 --qrels data/<ds>/qrels/test.tsv [--output oracle_report.json]
 [--write-run data/<ds>/fused/oracle.res]`

Reference: scripts/10_oracle_baseline.py:117-202.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Oracle best-ranker-per-query baseline")
    ap.add_argument("--runs-dir", required=True)
    ap.add_argument("--qrels", required=True)
    ap.add_argument("--metric", default="nDCG@10")
    ap.add_argument("--output", default=None)
    ap.add_argument("--write-run", default=None, help="write the oracle run as TREC")
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.data.loaders import load_qrels
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor
    from qpp_fusion_rag_tpu.fusion.oracle import oracle_report, oracle_run

    rt = RunTensor.from_trec_dir(args.runs_dir, use_normalized=True)
    qrels = load_qrels(args.qrels)
    rep = oracle_report(rt, qrels, metric=args.metric)

    print(f"[oracle] per-retriever {args.metric}:")
    for name, v in sorted(rep["per_retriever"].items(), key=lambda kv: -kv[1]):
        print(f"[oracle]   {name:16s} {v:.4f}")
    print(f"[oracle] best single: {rep['best_single']:.4f}")
    print(f"[oracle] oracle:      {rep['oracle_metric']:.4f} (headroom {rep['headroom']:+.4f})")
    print(f"[oracle] selections:  {rep['selection_histogram']}")

    if args.write_run:
        # reuse the selection oracle_report already computed (the R x Q
        # per-query metric matrix is the dominant cost)
        orun = oracle_run(rt, rep["selection"])
        orun.write_trec(0, args.write_run, tag="oracle")
        print(f"[oracle] run -> {args.write_run}")
    if args.output:
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        Path(args.output).write_text(json.dumps(rep, indent=2, default=str))
        print(f"[oracle] report -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
