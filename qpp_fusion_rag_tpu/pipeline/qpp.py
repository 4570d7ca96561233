"""Stage 03 — QPP computation CLI.

`python -m qpp_fusion_rag_tpu.pipeline.qpp --runs-dir data/<ds>/runs
 --output-dir data/<ds>/qpp [--queries data/<ds>/queries.jsonl]`

Reference: scripts/03_qpp.py (ProcessPoolExecutor over run files + JVM
subprocess per file). Here each file's queries batch through one device
kernel call, so there is no process fan-out; skip-if-exists semantics kept.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Compute QPP statistics for run files")
    ap.add_argument("--runs-dir", required=True, help="directory with *.res files")
    ap.add_argument("--output-dir", required=True, help="where *.mmnorm.qpp go")
    ap.add_argument("--queries", default=None, help="queries.jsonl for query texts")
    ap.add_argument("--top-k", type=int, default=None)
    ap.add_argument("--normalize", default=None, choices=[None, "minmax", "zscore", "none"])
    ap.add_argument("--force", action="store_true", help="recompute existing outputs")
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.qpp.engine import compute_qpp_dir

    queries = args.queries
    if queries is None:
        cand = Path(args.runs_dir).parent / "queries.jsonl"
        queries = str(cand) if cand.exists() else None

    t0 = time.time()
    written = compute_qpp_dir(
        args.runs_dir, args.output_dir,
        queries_path=queries, top_k=args.top_k, normalize=args.normalize,
        skip_existing=not args.force,
    )
    print(f"[qpp] wrote {len(written)} file(s) in {time.time() - t0:.2f}s")
    for p in written:
        print(f"[qpp]   {p}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
