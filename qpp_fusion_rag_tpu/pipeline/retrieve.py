"""Stage 02 — retrieval CLI.

`python -m qpp_fusion_rag_tpu.pipeline.retrieve --dataset-dir data/<ds>
 --index-dir data/<ds>/index --retrievers bm25 --output-dir data/<ds>/runs`

Reference: scripts/02_retrieve.py:287-364 — run each selected retriever,
write `<R>.res` (raw) + `<R>.norm.res` (per-query min-max), the score
contract for QPP and fusion. No checkpoint-JSONL machinery is needed:
batched device search makes per-retriever runtime seconds, not hours.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Run retrievers over a query set")
    ap.add_argument("--dataset-dir", required=True, help="dir with queries.jsonl + qrels/")
    ap.add_argument("--index-dir", required=True, help="dir with per-retriever index subdirs")
    ap.add_argument("--retrievers", nargs="*", default=["bm25"])
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--top-k", type=int, default=None)
    ap.add_argument("--split", default="test")
    ap.add_argument("--sparse-engine", default=None,
                    choices=["exact", "q8", "q8r", "certified"],
                    help="BM25/SPLADE scoring engine: exact pair-sort, q8 "
                         "throughput kernel, q8r rank-safe rescore, or "
                         "certified (PROVABLY rank-exact, adaptive "
                         "escalation; BM25 only)")
    ap.add_argument("--sparse-presorted", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="dual doc-ordered posting layout (q8/q8r only)")
    ap.add_argument("--p-cap", type=int, default=None,
                    help="sparse posting-window depth (pipeline.autotune's "
                         "tuned value; default: index params or min(max_df, "
                         "4096))")
    ap.add_argument("--sparse-candidates", type=int, default=2048,
                    help="q8r rescore pool size (pipeline.autotune's tuned "
                         "value)")
    ap.add_argument("--dense-engine", default="stream",
                    choices=["stream", "int8", "int8r"],
                    help="dense (bge/tct) engine: streaming matmul, int8 "
                         "MXU kernel, or int8r rank-safe pool rescore")
    ap.add_argument("--rescore-pool", type=int, default=512,
                    help="int8r pool size (pipeline.autotune --dense's "
                         "tuned value)")
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.config import config
    from qpp_fusion_rag_tpu.data.loaders import load_queries
    from qpp_fusion_rag_tpu.retrievers import get_retriever
    from qpp_fusion_rag_tpu.retrievers.base import write_results_trec

    top_k = args.top_k or int(config.processing.retrieval.top_k)
    queries = load_queries(args.dataset_dir, split=args.split)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    print(f"[retrieve] {len(queries)} queries, top_k={top_k}")

    # flag > config default (tpu.sparse.engine / .presorted)
    engine = args.sparse_engine or str(config.tpu.sparse.engine)
    presorted = (bool(config.tpu.sparse.presorted)
                 if args.sparse_presorted is None
                 else args.sparse_presorted)
    for name in args.retrievers:
        t0 = time.time()
        kw = {}
        if name in ("bm25", "splade"):
            if engine != "exact":
                eng = engine
                if engine == "certified" and name == "splade":
                    # the adaptive certificate ladder lives on
                    # SparseIndex; SPLADE serves q8r (same pool
                    # rescore, no per-query proof)
                    print(f"[{name}] certified engine: SPLADE "
                          "falls back to q8r")
                    eng = "q8r"
                kw["engine"] = eng
                kw["candidates"] = args.sparse_candidates
                if presorted and eng != "certified":
                    # the certified ladder re-windows per round;
                    # it runs the plain layout by design
                    kw["presorted"] = True
            if args.p_cap:
                kw["p_cap"] = args.p_cap
        if name in ("bge", "tct_colbert", "dense") and args.dense_engine != "stream":
            kw["engine"] = args.dense_engine
            if args.dense_engine == "int8r":
                kw["rescore_pool"] = args.rescore_pool
        retriever = get_retriever(name, index_dir=Path(args.index_dir) / name,
                                  **kw)
        results = retriever.retrieve_batch(queries, top_k=top_k)
        dt = time.time() - t0
        write_results_trec(results, out_dir / f"{name}.res", tag=name, normalize=False)
        write_results_trec(results, out_dir / f"{name}.norm.res", tag=name, normalize=True)
        print(f"[retrieve] {name}: {dt:.2f}s ({len(queries) / max(dt, 1e-9):.0f} q/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
