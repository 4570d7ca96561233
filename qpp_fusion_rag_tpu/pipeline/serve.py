"""One-process fused retrieval: retrieve → QPP → fuse, no files between.

`python -m qpp_fusion_rag_tpu.pipeline.serve --index-dir data/<ds>/index
 --retrievers bm25 --queries data/<ds>/queries.jsonl --output fused.res
 [--method wcombsum --qpp-model RSD]`

The reference's pipeline IS its file boundaries (each stage a separate
process, SURVEY §1); this CLI demonstrates the collapsed architecture:
one process holds every index, runs batched retrieval on device, computes
QPP and fuses in-memory, and reports per-stage timing (utils.profiling).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Serve fused retrieval end-to-end")
    ap.add_argument("--index-dir", required=True, help="per-retriever index subdirs")
    ap.add_argument("--retrievers", nargs="+", default=["bm25"])
    ap.add_argument("--queries", required=True, help="queries.jsonl")
    ap.add_argument("--output", default=None, help="fused TREC output path")
    ap.add_argument("--method", default="wcombsum")
    ap.add_argument("--qpp-model", default=None)
    ap.add_argument("--model-path", default=None,
                    help="trained fusion model (required for --method learned)")
    ap.add_argument("--top-k", type=int, default=None)
    ap.add_argument("--k-out", type=int, default=100)
    ap.add_argument("--timing-jsonl", default=None)
    ap.add_argument("--sparse-engine", default=None,
                    choices=["exact", "q8", "q8r", "certified"],
                    help="BM25/SPLADE scoring engine: exact pair-sort, q8 "
                         "throughput kernel, or q8r rank-safe rescore "
                         "(docs/quality_rescore.json)")
    ap.add_argument("--sparse-presorted", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="dual doc-ordered posting layout (q8/q8r only): "
                         "skips the early bitonic sort rounds on TPU")
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
    if args.method.lower() == "learned" and not args.model_path:
        ap.error("--method learned requires --model-path")

    from qpp_fusion_rag_tpu.config import config
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor
    from qpp_fusion_rag_tpu.fusion.engine import run_fusion
    from qpp_fusion_rag_tpu.qpp.engine import (
        compute_qpp_for_runtensor,
        qpp_tensor_to_dict,
    )
    from qpp_fusion_rag_tpu.retrievers import get_retriever
    from qpp_fusion_rag_tpu.retrievers.base import normalize_scores
    from qpp_fusion_rag_tpu.utils.profiling import StageTimer

    top_k = args.top_k or int(config.processing.retrieval.top_k)
    queries = {}
    with open(args.queries) as f:
        for line in f:
            if line.strip():
                q = json.loads(line)
                queries[str(q["_id"])] = q["text"]

    timer = StageTimer(jsonl_path=args.timing_jsonl)
    needs_qpp = args.method.lower().replace("w-", "w") in (
        "wcombsum", "wcombmnz", "wrrf", "learned",
    )

    # flag > config default (tpu.sparse.engine / .presorted)
    engine = args.sparse_engine or str(config.tpu.sparse.engine)
    presorted = (bool(config.tpu.sparse.presorted)
                 if args.sparse_presorted is None
                 else args.sparse_presorted)
    with timer.stage("load_indexes"):
        retrievers = {}
        for name in args.retrievers:
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
            retrievers[name] = get_retriever(
                name, index_dir=Path(args.index_dir) / name, **kw)

    # QPP must see RAW scores (stage-03 computes on *.res, not *.norm.res —
    # per-query min-max would flatten the magnitude statistics WIG/NQC/Sigma);
    # fusion consumes the min-max normalized scores, like the offline stages.
    raw_runs, norm_runs = {}, {}
    for name, retriever in retrievers.items():
        with timer.stage(f"retrieve:{name}", items=len(queries)):
            results = retriever.retrieve_batch(queries, top_k=top_k)
        raw_runs[name] = {qid: list(res.results) for qid, res in results.items()}
        norm_runs[name] = {
            qid: [(d, s, r) for d, s, r in normalize_scores(res.results)]
            for qid, res in results.items()
        }

    with timer.stage("tensorize"):
        rt = RunTensor.from_run_dicts(norm_runs, qids=list(queries.keys()))

    qpp_dict = None
    if needs_qpp:
        with timer.stage("qpp", items=rt.Q * rt.R):
            rt_raw = RunTensor.from_run_dicts(raw_runs, qids=list(queries.keys()))
            qpp = compute_qpp_for_runtensor(rt_raw, query_texts=queries)
            qpp_dict = qpp_tensor_to_dict(qpp, rt_raw.qids, rt_raw.retrievers)

    with timer.stage("fuse", items=rt.Q):
        fused = run_fusion(
            args.method, rt, qpp=qpp_dict, qpp_model=args.qpp_model,
            model_path=args.model_path,
            k_out=args.k_out, output_path=args.output,
        )

    total = sum(timer.summary().values())
    print(f"[serve] {rt.Q} queries x {rt.R} retrievers -> "
          f"{fused.retrievers[0]} in {total:.2f}s "
          f"({rt.Q / max(total, 1e-9):.0f} q/s end-to-end)")
    if args.output:
        print(f"[serve] wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
