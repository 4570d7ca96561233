"""CLI: tune the sparse production-engine config for an index.

`python -m qpp_fusion_rag_tpu.pipeline.autotune --index-dir data/<ds>/index/bm25
 --queries data/<ds>/queries.jsonl [--k 10] [--target-recall 0.99]
 [--output tuned.json]`

Measures recall@k of the q8 / q8r engine grid against full-depth exact
scoring on a query sample (index/autotune.py) and prints the cheapest
configuration meeting the target — deploy it with
`--sparse-engine <engine> --p-cap <p_cap> --sparse-candidates <candidates>`
on pipeline.retrieve / pipeline.serve (or the same-named kwargs on
BM25Retriever / SpladeRetriever).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Tune sparse engine config")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--queries", help="queries.jsonl (sparse mode)")
    ap.add_argument("--dense", action="store_true",
                    help="tune the DENSE engines (int8/int8r vs f32 exact) "
                         "of a DenseIndex dir instead of a sparse index")
    ap.add_argument("--query-emb", default=None,
                    help="dense mode: .npy of sample query embeddings "
                         "[B, D] (e.g. pipeline.encode output)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--target-recall", type=float, default=0.99)
    ap.add_argument("--p-caps", type=int, nargs="+",
                    default=[1024, 2048, 4096])
    ap.add_argument("--candidates", type=int, nargs="+",
                    default=[512, 1024, 2048])
    ap.add_argument("--rescore-pools", type=int, nargs="+",
                    default=[128, 256, 512, 1024],
                    help="dense mode: int8r pool sizes to sweep")
    ap.add_argument("--max-sample", type=int, default=256)
    ap.add_argument("--output", default=None, help="write the sweep JSON here")
    args = ap.parse_args(argv)

    if args.dense:
        return _main_dense(args)
    if not args.queries:
        ap.error("--queries is required unless --dense")

    from qpp_fusion_rag_tpu.index.autotune import autotune_sparse
    from qpp_fusion_rag_tpu.index.sparse import SparseIndex

    index = SparseIndex.load(args.index_dir)
    texts = []
    with open(args.queries) as f:
        for ln in f:
            if not ln.strip():
                continue
            texts.append(json.loads(ln).get("text", ""))
            if len(texts) >= args.max_sample:
                break
    cfg = autotune_sparse(index, texts, k=args.k,
                          target_recall=args.target_recall,
                          p_caps=args.p_caps,
                          candidate_sizes=args.candidates,
                          max_sample=args.max_sample)
    for s in cfg.sweep:
        print(f"[autotune] {s['engine']:3s} p_cap={s['p_cap']:<6d} "
              f"cand={s['candidates']:<6d} recall@{args.k}={s['recall']:.4f} "
              f"cost={s['cost']:.0f}")
    verdict = "MEETS" if cfg.meets_target else "BEST-EFFORT (target missed)"
    print(f"[autotune] chosen: engine={cfg.engine} p_cap={cfg.p_cap} "
          f"candidates={cfg.candidates} recall={cfg.recall:.4f} — {verdict}")
    print(f"[autotune] deploy: --sparse-engine {cfg.engine} "
          f"--p-cap {cfg.p_cap}"
          + (f" --sparse-candidates {cfg.candidates}"
             if cfg.candidates else ""))
    if not cfg.meets_target:
        print("[autotune] no swept config met the target; consider "
              "engine='exact' or SparseIndex.search_certified")
    if args.output:
        Path(args.output).write_text(json.dumps({
            "chosen": {"engine": cfg.engine, "p_cap": cfg.p_cap,
                       "candidates": cfg.candidates, "recall": cfg.recall,
                       "meets_target": cfg.meets_target},
            "k": args.k, "target_recall": args.target_recall,
            "sweep": cfg.sweep,
        }, indent=1))
        print(f"[autotune] sweep -> {args.output}")
    return 0


def _main_dense(args) -> int:
    import numpy as np

    from qpp_fusion_rag_tpu.index.autotune import autotune_dense
    from qpp_fusion_rag_tpu.retrievers.dense import DenseIndex

    if not args.query_emb:
        raise SystemExit("--dense requires --query-emb <queries.npy>")
    index = DenseIndex.load(args.index_dir)
    q = np.load(args.query_emb)
    cfg = autotune_dense(index, q, k=args.k,
                         target_recall=args.target_recall,
                         rescore_pools=args.rescore_pools,
                         max_sample=args.max_sample)
    for s in cfg.sweep:
        print(f"[autotune] {s['engine']:6s} pool={s['rescore_pool']:<6d} "
              f"recall@{args.k}={s['recall']:.4f} cost={s['cost']:.0f}")
    verdict = ("MEETS" if cfg.meets_target
               else "ESCALATED to exact stream (no int8 config met target)")
    print(f"[autotune] chosen: engine={cfg.engine} "
          f"rescore_pool={cfg.rescore_pool} recall={cfg.recall:.4f} — "
          f"{verdict}")
    print(f"[autotune] deploy: --dense-engine {cfg.engine}"
          + (f" --rescore-pool {cfg.rescore_pool}"
             if cfg.rescore_pool else ""))
    if args.output:
        Path(args.output).write_text(json.dumps({
            "chosen": {"engine": cfg.engine,
                       "rescore_pool": cfg.rescore_pool,
                       "recall": cfg.recall,
                       "meets_target": cfg.meets_target},
            "k": args.k, "target_recall": args.target_recall,
            "sweep": cfg.sweep,
        }, indent=1))
        print(f"[autotune] sweep -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
