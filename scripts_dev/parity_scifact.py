"""Real-data SciFact parity driver (VERDICT round-3 task #1).

Decodes the reference's committed REAL Terrier index binaries
(/root/reference/data/scifact/index/pyterrier — built by reference
scripts/01_index.py:36-72), regenerates the BM25 run for the 300 real
queries with the repo's own decoder/tokenizer/stemmer/weighting
(qpp_fusion_rag_tpu/index/terrier.py — the scoring model reverse-
engineered and verified this round), computes QPP with the repo engine,
and compares row-by-row against the committed real BM25.res.mmnorm.qpp.
Also evaluates the regenerated run against the real qrels. Writes
docs/parity_scifact.json.

Run: python scripts_dev/parity_scifact.py
"""

import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/data/scifact")
sys.path.insert(0, str(REPO))

from qpp_fusion_rag_tpu.index.terrier import (  # noqa: E402
    TerrierIndex, sanitize_terrier_query)
from qpp_fusion_rag_tpu.qpp.engine import compute_qpp  # noqa: E402
from qpp_fusion_rag_tpu.data.loaders import (  # noqa: E402
    load_qpp_file, load_qrels, load_queries)
from qpp_fusion_rag_tpu.evaluation.ir_evaluator import IREvaluator  # noqa: E402


def regenerate_bm25_run(ti: TerrierIndex, queries: dict, top_k: int = 100):
    """{qid: text} -> {qid: [(docno, score, rank)]} via the decoded index."""
    w = ti.bm25_weights()
    out = {}
    for qid, text in queries.items():
        out[qid] = ti.bm25_search(sanitize_terrier_query(text),
                                  top_k=top_k, weights=w)
    return out


def compare_qpp(ours: dict, theirs: dict):
    """Per-column abs diff between two {qid: [13]} maps (6-dec committed)."""
    qids = sorted(set(ours) & set(theirs))
    a = np.array([ours[q] for q in qids])
    b = np.array([theirs[q] for q in qids])
    d = np.abs(a - b)
    return {
        "n_queries": len(qids),
        "max_abs_diff": float(d.max()),
        "mean_abs_diff": float(d.mean()),
        "per_column_max": [float(x) for x in d.max(axis=0)],
        "rows_exact_1e-5": float((d.max(axis=1) <= 1e-5).mean()),
        "rows_exact_1e-4": float((d.max(axis=1) <= 1e-4).mean()),
    }


def main():
    t0 = time.time()
    report = {
        "dataset": "scifact",
        "inputs": "100% real reference binaries: Terrier index, 300 "
                  "queries, qrels, committed BM25.res.mmnorm.qpp",
        "terrier_index": str(REF / "index/pyterrier"),
        "scoring_model": "Terrier BM25 k1=1.2 b=0.75 k3=8 with (k1+1) "
                         "numerator and max-normalized query kf — the "
                         "reference's bm25.k_1/bm25.b controls were "
                         "silently ignored (see index/terrier.py docstring)",
    }

    ti = TerrierIndex.load(REF / "index/pyterrier")
    report["index"] = {"num_docs": ti.num_docs, "num_terms": ti.num_terms,
                       "num_postings": int(len(ti.docids)),
                       "num_tokens": int(ti.tfs.sum()),
                       "avg_doc_len": ti.avg_doc_len}

    queries = load_queries(REF / "BEIR-scifact")
    print(f"[parity] {len(queries)} queries; index {ti.num_docs} docs")

    run = regenerate_bm25_run(ti, queries)
    n_rows = sum(len(v) for v in run.values())
    report["bm25_run"] = {"n_queries": len(run), "n_rows": n_rows}
    print(f"[parity] regenerated BM25 run: {n_rows} rows "
          f"({time.time()-t0:.1f}s)")

    # QPP on raw scores, exactly the reference stage-03 path
    scores_by_qid = {q: [s for _, s, _ in rows] for q, rows in run.items()}
    ours = compute_qpp(scores_by_qid, queries, top_k=100, normalize="minmax")
    theirs = load_qpp_file(REF / "qpp/BM25.res.mmnorm.qpp")
    report["qpp_vs_committed"] = compare_qpp(ours, theirs)
    print("[parity] qpp:", json.dumps(report["qpp_vs_committed"], indent=1))

    # IR eval vs real qrels
    qrels = load_qrels(REF / "BEIR-scifact/qrels/test.tsv")
    ev = IREvaluator(["nDCG@10", "RR@10", "R@100", "P@10"])
    run_dict = {q: [(d, s) for d, s, _ in rows] for q, rows in run.items()}
    metrics = ev.evaluate(run_dict, qrels)
    report["bm25_ir_eval"] = {k: float(v) for k, v in metrics.items()}
    print("[parity] IR eval:", report["bm25_ir_eval"])

    report["elapsed_s"] = round(time.time() - t0, 1)
    out = REPO / "docs/parity_scifact.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(f"[parity] wrote {out}")


if __name__ == "__main__":
    main()
