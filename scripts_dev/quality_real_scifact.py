"""Serving-engine quality on REAL data (VERDICT r3 task #2, second
branch): measure each sparse engine's end-metric cost on the real
SciFact Terrier index with the 300 real queries and real qrels —
nDCG@10 / R@100 per engine config plus retention vs the exact engine.

Run: python scripts_dev/quality_real_scifact.py
  -> docs/quality_real_scifact.json
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

from qpp_fusion_rag_tpu.index.terrier import TerrierIndex  # noqa: E402
from qpp_fusion_rag_tpu.data.loaders import load_qrels, load_queries  # noqa: E402
from qpp_fusion_rag_tpu.evaluation.ir_evaluator import IREvaluator  # noqa: E402


def main():
    t0 = time.time()
    ti = TerrierIndex.load(REF / "index/pyterrier")
    idx = ti.to_sparse_index()
    queries = load_queries(REF / "BEIR-scifact")
    qrels = load_qrels(REF / "BEIR-scifact/qrels/test.tsv")
    qids = list(queries)
    texts = [queries[q] for q in qids]
    ev = IREvaluator(["nDCG@10", "R@100"])

    def evaluate(scores, rows):
        run = {}
        for i, q in enumerate(qids):
            run[q] = [(idx.docnos[d], float(s))
                      for s, d in zip(scores[i], rows[i]) if d >= 0]
        m = ev.evaluate(run, qrels)
        return {k: round(float(v), 4) for k, v in m.items()}

    report = {
        "dataset": "scifact (real Terrier index, real queries, real qrels)",
        "configs": {},
    }

    s, r = idx.search(texts, k=100, p_cap=idx.max_df, engine="exact",
                      exact_topk=True)
    base = evaluate(s, r)
    report["configs"]["exact_full_depth"] = base
    print("[quality] exact:", base)

    grid = [("q8", 512, 0), ("q8", 1024, 0), ("q8", 2048, 0),
            ("q8r", 256, 128), ("q8r", 512, 256), ("q8r", 1024, 512)]
    for engine, p_cap, cand in grid:
        s, r = idx.search(texts, k=100, p_cap=p_cap, engine=engine,
                          candidates=cand)
        m = evaluate(s, r)
        m["ndcg10_retention_vs_exact"] = round(
            m["nDCG@10"] / base["nDCG@10"], 4)
        key = f"{engine}_pcap{p_cap}" + (f"_cand{cand}" if cand else "")
        report["configs"][key] = m
        print(f"[quality] {key}:", m)

    s, r, info = idx.search_certified(texts, k=100, candidates=512)
    m = evaluate(s, r)
    m["ndcg10_retention_vs_exact"] = round(m["nDCG@10"] / base["nDCG@10"], 4)
    m["certified_round_histogram"] = info.get("rounds_summary", info.get(
        "rounds", "n/a")) if isinstance(info, dict) else "n/a"
    report["configs"]["certified_cand512"] = m
    print("[quality] certified:", {k: v for k, v in m.items()
                                   if k != "certified_round_histogram"})

    report["elapsed_s"] = round(time.time() - t0, 1)
    out = REPO / "docs/quality_real_scifact.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print("[quality] wrote", out)


if __name__ == "__main__":
    main()
