"""Certified mode on the REAL SPLADE impact index (round-5 follow-up to
the bench-scale finding): the calibrated synthetic corpus certifies ~0%
because its scores are tie-dense and its flat df curve hides mass behind
the window — this measures what the certificate does on the reference's
actual committed Lucene learned-impact index (975,230 postings, real df
curve, real quantized impacts), with the same synthetic wordpiece query
model the SPLADE autotune uses (no query encoder offline,
docs/autotune_scifact_splade.json).

Writes docs/quality_real_splade_certified.json: per-round certification
counts from SparseIndex.search_certified plus a brute-force exactness
check of every returned ranking.

Run: python scripts_dev/quality_real_splade_certified.py
"""
import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/data/scifact/index/splade")
sys.path.insert(0, str(REPO))

from qpp_fusion_rag_tpu.index.lucene import LuceneImpactIndex  # noqa: E402

OUT = REPO / "docs/quality_real_splade_certified.json"
B, K = 256, 10


def main():
    t0 = time.time()
    lx = LuceneImpactIndex.load(REF)
    idx = lx.to_sparse_index()
    print(f"[splade-cert] real index loaded {time.time()-t0:.0f}s: "
          f"{idx.num_docs} docs, {idx.num_terms} terms, "
          f"{idx.num_postings} postings", flush=True)

    # the SPLADE autotune's query model: wordpiece draws weighted by
    # log-df (real SPLADE queries mix frequent and expansion terms)
    rng = np.random.default_rng(7)
    df = np.diff(idx.offsets)
    cand_terms = np.flatnonzero(df >= 3)
    p = np.log1p(df[cand_terms].astype(np.float64))
    p /= p.sum()
    qt = rng.choice(cand_terms, size=(B, 12), p=p).astype(np.int32)
    qw = rng.uniform(0.3, 2.0, size=(B, 12)).astype(np.float32)
    # query text IS the row index: search_certified's exhaustive
    # fallback re-encodes only the pending subset, so the encoder must
    # map by identity, not prefix position
    idx.query_encoder = lambda texts, mt: (
        qt[[int(t) for t in texts]], qw[[int(t) for t in texts]])

    s, ids, info = idx.search_certified([str(i) for i in range(B)], k=K,
                                        p_cap=1024, candidates=512,
                                        max_rounds=2)
    rounds = info["rounds"]
    hist = np.bincount(info["certified_round"] + 1, minlength=3).tolist()

    # brute-force exactness of every returned ranking (the wrapper's
    # contract: certified or escalated, all exact)
    t0 = time.time()
    flat_w = idx.weights.astype(np.float64)
    if idx.weights.dtype == np.uint8:
        flat_w = flat_w * np.repeat(idx.term_scales,
                                    np.diff(idx.offsets).astype(np.int64))
    wrong = 0
    for b in range(B):
        true = np.zeros(idx.num_docs)
        for t, w in zip(qt[b], qw[b]):
            lo, hi = int(idx.offsets[t]), int(idx.offsets[t + 1])
            np.add.at(true, idx.docs[lo:hi], w * flat_w[lo:hi])
        got = np.sort(true[ids[b][ids[b] >= 0]])[::-1]
        best = np.sort(true)[::-1][: len(got)]
        if not np.allclose(got, best, rtol=1e-4, atol=1e-5):
            wrong += 1
    print(f"[splade-cert] brute-force check {time.time()-t0:.0f}s: "
          f"{wrong}/{B} wrong rankings", flush=True)

    out = {
        "dataset": "scifact SPLADE (real reference Lucene impact index)",
        "num_docs": idx.num_docs, "num_postings": idx.num_postings,
        "query_model": "synthetic 12-term wordpiece draws, log-df "
                       "weighted (docs/autotune_scifact_splade.json)",
        "k": K, "p_cap": 1024, "candidates": 512, "batch": B,
        "rounds": rounds,
        "certified_round_histogram": {
            "exhaustive_fallback": hist[0], "round0": hist[1],
            "round1": hist[2] if len(hist) > 2 else 0},
        "exactness_violations": wrong,
        "note": ("Real learned-impact df curve + real quantized scores: "
                 "the certificate fires here (vs ~0% on the calibrated "
                 "synthetic, whose k-th/k+1-th gaps are degenerate — "
                 "docs/quality_bench_scale.json boundary-gap medians)."),
    }
    OUT.write_text(json.dumps(out, indent=1))
    print(f"[splade-cert] rounds={rounds} hist={out['certified_round_histogram']}")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
