"""Measure the true k/k+1 score gap on real SciFact: how many of the
uncertified queries are EXACT boundary ties (uncertifiable under any
quantized rescore) vs small-but-real gaps the imp_bits epsilon hides.

Run: python scripts_dev/diag_ties_real.py
"""

import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/data/scifact")
sys.path.insert(0, str(REPO))

from qpp_fusion_rag_tpu.index.terrier import TerrierIndex  # noqa: E402
from qpp_fusion_rag_tpu.data.loaders import load_queries  # noqa: E402


def main():
    ti = TerrierIndex.load(REF / "index/pyterrier")
    idx = ti.to_sparse_index()
    queries = load_queries(REF / "BEIR-scifact")
    texts = list(queries.values())
    q_terms, q_weights = idx.encode_queries(texts)

    # full exhaustive f64 scoring on host
    offsets = np.asarray(idx.offsets)
    docs = np.asarray(idx.docs)
    w = idx.weights.astype(np.float64)
    if idx.term_scales is not None:
        df = np.diff(offsets)
        w = w * np.repeat(idx.term_scales.astype(np.float64), df)
    B = len(texts)
    k = 100
    gaps = np.zeros(B)
    rel_gaps = np.zeros(B)
    n_short = 0
    for b in range(B):
        s = np.zeros(idx.num_docs)
        for t, qwt in zip(q_terms[b], q_weights[b]):
            if t < 0:
                continue
            lo, hi = int(offsets[t]), int(offsets[t + 1])
            np.add.at(s, docs[lo:hi], float(qwt) * w[lo:hi])
        top = np.sort(s)[::-1]
        nz = (top > 0).sum()
        if nz <= k:
            n_short += 1
            gaps[b] = np.nan
            continue
        gaps[b] = top[k - 1] - top[k]
        rel_gaps[b] = gaps[b] / max(top[k - 1], 1e-9)
    g = gaps[np.isfinite(gaps)]
    rg = rel_gaps[np.isfinite(gaps)]
    print(f"queries with <=100 scoring docs: {n_short}")
    print(f"k/k+1 gap: exact ties (==0): {(g == 0).sum()}, "
          f"<1e-6 rel: {(rg < 1e-6).sum()}, <1e-4 rel: {(rg < 1e-4).sum()}, "
          f"<1e-3 rel: {(rg < 1e-3).sum()} of {len(g)}")
    print(f"gap percentiles: p10 {np.percentile(rg, 10):.2e} "
          f"p25 {np.percentile(rg, 25):.2e} p50 {np.percentile(rg, 50):.2e}")


if __name__ == "__main__":
    main()
