"""Calibrate the synthetic bench generator to REAL index statistics
(VERDICT r4 weak #3): fit zipf_bm25_csr's (zipf_a, doc-length lognormal
sigma) to the decoded real SciFact Terrier index and compare the df /
doc-length / BM25-weight distributions of the fitted synthetic against
the real ones at matched scale. Also records the real SPLADE Lucene
impact index's df curve for the splade-view parameters.

Writes docs/synthetic_calibration.json; the fitted parameters feed
bench.py's generators so BENCH numbers carry real-distribution shape.

Run: python scripts_dev/calibrate_synthetic.py
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

from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr  # noqa: E402
from qpp_fusion_rag_tpu.index.terrier import TerrierIndex  # noqa: E402

QTILES = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def fit_zipf_a(df: np.ndarray) -> float:
    """OLS slope of log(df) vs log(rank) over the informative mid-range
    (ranks 10..10%·T): the head saturates at n_docs and the tail is
    dominated by df=1 noise, both off-model."""
    df_sorted = np.sort(df[df > 0])[::-1].astype(np.float64)
    lo, hi = 10, max(int(0.1 * len(df_sorted)), 100)
    r = np.arange(1, len(df_sorted) + 1, dtype=np.float64)[lo:hi]
    d = df_sorted[lo:hi]
    x, y = np.log(r), np.log(d)
    slope = float(np.polyfit(x, y, 1)[0])
    return -slope


def dist_summary(x: np.ndarray) -> dict:
    x = np.asarray(x, dtype=np.float64)
    return {"mean": round(float(x.mean()), 4),
            "std": round(float(x.std()), 4),
            "quantiles": {str(q): round(float(np.quantile(x, q)), 4)
                          for q in QTILES}}


def main():
    t0 = time.time()
    ti = TerrierIndex.load(REF / "index/pyterrier")
    real_df = ti.term_df.astype(np.float64)
    real_lens = ti.doc_lens.astype(np.float64)
    real_w = ti.bm25_weights()
    n_docs, n_terms = ti.num_docs, ti.num_terms
    print(f"[cal] real Terrier: {n_docs} docs, {n_terms} terms, "
          f"{len(real_w)} postings ({time.time()-t0:.0f}s)")

    zipf_a = fit_zipf_a(real_df)
    log_lens = np.log(np.maximum(real_lens, 1.0))
    sigma = float(log_lens.std())
    avg_len = float(real_lens.mean())
    print(f"[cal] fitted zipf_a={zipf_a:.3f} lognormal_sigma={sigma:.3f} "
          f"avg_doc_len={avg_len:.1f}")

    # fitted synthetic at matched scale (ALL fitted params, including
    # sigma — comparing against the default sigma would not validate
    # the fit)
    so, sd, sw, slens = zipf_bm25_csr(
        n_docs, vocab_size=n_terms, avg_doc_len=avg_len,
        zipf_a=zipf_a, lognormal_sigma=sigma, seed=0)
    syn_df = np.diff(so).astype(np.float64)

    report = {
        "real": {
            "dataset": "scifact (reference Terrier index, decoded natively)",
            "n_docs": n_docs, "n_terms": n_terms,
            "n_postings": int(len(real_w)),
            "df": dist_summary(real_df),
            "doc_len": dist_summary(real_lens),
            "bm25_weight": dist_summary(real_w),
            "max_df_frac": round(float(real_df.max()) / n_docs, 4),
        },
        "fitted_params": {
            "zipf_a": round(zipf_a, 4),
            "lognormal_sigma": round(sigma, 4),
            "avg_doc_len": round(avg_len, 2),
        },
        "synthetic_at_fitted_params": {
            "n_postings": int(len(sw)),
            "df": dist_summary(syn_df),
            "doc_len": dist_summary(slens),
            "bm25_weight": dist_summary(sw),
            "max_df_frac": round(float(syn_df.max()) / n_docs, 4),
        },
    }

    # real SPLADE impact index df curve (for the splade-view generator)
    try:
        from qpp_fusion_rag_tpu.index.lucene import LuceneImpactIndex

        li = LuceneImpactIndex.load(REF / "index/splade")
        sdf = np.diff(li.offsets).astype(np.float64)
        report["real_splade"] = {
            "n_terms": len(sdf),
            "n_postings": int(sdf.sum()),
            "df": dist_summary(sdf),
            "zipf_a_fit": round(fit_zipf_a(sdf), 4),
        }
        print(f"[cal] real SPLADE: {len(sdf)} terms, "
              f"zipf_a={report['real_splade']['zipf_a_fit']}")
    except Exception as e:  # the SPLADE decode path may move
        report["real_splade"] = {"error": str(e)}
        print(f"[cal] splade skipped: {e}")

    report["elapsed_s"] = round(time.time() - t0, 1)
    out = REPO / "docs/synthetic_calibration.json"
    out.write_text(json.dumps(report, indent=1) + "\n")
    print(f"[cal] wrote {out}")


if __name__ == "__main__":
    main()
