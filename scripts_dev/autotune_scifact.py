"""Autotune the sparse serving engines on the REAL SciFact Terrier index
(VERDICT r3 task #10): import the committed reference index into the
TPU-native SparseIndex, sweep q8/q8r configs against full-depth exact
scoring on the 300 real queries, and commit the tuned config + measured
recall to docs/autotune_scifact.json.

Run: python scripts_dev/autotune_scifact.py
"""

import json
import sys
import time
from dataclasses import asdict
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/data/scifact")
sys.path.insert(0, str(REPO))

from qpp_fusion_rag_tpu.index.terrier import (  # noqa: E402
    TerrierIndex, sanitize_terrier_query)
from qpp_fusion_rag_tpu.index.autotune import autotune_sparse  # noqa: E402
from qpp_fusion_rag_tpu.data.loaders import load_queries  # noqa: E402


def main():
    t0 = time.time()
    ti = TerrierIndex.load(REF / "index/pyterrier")
    idx = ti.to_sparse_index()
    queries = load_queries(REF / "BEIR-scifact")
    qs = [sanitize_terrier_query(t) for t in queries.values()]
    w = np.asarray(idx.weights)
    report = {
        "dataset": "scifact (real reference Terrier index)",
        "num_docs": idx.num_docs, "num_terms": idx.num_terms,
        "num_postings": int(idx.num_postings), "max_df": int(idx.max_df),
        "weights_min": float(w.min()), "weights_max": float(w.max()),
        "neg_weight_postings": int((w < 0).sum()),
    }
    print(f"[autotune] index: {report['num_docs']} docs, "
          f"max_df {report['max_df']}, "
          f"{report['neg_weight_postings']} negative-weight postings")

    for target in (0.99, 0.95):
        cfg = autotune_sparse(
            idx, qs, k=10, target_recall=target,
            p_caps=(256, 512, 1024, 2048),
            candidate_sizes=(128, 256, 512, 1024),
            max_sample=300)
        d = asdict(cfg)
        report[f"target_{target}"] = d
        print(f"[autotune] target {target}: {d}")

    report["elapsed_s"] = round(time.time() - t0, 1)
    out = REPO / "docs/autotune_scifact.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(f"[autotune] wrote {out}")


if __name__ == "__main__":
    main()
