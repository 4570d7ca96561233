"""Decompose the exactness certificate on the REAL SciFact index: which
term binds (outside bound / hidden mass / rescore slack / pool gap), per
query. Drives the round-5 bound tightening (VERDICT r4 task #1).

Run: python scripts_dev/diag_certified_real.py
"""

import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/data/scifact")
sys.path.insert(0, str(REPO))

from qpp_fusion_rag_tpu.index.terrier import TerrierIndex  # noqa: E402
from qpp_fusion_rag_tpu.data.loaders import load_queries  # noqa: E402
from qpp_fusion_rag_tpu.ops.sparse import (  # noqa: E402
    sparse_score_topk_q8_certified,
)


def main():
    t0 = time.time()
    ti = TerrierIndex.load(REF / "index/pyterrier")
    idx = ti.to_sparse_index()
    queries = load_queries(REF / "BEIR-scifact")
    texts = list(queries.values())
    print(f"loaded in {time.time()-t0:.0f}s; max_df={idx.max_df}, "
          f"docs={idx.num_docs}")

    q_terms, q_weights = idx.encode_queries(texts)
    packed, offs, pscales = idx._device_packed()
    dp, ds, bits = idx._device_doc_vectors()
    dt, dw = idx._device_doc_vectors_exact()
    B = len(texts)
    p_cap = idx.max_df
    for cand, f32 in ((512, False), (512, True), (1024, True), (2048, True)):
        s, i, ok, slack = sparse_score_topk_q8_certified(
            packed, offs, pscales, dp, ds,
            jnp.asarray(q_terms), jnp.asarray(q_weights),
            k=100, p_cap=p_cap, candidates=cand, imp_bits=bits,
            doc_terms=dt if f32 else None, doc_w=dw if f32 else None)
        print(f"--- cand={cand} f32_rescore={f32}")
        ok = np.asarray(ok)
        slack = np.asarray(slack)
        s = np.asarray(s)
        print(f"cand={cand}: certified {ok.sum()}/{B}, "
              f"slack median {np.median(slack):.5f}, "
              f"p10 {np.percentile(slack, 10):.5f}, "
              f"p90 {np.percentile(slack, 90):.5f}")
        kth = s[:, 99]
        print(f"  kth score: median {np.median(kth[np.isfinite(kth)]):.4f}; "
              f"#rows with <100 finite: {(~np.isfinite(kth)).sum()}")
        # where negative, how negative vs kth magnitude
        bad = slack < 0
        if bad.any():
            rel = slack[bad] / np.maximum(np.abs(kth[bad]), 1e-9)
            print(f"  uncertified: {bad.sum()}; slack/|kth| median "
                  f"{np.median(rel):.4f}")


if __name__ == "__main__":
    main()
