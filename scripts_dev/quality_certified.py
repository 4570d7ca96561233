"""Measure the certified rank-exact sparse mode at bench scale.

For each (p_cap, candidates) config: certified fraction, slack
distribution, and latency of sparse_score_topk_q8_certified vs the
uncertified q8r kernel — plus the implied amortized cost of
SparseIndex.search_certified-style escalation (certified fraction at
round 0, escalated remainder at 4x p_cap).

Writes docs/quality_certified.json. Run on TPU (CPU works, slower).
"""

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
from qpp_fusion_rag_tpu.ops.sparse import (
    doc_vector_imp_bits,
    pack_doc_vectors,
    pack_doc_vectors_exact,
    pack_postings,
    sparse_score_topk_q8_certified,
    sparse_score_topk_q8_rescored,
)

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")

ON_TPU = jax.default_backend() == "tpu"
N_DOCS = 1_000_000 if ON_TPU else 50_000
BATCH = 256 if ON_TPU else 32
K = 100


def _sync(out):
    # host scalar readback: block_until_ready alone does NOT guarantee
    # completion through the remote-execution tunnel (see bench.py)
    import numpy as _np
    _ = _np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def timed(fn, reps=3):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _sync(out)
    return out, (time.perf_counter() - t0) / reps


def main():
    offsets, docs, weights, _ = zipf_bm25_csr(
        N_DOCS, vocab_size=100_000, avg_doc_len=30.0, seed=0,
        max_postings=50_000_000 if ON_TPU else 1_500_000)
    print(f"index: {len(docs)/1e6:.1f}M postings, max_df="
          f"{int(np.diff(offsets).max())}")
    packed, scales = pack_postings(docs, weights, offsets)
    bits = doc_vector_imp_bits(len(offsets) - 1)
    dp, ds, _ = pack_doc_vectors(offsets, docs, weights, N_DOCS,
                                 imp_bits=bits)
    dt_, dw_, _ = pack_doc_vectors_exact(offsets, docs, weights, N_DOCS)
    packed, scales = jnp.asarray(packed), jnp.asarray(scales)
    offs = jnp.asarray(offsets.astype(np.int32))
    dp, ds = jnp.asarray(dp), jnp.asarray(ds)
    dt_, dw_ = jnp.asarray(dt_), jnp.asarray(dw_)
    qt, qw = zipf_queries(offsets, BATCH, n_terms=8, seed=1)
    qt, qw = jnp.asarray(qt), jnp.asarray(qw)

    results = {"n_docs": N_DOCS, "batch": BATCH, "k": K, "imp_bits": bits,
               "platform": jax.devices()[0].device_kind, "configs": []}
    for p_cap in ([1024, 2048, 4096] if ON_TPU else [256]):
        for cand, f32 in ([(1024, False), (1024, True), (2048, True)]
                          if ON_TPU else [(256, True)]):
            (s, i, ok, slack), dt_c = timed(
                lambda: sparse_score_topk_q8_certified(
                    packed, offs, scales, dp, ds, qt, qw,
                    k=K, p_cap=p_cap, candidates=cand, imp_bits=bits,
                    doc_terms=dt_ if f32 else None,
                    doc_w=dw_ if f32 else None))
            _, dt_r = timed(
                lambda: sparse_score_topk_q8_rescored(
                    packed, offs, scales, dp, ds, qt, qw,
                    k=K, p_cap=p_cap, candidates=cand, imp_bits=bits))
            ok = np.asarray(ok)
            slack = np.asarray(slack)
            frac = float(ok.mean())
            # amortized escalation: uncertified rerun at 4x p_cap (approx
            # 4x window cost) — upper bound on search_certified round-1
            amortized = dt_c + (1 - frac) * 4 * dt_c
            row = {
                "p_cap": p_cap, "candidates": cand,
                "f32_rescore": f32,
                "certified_frac": round(frac, 4),
                "slack_median": round(float(np.median(slack[ok])), 3)
                if ok.any() else None,
                "ms_certified": round(dt_c * 1e3, 2),
                "ms_q8r": round(dt_r * 1e3, 2),
                "overhead_vs_q8r": round(dt_c / dt_r, 3),
                "ms_amortized_escalation": round(amortized * 1e3, 2),
                "qps_certified": round(BATCH / dt_c, 1),
            }
            results["configs"].append(row)
            print(row)

    out = Path(__file__).resolve().parent.parent / "docs" / "quality_certified.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
