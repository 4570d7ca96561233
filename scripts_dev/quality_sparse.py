"""Sparse p_cap truncation quality sweep on a Zipfian-realistic index.

Builds a 1M-doc BM25 impact index with real-text posting statistics,
scores 256 queries exactly on the host (full-depth truth), then sweeps
the device kernel's p_cap and measures recall@{10,100}, nDCG@10
retention (gains = exact scores), and q/s. Writes docs/quality_sparse.json.
"""
import json
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.data.synthetic import (
    exact_sparse_scores_host, zipf_bm25_csr, zipf_queries,
)
from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk

N_DOCS = 1_000_000
B, TQ, K = 256, 8, 100

t0 = time.time()
offsets, docs, weights, doc_lens = zipf_bm25_csr(N_DOCS, seed=0)
print(f"index: {len(docs)/1e6:.1f}M postings, max_df={int(np.diff(offsets).max())}, "
      f"built {time.time()-t0:.1f}s")
q_terms, q_weights = zipf_queries(offsets, B, n_terms=TQ)

t0 = time.time()
ex_s, ex_i = exact_sparse_scores_host(offsets, docs, weights, q_terms, q_weights, N_DOCS, k=K)
print(f"exact host scoring: {time.time()-t0:.1f}s")

import jax.numpy as jnp

on_tpu = jax.devices()[0].platform == "tpu"
d_docs = jnp.asarray(docs)
d_w = jnp.asarray(weights)
# offsets as int32 is safe here (<2.1B postings)
d_off = jnp.asarray(offsets.astype(np.int32))
d_qt = jnp.asarray(q_terms)
d_qw = jnp.asarray(q_weights)


def dcg(gains):
    return float(np.sum(gains / np.log2(np.arange(2, gains.shape[-1] + 2))))


def ndcg10_retention(got_ids, exact_ids, exact_scores):
    """DCG@10 of the approx ranking with gains = exact scores, / ideal."""
    rets = []
    for i in range(B):
        gain = {int(d): float(s) for d, s in zip(exact_ids[i], exact_scores[i]) if d >= 0}
        g_approx = np.array([gain.get(int(d), 0.0) for d in got_ids[i, :10]])
        g_ideal = np.array([gain.get(int(d), 0.0) for d in exact_ids[i, :10]])
        denom = dcg(g_ideal)
        rets.append(dcg(g_approx) / denom if denom > 0 else 1.0)
    return float(np.mean(rets))


results = []
for p_cap in [256, 512, 1024, 2048, 4096, 8192, 16384]:
    scores, ids = sparse_score_topk(d_docs, d_w, d_off, d_qt, d_qw, k=K, p_cap=p_cap)
    ids_np = np.asarray(ids)
    _ = ids_np[0, 0]
    # timing
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        scores, ids = sparse_score_topk(d_docs, d_w, d_off, d_qt, d_qw, k=K, p_cap=p_cap)
    _ = np.asarray(ids)[0, 0]
    dt = (time.perf_counter() - t0) / reps
    ids_np = np.asarray(ids)
    r10 = np.mean([len(set(ids_np[i, :10]) & set(ex_i[i, :10])) / 10 for i in range(B)])
    r100 = np.mean([len(set(ids_np[i]) & set(ex_i[i])) / 100 for i in range(B)])
    nd = ndcg10_retention(ids_np, ex_i, ex_s)
    row = {
        "p_cap": p_cap, "recall@10": round(float(r10), 4),
        "recall@100": round(float(r100), 4),
        "ndcg@10_retention": round(nd, 4),
        "ms_per_batch": round(dt * 1e3, 2), "qps": round(B / dt, 0),
    }
    print(row)
    results.append(row)

out = {
    "n_docs": N_DOCS, "postings": int(len(docs)), "batch": B,
    "query_terms": TQ, "platform": jax.devices()[0].device_kind,
    "sweep": results,
}
with open("/root/repo/docs/quality_sparse.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote docs/quality_sparse.json")
