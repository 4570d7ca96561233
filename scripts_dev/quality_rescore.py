"""Rank-safe sparse quality: q8 candidate gen + exact full-contribution
rescore vs full-depth exact truth (same harness as quality_q8.py).

Sweeps (p_cap, candidate-pool size) for sparse_score_topk_q8_rescored and
compares against the plain q8 kernel at the production config. The gate
(VERDICT round-2 task 3): recall@10 >= 0.99 vs full-depth exact at
<= 1.25x the plain-q8 sparse-view latency. Writes docs/quality_rescore.json.
"""
import json
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from qpp_fusion_rag_tpu.data.synthetic import (
    exact_sparse_scores_host,
    zipf_bm25_csr,
    zipf_queries,
)
from qpp_fusion_rag_tpu.ops.sparse import (
    doc_vector_imp_bits,
    pack_doc_vectors,
    pack_postings,
    sparse_score_topk_q8,
    sparse_score_topk_q8_rescored,
)

N_DOCS = 1_000_000
B, TQ, K = 256, 8, 100

t0 = time.time()
offsets, docs, weights, doc_lens = zipf_bm25_csr(N_DOCS, seed=0)
print(f"index: {len(docs)/1e6:.1f}M postings, built {time.time()-t0:.0f}s",
      flush=True)
q_terms, q_weights = zipf_queries(offsets, B, n_terms=TQ)

t0 = time.time()
ex_s, ex_i = exact_sparse_scores_host(
    offsets, docs, weights, q_terms, q_weights, N_DOCS, k=K)
print(f"exact host scoring: {time.time()-t0:.0f}s", flush=True)

packed, scales = pack_postings(docs, weights, offsets)
IMP_BITS = doc_vector_imp_bits(len(offsets) - 1)
t0 = time.time()
doc_packed, doc_scale, td = pack_doc_vectors(
    offsets, docs, weights, N_DOCS, imp_bits=IMP_BITS)
doc_packed64, doc_scale64, td64 = pack_doc_vectors(
    offsets, docs, weights, N_DOCS, doc_cap=64, imp_bits=IMP_BITS)
print(f"doc vectors: Td={td}, imp_bits={IMP_BITS}, "
      f"{doc_packed.nbytes/1e6:.0f} MB, built {time.time()-t0:.0f}s",
      flush=True)

d_p = jnp.asarray(packed)
d_off = jnp.asarray(offsets.astype(np.int32))
d_s = jnp.asarray(scales)
d_dp = jnp.asarray(doc_packed)
d_ds = jnp.asarray(doc_scale)
d_dp64 = jnp.asarray(doc_packed64)
d_ds64 = jnp.asarray(doc_scale64)
d_qt, d_qw = jnp.asarray(q_terms), jnp.asarray(q_weights)


def dcg(gains):
    return float(np.sum(gains / np.log2(np.arange(2, gains.shape[-1] + 2))))


def retention(got_ids):
    rets = []
    for i in range(B):
        gain = {int(d): float(s)
                for d, s in zip(ex_i[i], ex_s[i]) if d >= 0}
        g_a = np.array([gain.get(int(d), 0.0) for d in got_ids[i, :10]])
        g_i = np.array([gain.get(int(d), 0.0) for d in ex_i[i, :10]])
        denom = dcg(g_i)
        rets.append(dcg(g_a) / denom if denom > 0 else 1.0)
    return float(np.mean(rets))


def measure(fn, tag, p_cap, extra=None):
    scores, ids = fn()
    ids_np = np.asarray(ids)
    t0 = time.perf_counter()
    for _ in range(5):
        scores, ids = fn()
    _ = np.asarray(ids)[0, 0]
    dt = (time.perf_counter() - t0) / 5
    ids_np = np.asarray(ids)
    row = {
        "kernel": tag, "p_cap": p_cap,
        "recall@10": round(float(np.mean(
            [len(set(ids_np[i, :10]) & set(ex_i[i, :10])) / 10
             for i in range(B)])), 4),
        "recall@100": round(float(np.mean(
            [len(set(ids_np[i]) & set(ex_i[i])) / 100
             for i in range(B)])), 4),
        "ndcg@10_retention": round(retention(ids_np), 4),
        "ms_per_batch": round(dt * 1e3, 2),
    }
    if extra:
        row.update(extra)
    print(row, flush=True)
    return row


results = []
for p_cap in (2048, 4096):
    results.append(measure(
        lambda: sparse_score_topk_q8(
            d_p, d_off, d_s, d_qt, d_qw, k=K, p_cap=p_cap, exact_topk=False),
        "q8", p_cap))
    for cand in (512, 1024, 2048):
        results.append(measure(
            lambda: sparse_score_topk_q8_rescored(
                d_p, d_off, d_s, d_dp, d_ds, d_qt, d_qw,
                k=K, p_cap=p_cap, candidates=cand, imp_bits=IMP_BITS),
            "q8_rescored", p_cap,
            {"candidates": cand, "imp_bits": IMP_BITS}))
    results.append(measure(
        lambda: sparse_score_topk_q8_rescored(
            d_p, d_off, d_s, d_dp64, d_ds64, d_qt, d_qw,
            k=K, p_cap=p_cap, candidates=1024, imp_bits=IMP_BITS),
        "q8_rescored_cap64", p_cap,
        {"candidates": 1024, "imp_bits": IMP_BITS, "doc_cap": 64}))

out = {
    "n_docs": N_DOCS, "postings": int(len(docs)), "batch": B,
    "query_terms": TQ, "doc_vector_td": td, "imp_bits": IMP_BITS,
    "platform": jax.devices()[0].device_kind,
    "truth": "exact full-depth host scoring (f64 sums)",
    "sweep": results,
}
with open("/root/repo/docs/quality_rescore.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote docs/quality_rescore.json")
