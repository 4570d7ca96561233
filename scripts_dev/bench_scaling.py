"""Scaling + latency observability artifacts (VERDICT r1 item 8).

Measures on the real chip: batch-size scaling, corpus-size scaling, and
serve-path latency percentiles for the int8 flagship step. Appends each
row to docs/bench_scaling.json as it lands (timeout-safe).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
from qpp_fusion_rag_tpu.pipeline.engine import fused_retrieval_step

OUT = "/root/repo/docs/bench_scaling.json"
DIM, R, K = 768, 5, 100
N_FULL = 2_621_440

state = {"device": jax.devices()[0].device_kind,
         "measurement": ("SYNCHRONOUS per-request latency (each rep "
                         "round-trips the host incl. dispatch-tunnel RTT); "
                         "bench.py pipelines steps -> higher throughput"),
         "batch_scaling": [], "corpus_scaling": [], "latency": []}


def save():
    with open(OUT, "w") as f:
        json.dump(state, f, indent=1)


key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
corpus_f = jax.random.normal(k1, (DIM, N_FULL), jnp.float32)
c_int_full, d_scale_full = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_f)
del corpus_f
view_proj = jax.random.normal(k3, (R, DIM, DIM), jnp.float32) * 0.05
jax.block_until_ready(c_int_full)


def run(batch, n_docs, reps=5, latencies=False):
    c = c_int_full[:, :n_docs]
    s = d_scale_full.reshape(1, -1)[:, :n_docs]
    q = jax.random.normal(k2, (batch, DIM), jnp.float32)
    tf = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (batch, 1))

    def step():
        out = fused_retrieval_step(q, view_proj, c, tf, k=K, k_out=K,
                                   corpus_scale=s)
        _ = np.asarray(out[1])[0, 0]

    step()  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    times = np.array(times) * 1e3
    row = {"batch": batch, "n_docs": n_docs,
           "ms_per_batch": round(float(np.median(times)), 1),
           "qps": round(batch / float(np.median(times)) * 1e3, 0)}
    if latencies:
        row.update({
            "p50_ms": round(float(np.percentile(times, 50)), 1),
            "p95_ms": round(float(np.percentile(times, 95)), 1),
            "p99_ms": round(float(np.percentile(times, 99)), 1),
            "reps": reps,
        })
    return row


for batch in (128, 256, 512, 1024, 2048):
    row = run(batch, N_FULL)
    print("batch", row)
    state["batch_scaling"].append(row)
    save()

for n_docs in (655_360, 1_310_720, 2_621_440):
    row = run(1024, n_docs)
    print("corpus", row)
    state["corpus_scaling"].append(row)
    save()

# serve-path latency distribution (per-request latency incl. tunnel RTT)
for batch in (128, 1024):
    row = run(batch, N_FULL, reps=50, latencies=True)
    print("latency", row)
    state["latency"].append(row)
    save()

# heterogeneous-ensemble serving latency (VERDICT r2 task 6: batch-128 row)
del c_int_full, d_scale_full
import gc

gc.collect()
from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
from qpp_fusion_rag_tpu.ops.sparse import pack_postings
from qpp_fusion_rag_tpu.pipeline.ensemble import (
    EnsembleIndexes,
    ensemble_retrieval_step,
)

bo, bd, bw, _ = zipf_bm25_csr(N_FULL, vocab_size=100_000, avg_doc_len=30.0,
                              seed=0, max_postings=80_000_000)
so, sd, sw, _ = zipf_bm25_csr(N_FULL, vocab_size=30_000, avg_doc_len=40.0,
                              seed=7, max_postings=60_000_000)
corpus_f = jax.random.normal(k1, (DIM, N_FULL), jnp.float32)
c_int, d_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_f)
del corpus_f
bp, bscale = pack_postings(bd, bw, bo)
sp, sscale = pack_postings(sd, sw, so)
idx = EnsembleIndexes(
    bm25_packed=jnp.asarray(bp), bm25_scales=jnp.asarray(bscale),
    bm25_offsets=jnp.asarray(bo.astype(np.int32)),
    splade_packed=jnp.asarray(sp), splade_scales=jnp.asarray(sscale),
    splade_offsets=jnp.asarray(so.astype(np.int32)),
    corpus_int=c_int, corpus_rows=jnp.transpose(c_int),
    d_scale=d_scale.reshape(1, N_FULL),
)
del bd, bw, sd, sw, bp, sp

state["ensemble_latency"] = []
for batch in (128, 1024):
    bt, bqw = zipf_queries(bo, batch, n_terms=8, seed=1)
    st, sqw = zipf_queries(so, batch, n_terms=16, seed=2)
    qe = jax.random.normal(k2, (batch, DIM), jnp.float32)
    proj = jax.random.normal(k3, (2, DIM, DIM), jnp.float32) * 0.05
    tfeat = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (batch, 1))

    def estep():
        out = ensemble_retrieval_step(
            idx, bt, bqw, st, sqw, qe, proj, tfeat,
            k=K, k_out=K, p_cap=2048, sparse_mode="q8")
        _ = np.asarray(out[1])[0, 0]

    estep()
    times = []
    for _ in range(30):
        t0 = time.perf_counter()
        estep()
        times.append(time.perf_counter() - t0)
    times = np.array(times) * 1e3
    row = {
        "batch": batch, "n_docs": N_FULL, "sparse_mode": "q8",
        "p50_ms": round(float(np.percentile(times, 50)), 1),
        "p95_ms": round(float(np.percentile(times, 95)), 1),
        "p99_ms": round(float(np.percentile(times, 99)), 1),
        "qps": round(batch / float(np.median(times)) * 1e3, 0),
        "reps": 30,
    }
    print("ensemble_latency", row)
    state["ensemble_latency"].append(row)
    save()

print("wrote", OUT)
