"""Virtual-mesh weak scaling: sharded dense+sparse retrieval on 1-8 CPU
devices (corpus grows with the shard count). CPU wall times are only
indicative of collectives overhead, not TPU throughput — the artifact
documents that the sharded path's cost per shard stays flat while total
corpus grows linearly. Appends to docs/bench_scaling.json.
"""
import json
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from qpp_fusion_rag_tpu.parallel.mesh import build_mesh
from qpp_fusion_rag_tpu.parallel.sharded import (
    shard_sparse_csr, sharded_multi_view_topk, sharded_sparse_topk,
)

OUT = "/root/repo/docs/bench_scaling.json"
B, D, R, K = 64, 128, 3, 50
N_PER_SHARD = 65_536
T, DF = 2000, 200

rng = np.random.default_rng(0)
rows = []
for n_shards in (1, 2, 4, 8):
    mesh = build_mesh(1, n_shards, devices=jax.devices()[:n_shards])
    N = N_PER_SHARD * n_shards
    q = rng.standard_normal((B, D)).astype(np.float32)
    proj = (rng.standard_normal((R, D, D)) * 0.1).astype(np.float32)
    corpus = rng.standard_normal((N, D)).astype(np.float32)

    vals, ids = sharded_multi_view_topk(q, proj, corpus, mesh, k=K, chunk=8192)
    np.asarray(vals)
    t0 = time.perf_counter()
    for _ in range(3):
        vals, ids = sharded_multi_view_topk(q, proj, corpus, mesh, k=K, chunk=8192)
    np.asarray(vals)
    dense_ms = (time.perf_counter() - t0) / 3 * 1e3

    # sparse: postings grow with the corpus
    terms = np.repeat(np.arange(T), DF)
    docs = rng.integers(0, N, size=T * DF).astype(np.int32)
    w = rng.uniform(0.1, 2.0, T * DF).astype(np.float32)
    order = np.lexsort((-w, terms))
    docs, w = docs[order], w[order]
    offsets = np.zeros(T + 1, np.int64)
    np.cumsum(np.bincount(terms, minlength=T), out=offsets[1:])
    shards = shard_sparse_csr(offsets, docs, w, n_docs=N, n_shards=n_shards)
    qt = rng.integers(0, T, (B, 8)).astype(np.int32)
    qw = np.ones((B, 8), np.float32)
    s, i = sharded_sparse_topk(qt, qw, *shards, mesh, n_docs=N, k=K, p_cap=DF)
    np.asarray(s)
    t0 = time.perf_counter()
    for _ in range(3):
        s, i = sharded_sparse_topk(qt, qw, *shards, mesh, n_docs=N, k=K, p_cap=DF)
    np.asarray(s)
    sparse_ms = (time.perf_counter() - t0) / 3 * 1e3

    row = {"n_shards": n_shards, "n_docs": N,
           "dense_ms": round(dense_ms, 1), "sparse_ms": round(sparse_ms, 1)}
    print(row)
    rows.append(row)

state = {}
if os.path.exists(OUT):
    state = json.load(open(OUT))
state["virtual_mesh_weak_scaling"] = {
    "note": ("8 virtual CPU devices; corpus grows with shard count "
             "(weak scaling). Flat ms => per-shard work constant, "
             "collectives overhead negligible at k*shards merge size."),
    "batch": B, "rows": rows,
}
with open(OUT, "w") as f:
    json.dump(state, f, indent=1)
print("wrote", OUT)
