"""bench_ensemble with indexes from the /tmp npz cache (dev iteration).

argv[1] = sparse_candidates (default 0), argv[2] = p_cap (default 2048),
argv[3] = sparse mode: "sort" | "q8" (default sort).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.data.synthetic import zipf_queries
from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
from qpp_fusion_rag_tpu.ops.pallas.window_gather import pad_for_gather
from qpp_fusion_rag_tpu.pipeline.ensemble import (
    EnsembleIndexes,
    ensemble_retrieval_step,
)

N, DIM, B, K = 2_621_440, 768, 1024, 100
cand = int(sys.argv[1]) if len(sys.argv) > 1 else 0
p_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
mode = sys.argv[3] if len(sys.argv) > 3 else "sort"

z = np.load("/tmp/profile_ensemble_idx.npz")
bo, bp, bs = z["bo"], pad_for_gather(z["bp"], 4096), z["bs"]
so, sp, ss = z["so"], pad_for_gather(z["sp"], 4096), z["ss"]
print("indexes loaded", flush=True)

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
corpus_f = jax.random.normal(k1, (DIM, N), jnp.float32)
c_int, d_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_f)
del corpus_f
corpus_rows = jnp.transpose(c_int)
jax.block_until_ready(corpus_rows)

idx = EnsembleIndexes(
    bm25_packed=jnp.asarray(bp), bm25_scales=jnp.asarray(bs),
    bm25_offsets=jnp.asarray(bo.astype(np.int32)),
    splade_packed=jnp.asarray(sp), splade_scales=jnp.asarray(ss),
    splade_offsets=jnp.asarray(so.astype(np.int32)),
    corpus_int=c_int, corpus_rows=corpus_rows,
    d_scale=d_scale.reshape(1, N),
)
bm25_t, bm25_w = zipf_queries(bo, B, n_terms=8, seed=1)
splade_t, splade_w = zipf_queries(so, B, n_terms=16, seed=2)
q_emb = jax.random.normal(k2, (B, DIM), jnp.float32)
proj = jax.random.normal(k3, (2, DIM, DIM), jnp.float32) * 0.05
tf = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (B, 1))


def step():
    return ensemble_retrieval_step(
        idx, bm25_t, bm25_w, splade_t, splade_w, q_emb, proj, tf,
        k=K, k_out=K, p_cap=p_cap, sparse_candidates=cand,
        sparse_mode=mode,
    )


t0 = time.perf_counter()
out = step()
_ = np.asarray(out[1])[0, 0]
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
for _ in range(5):
    out = step()
_ = np.asarray(out[1])[0, 0]
dt = (time.perf_counter() - t0) / 5
print(f"mode={mode} cand={cand} p_cap={p_cap}: "
      f"{dt*1e3:.1f} ms/batch -> {B/dt:.0f} q/s", flush=True)
