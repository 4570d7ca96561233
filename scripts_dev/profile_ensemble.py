"""Per-component timing of the heterogeneous ensemble at bench shapes."""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
from qpp_fusion_rag_tpu.ops.sparse import pack_postings, sparse_score_topk_packed
from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
    pallas_dense_topk_int8, quantize_rows,
)
from qpp_fusion_rag_tpu.pipeline.ensemble import rerank_candidates
from qpp_fusion_rag_tpu.pipeline.engine import qpp_from_runs, weight_and_fuse
from qpp_fusion_rag_tpu.ops import fusion as F

N, D, B, K, P_CAP = 2_621_440, 768, 1024, 100, 2048

import os

CACHE = "/tmp/profile_ensemble_idx.npz"
if os.path.exists(CACHE):
    z = np.load(CACHE)
    bo, bp, bs = z["bo"], z["bp"], z["bs"]
    so, sp, ss = z["so"], z["sp"], z["ss"]
else:
    bo, bd, bw, _ = zipf_bm25_csr(N, vocab_size=100_000, avg_doc_len=30.0,
                                  seed=0, max_postings=80_000_000)
    so, sd, sw, _ = zipf_bm25_csr(N, vocab_size=30_000, avg_doc_len=40.0,
                                  seed=7, max_postings=60_000_000)
    bp, bs = pack_postings(bd, bw, bo)
    sp, ss = pack_postings(sd, sw, so)
    del bd, bw, sd, sw
    np.savez(CACHE, bo=bo, bp=bp, bs=bs, so=so, sp=sp, ss=ss)
print("indexes ready", flush=True)

key = jax.random.PRNGKey(0)
corpus_f = jax.random.normal(key, (D, N), jnp.float32)
c_int, d_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_f)
del corpus_f
rows = jnp.transpose(c_int)
d_scale = d_scale.reshape(1, N)

bm25_t, bm25_w = zipf_queries(bo, B, n_terms=8, seed=1)
spl_t, spl_w = zipf_queries(so, B, n_terms=16, seed=2)
q_emb = jax.random.normal(key, (B, D), jnp.float32)
tf = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (B, 1))

d_bo = jnp.asarray(bo.astype(np.int32)); d_so = jnp.asarray(so.astype(np.int32))
d_bp = jnp.asarray(bp); d_sp = jnp.asarray(sp)
d_bs = jnp.asarray(bs); d_ss = jnp.asarray(ss)


def bench(fn, *args, reps=5):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


bm25 = jax.jit(lambda: sparse_score_topk_packed(
    d_bp, d_bo, d_bs, bm25_t, bm25_w, k=K, p_cap=P_CAP, exact_topk=False))
spl = jax.jit(lambda: sparse_score_topk_packed(
    d_sp, d_so, d_ss, spl_t, spl_w, k=K, p_cap=P_CAP, exact_topk=False))
dense = jax.jit(lambda q: pallas_dense_topk_int8(q, c_int, d_scale, k=K))

print(f"bm25 (8 terms, p_cap {P_CAP}):   {bench(bm25)*1e3:7.1f} ms", flush=True)
print(f"splade (16 terms, p_cap {P_CAP}): {bench(spl)*1e3:7.1f} ms", flush=True)
print(f"dense int8 (B={B}):              {bench(dense, q_emb)*1e3:7.1f} ms", flush=True)

bm_s, bm_i = bm25()
rr = jax.jit(lambda q, c: rerank_candidates(q, c, rows, d_scale))
print(f"rerank 1 view (B*{K} gather):     {bench(rr, q_emb, bm_i)*1e3:7.1f} ms", flush=True)

dn_s, dn_i = dense(q_emb)
vals = jnp.stack([bm_s, bm_s, dn_s, bm_s, bm_s])
ids = jnp.stack([bm_i, bm_i, dn_i, bm_i, bm_i])


@jax.jit
def tail(vals, ids, tf):
    qpp = qpp_from_runs(vals, ids, tf)
    norm = F._row_minmax(vals, ids >= 0, fill=-jnp.inf)
    return weight_and_fuse(ids, norm, qpp[..., 5], k_out=K)

print(f"qpp+fuse tail:                   {bench(tail, vals, ids, tf)*1e3:7.1f} ms", flush=True)

# lower p_cap points for the sparse views
for pc in (512, 1024):
    f = jax.jit(lambda: sparse_score_topk_packed(
        d_sp, d_so, d_ss, spl_t, spl_w, k=K, p_cap=pc, exact_topk=False))
    print(f"splade p_cap={pc}:              {bench(f)*1e3:7.1f} ms", flush=True)

# sort-free rescore variants (measured SLOWER at ensemble scale: the
# [B, pool, M] match materializes; kept for the record)
from qpp_fusion_rag_tpu.ops.sparse import sparse_rescore_topk_packed
for cand in (4, 8):
    f = jax.jit(lambda c=cand: sparse_rescore_topk_packed(
        d_bp, d_bo, d_bs, bm25_t, bm25_w, k=K, p_cap=P_CAP, candidates=c))
    print(f"bm25 rescore cand={cand}:          {bench(f)*1e3:7.1f} ms", flush=True)
