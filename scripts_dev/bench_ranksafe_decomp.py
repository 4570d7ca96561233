"""Decompose the rank-safe (q8r) ensemble's cost at bench shapes and
measure the round-5 levers (VERDICT r4 item #2): where do the ~78 ms
between q8-presorted (49 ms) and q8r-narrow-presorted (127 ms) go, and
what do sort_ids / tighter pools buy?

Variants (all presorted dual layout, p_cap=2048):
  A q8   pool=0            baseline candidate generation
  B q8   pool=256          + dense pool rescore only
  C q8r c512 pool=0        + sparse rescore only
  D q8r c512 pool=256      current rank-safe config
  E q8r c512 pool=256 sort + ascending-address rescore gather
  F q8r c256 pool=128 sort tighter pools (autotuner-justified sizes)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import sys

sys.path.insert(0, "/root/repo")

from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
from qpp_fusion_rag_tpu.ops.sparse import (
    doc_vector_imp_bits,
    pack_doc_vectors,
    pack_postings_presorted,
    term_scales_from_csr,
)
from qpp_fusion_rag_tpu.pipeline.ensemble import (
    EnsembleIndexes,
    ensemble_retrieval_step,
)

N, D, B, K, P_CAP = 2_621_440, 768, 1024, 100, 2048

t0 = time.time()
bo, bd, bw, _ = zipf_bm25_csr(N, vocab_size=100_000, avg_doc_len=30.0,
                              seed=0, max_postings=80_000_000)
so, sd, sw, _ = zipf_bm25_csr(N, vocab_size=30_000, avg_doc_len=40.0,
                              seed=7, max_postings=60_000_000)
print(f"[decomp] sparse CSRs built {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
bscale = term_scales_from_csr(bw, bo)
sscale = term_scales_from_csr(sw, so)
bpre, bo2, _ = pack_postings_presorted(bd, bw, bo, cap=P_CAP, scales=bscale)
spre, so2, _ = pack_postings_presorted(sd, sw, so, cap=P_CAP, scales=sscale)
imp_bits = doc_vector_imp_bits(len(bo) - 1)
bdp, bds, btd = pack_doc_vectors(bo, bd, bw, N, imp_bits=imp_bits)
sdp, sds, std_ = pack_doc_vectors(so, sd, sw, N, imp_bits=imp_bits)
print(f"[decomp] packed {time.time()-t0:.0f}s  Td bm25={btd} splade={std_}",
      flush=True)

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
corpus_f = jax.random.normal(k1, (D, N), jnp.float32)
c_int, d_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_f)
rows_bf16 = jax.jit(lambda c: jnp.transpose(c).astype(jnp.bfloat16))(corpus_f)
del corpus_f
jax.block_until_ready(rows_bf16)

idx = EnsembleIndexes(
    bm25_packed=jnp.asarray(bpre), bm25_scales=jnp.asarray(bscale),
    bm25_offsets=jnp.asarray(bo2.astype(np.int32)),
    splade_packed=jnp.asarray(spre), splade_scales=jnp.asarray(sscale),
    splade_offsets=jnp.asarray(so2.astype(np.int32)),
    corpus_int=c_int, corpus_rows=rows_bf16,
    d_scale=d_scale.reshape(1, N),
    bm25_doc_packed=jnp.asarray(bdp), bm25_doc_scale=jnp.asarray(bds),
    splade_doc_packed=jnp.asarray(sdp), splade_doc_scale=jnp.asarray(sds),
)
del bd, bw, sd, sw, bpre, spre, bdp, sdp

bm25_t, bm25_w = zipf_queries(bo, B, n_terms=8, seed=1)
splade_t, splade_w = zipf_queries(so, B, n_terms=16, seed=2)
q_emb = jax.random.normal(k2, (B, D), jnp.float32)
proj = jax.random.normal(k3, (2, D, D), jnp.float32) * 0.05
tf = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (B, 1))


def sync(out):
    _ = np.asarray(out[1]).ravel()[0]


def run(reps=5, **kw):
    step = lambda: ensemble_retrieval_step(
        idx, bm25_t, bm25_w, splade_t, splade_w, q_emb, proj, tf,
        k=K, k_out=K, p_cap=P_CAP, doc_imp_bits=imp_bits,
        sparse_presorted=True, **kw)
    t0 = time.time()
    sync(step())
    print(f"    compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step()
    sync(out)
    return (time.perf_counter() - t0) / reps


for label, kw in [
    ("A q8  pool=0          ", dict(sparse_mode="q8")),
    ("B q8  pool=256        ", dict(sparse_mode="q8",
                                    dense_rescore_pool=256)),
    ("C q8r c512 pool=0     ", dict(sparse_mode="q8r",
                                    sparse_candidates=512)),
    ("D q8r c512 pool=256   ", dict(sparse_mode="q8r",
                                    sparse_candidates=512,
                                    dense_rescore_pool=256)),
    ("E q8r c512 p256 sorted", dict(sparse_mode="q8r",
                                    sparse_candidates=512,
                                    dense_rescore_pool=256,
                                    sparse_sort_ids=True)),
    ("F q8r c256 p128 sorted", dict(sparse_mode="q8r",
                                    sparse_candidates=256,
                                    dense_rescore_pool=128,
                                    sparse_sort_ids=True)),
]:
    dt = run(**kw)
    print(f"[decomp] {label}: {dt*1e3:7.1f} ms/batch -> {B/dt:7.0f} q/s",
          flush=True)
