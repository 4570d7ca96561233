"""Heterogeneous-ensemble A/B at bench shapes: plain q8/q8r layouts vs
the presorted dual layout (pack_postings_presorted) and the sort_ids
rescore gather — the round-3 candidates for flipping bench.py defaults.

Builds the same synthetic indexes as bench.py (2.62M docs, 100k/30k
vocab) and times ensemble_retrieval_step under each config.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
from qpp_fusion_rag_tpu.ops.sparse import (
    doc_vector_imp_bits,
    pack_doc_vectors,
    pack_postings,
    pack_postings_presorted,
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
print(f"[ab] sparse CSRs built {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
bp, bscale = pack_postings(bd, bw, bo)
sp, sscale = pack_postings(sd, sw, so)
bpre, bo2, _ = pack_postings_presorted(bd, bw, bo, cap=P_CAP, scales=bscale)
spre, so2, _ = pack_postings_presorted(sd, sw, so, cap=P_CAP, scales=sscale)
imp_bits = doc_vector_imp_bits(len(bo) - 1)
bdp, bds, _ = pack_doc_vectors(bo, bd, bw, N, imp_bits=imp_bits)
sdp, sds, _ = pack_doc_vectors(so, sd, sw, N, imp_bits=imp_bits)
print(f"[ab] packed layouts built {time.time()-t0:.0f}s "
      f"(presorted bm25 {bpre.nbytes/1e6:.0f} MB vs {bp.nbytes/1e6:.0f}; "
      f"splade {spre.nbytes/1e6:.0f} vs {sp.nbytes/1e6:.0f})", flush=True)

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
corpus_f = jax.random.normal(k1, (D, N), jnp.float32)
c_int, d_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_f)
rows_bf16 = jax.jit(lambda c: jnp.transpose(c).astype(jnp.bfloat16))(corpus_f)
del corpus_f
corpus_rows = jnp.transpose(c_int)
jax.block_until_ready(corpus_rows)

common = dict(
    corpus_int=c_int, corpus_rows=corpus_rows,
    d_scale=d_scale.reshape(1, N),
    bm25_doc_packed=jnp.asarray(bdp), bm25_doc_scale=jnp.asarray(bds),
    splade_doc_packed=jnp.asarray(sdp), splade_doc_scale=jnp.asarray(sds),
)
idx_plain = EnsembleIndexes(
    bm25_packed=jnp.asarray(bp), bm25_scales=jnp.asarray(bscale),
    bm25_offsets=jnp.asarray(bo.astype(np.int32)),
    splade_packed=jnp.asarray(sp), splade_scales=jnp.asarray(sscale),
    splade_offsets=jnp.asarray(so.astype(np.int32)), **common)
idx_pre = EnsembleIndexes(
    bm25_packed=jnp.asarray(bpre), bm25_scales=jnp.asarray(bscale),
    bm25_offsets=jnp.asarray(bo2.astype(np.int32)),
    splade_packed=jnp.asarray(spre), splade_scales=jnp.asarray(sscale),
    splade_offsets=jnp.asarray(so2.astype(np.int32)), **common)
del bd, bw, sd, sw, bp, sp, bpre, spre, bdp, sdp

bm25_t, bm25_w = zipf_queries(bo, B, n_terms=8, seed=1)
splade_t, splade_w = zipf_queries(so, B, n_terms=16, seed=2)
q_emb = jax.random.normal(k2, (B, D), jnp.float32)
proj = jax.random.normal(k3, (2, D, D), jnp.float32) * 0.05
tf = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (B, 1))


def sync(out):
    _ = np.asarray(out[1]).ravel()[0]


def run(idx, reps=5, **kw):
    step = lambda: ensemble_retrieval_step(
        idx, bm25_t, bm25_w, splade_t, splade_w, q_emb, proj, tf,
        k=K, k_out=K, p_cap=P_CAP, doc_imp_bits=imp_bits, **kw)
    t0 = time.time()
    sync(step())
    print(f"    compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step()
    sync(out)
    return (time.perf_counter() - t0) / reps


for label, idx, kw in [
    ("q8 plain        ", idx_plain, dict(sparse_mode="q8")),
    ("q8 presorted    ", idx_pre, dict(sparse_mode="q8",
                                       sparse_presorted=True)),
    ("q8r plain       ", idx_plain, dict(sparse_mode="q8r",
                                         sparse_candidates=1024,
                                         dense_rescore_pool=512)),
    ("q8r presorted   ", idx_pre, dict(sparse_mode="q8r",
                                       sparse_candidates=1024,
                                       sparse_presorted=True,
                                       dense_rescore_pool=512)),
    # narrow pools, tuned on the 5,183-doc REAL SciFact index
    # (docs/quality_real_scifact.json, docs/autotune_scifact.json) —
    # included here only to measure their speed at bench scale; NOT
    # shown rank-safe for this 2.62M-doc synthetic corpus
    ("q8r narrow plain", idx_plain, dict(sparse_mode="q8r",
                                         sparse_candidates=512,
                                         dense_rescore_pool=256)),
    ("q8r narrow pre  ", idx_pre, dict(sparse_mode="q8r",
                                       sparse_candidates=512,
                                       sparse_presorted=True,
                                       dense_rescore_pool=256)),
]:
    dt = run(idx, **kw)
    print(f"[ab] {label}: {dt*1e3:7.1f} ms/batch -> {B/dt:7.0f} q/s",
          flush=True)
