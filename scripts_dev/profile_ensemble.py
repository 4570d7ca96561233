"""Per-stage timing of the PRODUCTION heterogeneous ensemble at bench
shapes — the same kernels `ensemble_retrieval_step` composes (q8 sparse,
int8 MXU dense, bf16 rerank, fused QPP + fusion tail), each jitted and
timed separately with arrays passed as arguments (closed-over device
arrays would be folded into the HLO and shipped to the remote compiler).

Stage sum > ensemble total is expected: the single compiled program
overlaps stages and reuses intermediates.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
from qpp_fusion_rag_tpu.ops import fusion as F
from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
from qpp_fusion_rag_tpu.ops.sparse import pack_postings, sparse_score_topk_q8
from qpp_fusion_rag_tpu.pipeline.ensemble import (
    dense_view_topk,
    fuse_tail,
    normalize_qpp_with,
    rerank_candidates,
)
from qpp_fusion_rag_tpu.pipeline.engine import qpp_from_runs

N, D, B, K, P_CAP = 2_621_440, 768, 1024, 100, 2048


def sync(out):
    # host scalar readback: block_until_ready alone does NOT guarantee
    # completion through the remote-execution tunnel (bench.py's sync)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[0]


def timed(fn, *args, reps=5):
    jfn = jax.jit(fn)
    out = jfn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    return out, dt


def report(tag, dt):
    print(f"{tag:42s} {dt*1e3:8.2f} ms  ({B/dt:8.0f} q/s)", flush=True)


def main():
    import os
    t0 = time.time()
    cache = "/tmp/profile_ensemble_idx.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        bo, bp, bs = z["bo"], z["bp"], z["bs"]
        so, sp, ss = z["so"], z["sp"], z["ss"]
    else:
        bo, bd, bw, _ = zipf_bm25_csr(N, vocab_size=100_000,
                                      avg_doc_len=30.0, seed=0,
                                      max_postings=80_000_000)
        so, sd, sw, _ = zipf_bm25_csr(N, vocab_size=30_000,
                                      avg_doc_len=40.0, seed=7,
                                      max_postings=60_000_000)
        bp, bs = pack_postings(bd, bw, bo)
        sp, ss = pack_postings(sd, sw, so)
        del bd, bw, sd, sw
        np.savez(cache, bo=bo, bp=bp, bs=bs, so=so, sp=sp, ss=ss)
    print(f"indexes built {time.time()-t0:.0f}s", flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    corpus_f = jax.random.normal(k1, (D, N), jnp.float32)
    c_int, d_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_f)
    corpus_rows = jnp.transpose(c_int)
    del corpus_f
    d_scale = d_scale.reshape(1, N)
    jax.block_until_ready(corpus_rows)

    d_bp, d_bs = jnp.asarray(bp), jnp.asarray(bs)
    d_bo = jnp.asarray(bo.astype(np.int32))
    d_sp, d_ss = jnp.asarray(sp), jnp.asarray(ss)
    d_so = jnp.asarray(so.astype(np.int32))
    bm25_t, bm25_w = zipf_queries(bo, B, n_terms=8, seed=1)
    splade_t, splade_w = zipf_queries(so, B, n_terms=16, seed=2)
    q_emb = jax.random.normal(k2, (B, D), jnp.float32)
    proj = jax.random.normal(k3, (2, D, D), jnp.float32) * 0.05
    tf = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (B, 1))

    def bm25_view(p, o, s, t, w):
        return sparse_score_topk_q8(p, o, s, t, w, k=K, p_cap=P_CAP)

    (bm25_s, bm25_i), dt = timed(bm25_view, d_bp, d_bo, d_bs, bm25_t, bm25_w)
    report(f"bm25 q8 (8 terms, p_cap {P_CAP})", dt)

    (splade_s, splade_i), dt = timed(bm25_view, d_sp, d_so, d_ss,
                                     splade_t, splade_w)
    report(f"splade q8 (16 terms, p_cap {P_CAP})", dt)

    def dense(q, ci, ds):
        return dense_view_topk(q, ci, ds, K)

    (dense_s, dense_i), dt = timed(dense, q_emb, c_int, d_scale)
    report("dense int8 MXU + group top-k", dt)

    def rerank(q, pj, bi, rows, ds):
        qv = jnp.einsum("bd,vdw->vbw", q.astype(jnp.float32), pj)
        return rerank_candidates(qv, bi, rows, ds)

    (rr_s, rr_i), dt = timed(rerank, q_emb, proj, bm25_i, corpus_rows,
                             d_scale)
    report("2x rerank (proj + row gather + dot)", dt)

    vals = jnp.stack([bm25_s, splade_s, dense_s, rr_s[0], rr_s[1]])
    ids = jnp.stack([bm25_i, splade_i, dense_i, rr_i[0], rr_i[1]])

    def qpp_fuse(v, i, t):
        qpp_raw = qpp_from_runs(v, i, t, normalize=False)
        qpp = normalize_qpp_with(qpp_raw, None)
        fi, fs = fuse_tail(v, i, qpp, F.COMBSUM, 5, K, None)
        return fi, fs, qpp

    _, dt = timed(qpp_fuse, vals, ids, tf)
    report("qpp (13 stats x 5) + weighted fuse", dt)


if __name__ == "__main__":
    main()
