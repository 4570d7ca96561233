"""Heterogeneous-ensemble benchmark: the reference's actual 5-retriever mix
(BM25 + SPLADE impacts + dense + two BM25→dense rerank views) as ONE
compiled retrieve→QPP→fuse program at NQ scale, on one chip.

Complements bench.py (the 5-dense-view flagship metric): this measures the
mixed sparse+dense workload of reference scripts/02_retrieve.py:98-284.
Writes docs/bench_ensemble.json and prints one JSON line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
from qpp_fusion_rag_tpu.pipeline.ensemble import (
    EnsembleIndexes,
    ensemble_retrieval_step,
)

N_DOCS = 2_621_440
DIM = 768
BATCH = 1024
TOP_K = 100
P_CAP = 2048   # nDCG@10 retention 0.988 (docs/quality_sparse.json)


def main() -> None:
    on_tpu = jax.devices()[0].platform == "tpu"
    n_docs, batch = (N_DOCS, BATCH) if on_tpu else (65_536, 64)
    p_cap = P_CAP if on_tpu else 64

    t0 = time.time()
    bo, bd, bw, _ = zipf_bm25_csr(
        n_docs, vocab_size=100_000, avg_doc_len=30.0, seed=0,
        max_postings=80_000_000 if on_tpu else 2_000_000,
    )
    so, sd, sw, _ = zipf_bm25_csr(
        n_docs, vocab_size=30_000, avg_doc_len=40.0, seed=7,
        max_postings=60_000_000 if on_tpu else 1_500_000,
    )
    print(f"[ensemble] indexes built {time.time()-t0:.0f}s: "
          f"bm25 {len(bd)/1e6:.0f}M, splade {len(sd)/1e6:.0f}M postings",
          file=sys.stderr)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows

    corpus_f = jax.random.normal(k1, (DIM, n_docs), jnp.float32)
    c_int, d_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_f)
    del corpus_f
    corpus_rows = jnp.transpose(c_int)
    jax.block_until_ready(corpus_rows)

    from qpp_fusion_rag_tpu.ops.sparse import pack_postings

    bp, bscale = pack_postings(bd, bw, bo)
    sp, sscale = pack_postings(sd, sw, so)
    idx = EnsembleIndexes(
        bm25_packed=jnp.asarray(bp), bm25_scales=jnp.asarray(bscale),
        bm25_offsets=jnp.asarray(bo.astype(np.int32)),
        splade_packed=jnp.asarray(sp), splade_scales=jnp.asarray(sscale),
        splade_offsets=jnp.asarray(so.astype(np.int32)),
        corpus_int=c_int, corpus_rows=corpus_rows,
        d_scale=d_scale.reshape(1, n_docs),
    )
    bm25_t, bm25_w = zipf_queries(bo, batch, n_terms=8, seed=1)
    splade_t, splade_w = zipf_queries(so, batch, n_terms=16, seed=2)
    q_emb = jax.random.normal(k2, (batch, DIM), jnp.float32)
    proj = jax.random.normal(k3, (2, DIM, DIM), jnp.float32) * 0.05
    tf = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (batch, 1))

    # argv[1] (optional): sparse mode — "q8" (production default:
    # quantized single-key sort, recall@100 0.992 vs exact) | "sort"
    # (exact-dedup pair sort) | an integer N > 0 (sort-free rescore,
    # pool = N*k). All modes use the Pallas DMA window gather on TPU.
    arg = sys.argv[1] if len(sys.argv) > 1 else "q8"
    sparse_candidates = int(arg) if arg.isdigit() else 0
    sparse_mode = arg if not arg.isdigit() else "sort"

    def step():
        return ensemble_retrieval_step(
            idx, bm25_t, bm25_w, splade_t, splade_w, q_emb, proj, tf,
            k=TOP_K, k_out=TOP_K, p_cap=p_cap,
            sparse_candidates=sparse_candidates, sparse_mode=sparse_mode,
        )

    t0 = time.perf_counter()
    out = step()
    _ = np.asarray(out[1])[0, 0]
    print(f"[ensemble] compile+first-run: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    reps = 5 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step()
    _ = np.asarray(out[1])[0, 0]
    dt = (time.perf_counter() - t0) / reps
    qps = batch / dt

    result = {
        "metric": "heterogeneous_ensemble_qps_per_chip",
        "value": round(qps, 1),
        "unit": (f"queries/sec (BM25+SPLADE+dense+2 reranked views, "
                 f"retrieve+qpp+fuse, {n_docs/1e6:.2f}M docs)"),
        "ms_per_batch": round(dt * 1e3, 1),
        "batch": batch, "p_cap": p_cap,
        "sparse_mode": sparse_mode if not sparse_candidates
                       else f"rescore{sparse_candidates}",
        "device": jax.devices()[0].device_kind,
    }
    print(f"[ensemble] {dt*1e3:.1f} ms/batch -> {qps:.0f} q/s", file=sys.stderr)
    if on_tpu:
        with open("/root/repo/docs/bench_ensemble.json", "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
