"""Stage-level decomposition of the rank-safe sparse path at bench
shapes (round-5 item #2 follow-up to bench_ranksafe_decomp.py): time
each stage of the q8r pipeline — windowed row sums, bitonic pool,
doc-vector rescore — per view, on the real chip, to aim the kernel work
at the actual bottleneck. Caches the packed bench index under
cache/benchdata/ so reruns skip the ~9 min host-side build.

Run: python scripts_dev/bench_sparse_stages.py
"""
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import sys

sys.path.insert(0, "/root/repo")

from qpp_fusion_rag_tpu.data.synthetic import (
    CALIBRATED_LOGNORMAL_SIGMA,
    CALIBRATED_ZIPF_A_BM25,
    CALIBRATED_ZIPF_A_SPLADE,
    zipf_bm25_csr,
    zipf_queries,
)

N, B, K, P_CAP = 2_621_440, 1024, 100, 2048
CACHE = Path("/root/repo/cache/benchdata")


def build_view(name, vocab, avg_len, seed, max_post, n_terms_q, q_seed,
               zipf_a):
    from qpp_fusion_rag_tpu.ops.sparse import (
        doc_vector_imp_bits,
        pack_doc_vectors,
        pack_postings_presorted,
        term_scales_from_csr,
    )

    # v2: doc vectors capped at one (8, 128) tile + tail bounds (the
    # production rank-safe layout — halves the rescore gather cost)
    f = CACHE / f"{name}_v2.npz"
    if f.exists():
        d = np.load(f)
        return {k: d[k] for k in d.files}
    t0 = time.time()
    o, dd, w, _ = zipf_bm25_csr(N, vocab_size=vocab, avg_doc_len=avg_len,
                                seed=seed, max_postings=max_post,
                                zipf_a=zipf_a,
                                lognormal_sigma=CALIBRATED_LOGNORMAL_SIGMA)
    scale = term_scales_from_csr(w, o)
    pre, o2, _ = pack_postings_presorted(dd, w, o, cap=P_CAP, scales=scale)
    imp_bits = doc_vector_imp_bits(len(o) - 1)
    dp, ds, td, tail = pack_doc_vectors(o, dd, w, N, imp_bits=imp_bits,
                                        doc_cap=128, return_tail=True)
    qt, qw = zipf_queries(o, B, n_terms=n_terms_q, seed=q_seed)
    out = dict(packed=pre, offsets=o2.astype(np.int32), scales=scale,
               doc_packed=dp, doc_scale=ds, tail=tail, qt=np.asarray(qt),
               qw=np.asarray(qw), imp_bits=np.int32(imp_bits),
               td=np.int32(td))
    CACHE.mkdir(parents=True, exist_ok=True)
    np.savez(f, **out)
    print(f"[stages] built {name} in {time.time()-t0:.0f}s (Td={td}, "
          f"{(tail > 0).mean()*100:.2f}% docs truncated)", flush=True)
    return out


def sync(out):
    """Force completion via a host readback of ONE element —
    block_until_ready can return early through the remote-TPU tunnel,
    and fetching a whole output leaf would time the ~64 MB/s tunnel
    instead of the kernel (slice down on device first)."""
    x = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jnp.ravel(x)[0])


def timed(fn, reps=10):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from functools import partial

    from qpp_fusion_rag_tpu.ops.sparse import (
        _bitonic_pool,
        _q8_row_sums,
        sparse_exact_rescore,
        sparse_score_topk_q8_rescored,
    )

    views = {
        "bm25": build_view("bm25", 100_000, 30.0, 0, 80_000_000, 8, 1,
                           CALIBRATED_ZIPF_A_BM25),
        "splade": build_view("splade", 30_000, 40.0, 7, 60_000_000, 16, 2,
                             CALIBRATED_ZIPF_A_SPLADE),
    }
    for name, v in views.items():
        packed = jnp.asarray(v["packed"])
        offsets = jnp.asarray(v["offsets"])
        scales = jnp.asarray(v["scales"])
        dp = jnp.asarray(v["doc_packed"])
        ds = jnp.asarray(v["doc_scale"])
        qt, qw = jnp.asarray(v["qt"]), jnp.asarray(v["qw"])
        imp_bits = int(v["imp_bits"])
        print(f"== {name}: Td={int(v['td'])} M={qt.shape[1]*P_CAP}",
              flush=True)

        rs = jax.jit(partial(_q8_row_sums, p_cap=P_CAP, dma_gather=None,
                             bitonic=None, presorted=True))
        ms = timed(lambda: rs(packed, offsets, scales, qt, qw))
        print(f"[stages] {name} row_sums(presorted):      {ms:7.2f} ms",
              flush=True)
        sums, sids, wmax, _ = rs(packed, offsets, scales, qt, qw)
        sync(sums)

        for pool in (256, 512):
            pf = jax.jit(lambda s, i, w, p=pool: _bitonic_pool(s, i, p, w))
            ms = timed(lambda: pf(sums, sids, wmax))
            print(f"[stages] {name} bitonic_pool c={pool}:       {ms:7.2f} ms",
                  flush=True)
            cs, ci, _ = jax.block_until_ready(pf(sums, sids, wmax))
            ms = timed(lambda: sparse_exact_rescore(
                cs, ci, dp, ds, qt, qw, k=K, imp_bits=imp_bits))
            print(f"[stages] {name} exact_rescore c={pool}:      {ms:7.2f} ms",
                  flush=True)

        for cand in (256, 512):
            ms = timed(lambda: sparse_score_topk_q8_rescored(
                packed, offsets, scales, dp, ds, qt, qw, k=K, p_cap=P_CAP,
                candidates=cand, imp_bits=imp_bits, presorted=True))
            print(f"[stages] {name} FULL q8r c={cand}:          {ms:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
