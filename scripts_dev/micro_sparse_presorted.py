"""Time q8 sparse scoring: plain impact-ordered layout vs the DUAL
doc-ordered presorted layout (pack_postings_presorted) that lets the
bitonic network skip its first log2(p_cap) rounds.

Reuses /tmp/profile_ensemble_idx.npz (profile_ensemble.py); the presorted
layout is reconstructed LOSSLESSLY from the packed arrays (q8 impacts
re-quantize exactly against the same per-term scales)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.data.synthetic import zipf_queries
from qpp_fusion_rag_tpu.ops.sparse import (
    pack_postings_presorted,
    sparse_score_topk_q8,
)

B, K, P_CAP = 1024, 100, 2048

z = np.load("/tmp/profile_ensemble_idx.npz")
bo, bp, bs = z["bo"], z["bp"], z["bs"]
so, sp, ss = z["so"], z["sp"], z["ss"]
print("indexes loaded", flush=True)


def presorted_from_packed(packed, offsets, scales, cap):
    P = int(offsets[-1])
    docs = (packed[:P].astype(np.int64) >> 8).astype(np.int32)
    q8 = (packed[:P] & 0xFF).astype(np.float32)
    w = q8 * np.repeat(scales, np.diff(offsets))
    return pack_postings_presorted(docs, w, offsets, cap=cap, scales=scales)


t0 = time.time()
bpre, bo2, _ = presorted_from_packed(bp, bo, bs, P_CAP)
spre, so2, _ = presorted_from_packed(sp, so, ss, P_CAP)
print(f"presorted layouts built in {time.time()-t0:.1f}s "
      f"(bm25 {bpre.nbytes/1e6:.0f} MB vs {bp.nbytes/1e6:.0f} MB; "
      f"splade {spre.nbytes/1e6:.0f} MB vs {sp.nbytes/1e6:.0f} MB)",
      flush=True)

bm25_t, bm25_w = zipf_queries(bo, B, n_terms=8, seed=1)
spl_t, spl_w = zipf_queries(so, B, n_terms=16, seed=2)

d = {
    "bm25_plain": (jnp.asarray(bp), jnp.asarray(bo.astype(np.int32)),
                   jnp.asarray(bs), bm25_t, bm25_w),
    "bm25_pre": (jnp.asarray(bpre), jnp.asarray(bo2.astype(np.int32)),
                 jnp.asarray(bs), bm25_t, bm25_w),
    "spl_plain": (jnp.asarray(sp), jnp.asarray(so.astype(np.int32)),
                  jnp.asarray(ss), spl_t, spl_w),
    "spl_pre": (jnp.asarray(spre), jnp.asarray(so2.astype(np.int32)),
                jnp.asarray(ss), spl_t, spl_w),
}


def bench(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


for tag in ("bm25", "spl"):
    t_plain = bench(sparse_score_topk_q8, *d[f"{tag}_plain"],
                    k=K, p_cap=P_CAP, exact_topk=False)
    t_pre = bench(sparse_score_topk_q8, *d[f"{tag}_pre"],
                  k=K, p_cap=P_CAP, exact_topk=False, presorted=True)
    print(f"{tag:5s} q8 p_cap={P_CAP}: plain {t_plain*1e3:6.1f} ms | "
          f"presorted {t_pre*1e3:6.1f} ms  ({t_plain/t_pre:.2f}x)",
          flush=True)

# sanity: same candidate sets on a small slice
for tag in ("bm25", "spl"):
    s1, i1 = sparse_score_topk_q8(*d[f"{tag}_plain"], k=K, p_cap=P_CAP,
                                  exact_topk=True)
    s2, i2 = sparse_score_topk_q8(*d[f"{tag}_pre"], k=K, p_cap=P_CAP,
                                  exact_topk=True, presorted=True)
    i1, i2 = np.asarray(i1[:32]), np.asarray(i2[:32])
    ov = np.mean([len(set(a[a >= 0]) & set(b[b >= 0])) / max(1, (a >= 0).sum())
                  for a, b in zip(i1, i2)])
    print(f"{tag:5s} top-{K} overlap plain vs presorted: {ov:.4f}", flush=True)
