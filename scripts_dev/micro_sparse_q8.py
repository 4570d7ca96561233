"""Time sort-path vs q8 single-key sparse kernels at ensemble bench shapes.

Arrays pass as jit ARGUMENTS (closing over device arrays bakes them in as
multi-GB compile-time constants — remote compiles crawl)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
from qpp_fusion_rag_tpu.ops.sparse import (
    pack_postings,
    sparse_score_topk_packed,
    sparse_score_topk_q8,
)

N, B, K = 2_621_440, 1024, 100

CACHE = "/tmp/profile_ensemble_idx.npz"
z = np.load(CACHE)
bo, bp, bs = z["bo"], z["bp"], z["bs"]
so, sp, ss = z["so"], z["sp"], z["ss"]
print("indexes loaded", flush=True)

bm25_t, bm25_w = zipf_queries(bo, B, n_terms=8, seed=1)
spl_t, spl_w = zipf_queries(so, B, n_terms=16, seed=2)

d_bo = jnp.asarray(bo.astype(np.int32))
d_so = jnp.asarray(so.astype(np.int32))
d_bp, d_bs = jnp.asarray(bp), jnp.asarray(bs)
d_sp, d_ss = jnp.asarray(sp), jnp.asarray(ss)


def bench(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


for pc in (2048, 1024):
    for tag, (p, o, s, t, w) in (
        ("bm25  ", (d_bp, d_bo, d_bs, bm25_t, bm25_w)),
        ("splade", (d_sp, d_so, d_ss, spl_t, spl_w)),
    ):
        t_sort = bench(sparse_score_topk_packed, p, o, s, t, w,
                       k=K, p_cap=pc, exact_topk=False)
        t_q8 = bench(sparse_score_topk_q8, p, o, s, t, w,
                     k=K, p_cap=pc, exact_topk=False)
        print(f"{tag} p_cap={pc}: sort {t_sort*1e3:6.1f} ms | "
              f"q8 {t_q8*1e3:6.1f} ms", flush=True)
