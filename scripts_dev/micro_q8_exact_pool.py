"""Time sparse_score_topk_q8's exact-selection paths at bench shapes:
lax.top_k (old) vs the _bitonic_pool second pass (new), plus the
approx_max_k production path for context."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.data.synthetic import zipf_queries
from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk_q8, _q8_row_sums, _bitonic_pool

B, K, P_CAP = 1024, 100, 2048

z = np.load("/tmp/profile_ensemble_idx.npz")
bo, bp, bs = z["bo"], z["bp"], z["bs"]
bm25_t, bm25_w = zipf_queries(bo, B, n_terms=8, seed=1)
args = (jnp.asarray(bp), jnp.asarray(bo.astype(np.int32)), jnp.asarray(bs),
        bm25_t, bm25_w)


def bench(fn, reps=5, **kw):
    out = fn(*args, k=K, p_cap=P_CAP, **kw)
    _ = np.asarray(out[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, k=K, p_cap=P_CAP, **kw)
    _ = np.asarray(out[0]).ravel()[0]
    return (time.perf_counter() - t0) / reps


import functools


@functools.partial(jax.jit, static_argnames=("k", "p_cap"))
def q8_laxtopk(packed, offsets, scales, qt, qw, k, p_cap):
    sums, sids, wmax_col, _ = _q8_row_sums(packed, offsets, scales, qt, qw,
                                           p_cap, None, None)
    scores = jnp.where(sums >= 0, sums.astype(jnp.float32) * wmax_col,
                       -jnp.inf)
    tv, ti = jax.lax.top_k(scores, k)
    return tv, jnp.take_along_axis(sids, ti, axis=-1)


t_pool = bench(sparse_score_topk_q8, exact_topk=True)
t_approx = bench(sparse_score_topk_q8, exact_topk=False)
t_lax = bench(q8_laxtopk)
print(f"q8 exact via bitonic pool: {t_pool*1e3:6.1f} ms | "
      f"lax.top_k: {t_lax*1e3:6.1f} ms | approx 0.95: {t_approx*1e3:6.1f} ms")
