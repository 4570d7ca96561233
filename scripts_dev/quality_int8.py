"""Measure int8-path recall@k vs f32-exact and vs the bf16 packed path
at bench scale (2.62M docs) on the real chip. Writes docs/quality JSON."""
import json
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
    pallas_dense_topk, pallas_dense_topk_int8, quantize_rows,
)

D, N, B, K = 768, 2_621_440, 64, 100
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
corpus_t = jax.random.normal(k1, (D, N), jnp.float32)
q = jax.random.normal(k2, (B, D), jnp.float32)

c_int, d_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_t)
d_scale = d_scale.reshape(1, N)


# exact f32 reference: chunked matmul + exact top-k per chunk + merge
@jax.jit
def exact_topk(q, corpus_t):
    def body(carry, i):
        vals, ids = carry
        c = jax.lax.dynamic_slice(corpus_t, (0, i * 131072), (D, 131072))
        s = q @ c
        cv, cx = jax.lax.top_k(s, K)
        cat_v = jnp.concatenate([vals, cv], axis=1)
        cat_i = jnp.concatenate([ids, cx + i * 131072], axis=1)
        mv, mx = jax.lax.top_k(cat_v, K)
        return (mv, jnp.take_along_axis(cat_i, mx, axis=1)), None

    init = (jnp.full((B, K), -jnp.inf), jnp.full((B, K), -1, jnp.int32))
    (vals, ids), _ = jax.lax.scan(body, init, jnp.arange(N // 131072))
    return vals, ids


t0 = time.perf_counter()
ev, ei = exact_topk(q, corpus_t)
ei = np.asarray(ei)
print(f"exact done {time.perf_counter()-t0:.1f}s")

bv, bi = pallas_dense_topk(q, corpus_t.astype(jnp.bfloat16), k=K, tn=2048,
                           transposed=True)
bi = np.asarray(bi)
iv, ii = pallas_dense_topk_int8(q, c_int, d_scale, k=K)
ii = np.asarray(ii)


def recall(got, ref, k):
    return float(np.mean([
        len(set(got[i, :k]) & set(ref[i, :k])) / k for i in range(len(got))
    ]))


out = {
    "n_docs": N, "dim": D, "n_queries": B,
    "recall@10_bf16_vs_exact": recall(bi, ei, 10),
    "recall@100_bf16_vs_exact": recall(bi, ei, 100),
    "recall@10_int8_vs_exact": recall(ii, ei, 10),
    "recall@100_int8_vs_exact": recall(ii, ei, 100),
    "recall@100_int8_vs_bf16": recall(ii, bi, 100),
    "top1_match_int8_vs_exact": float(np.mean(ii[:, 0] == ei[:, 0])),
}
print(json.dumps(out, indent=1))
with open("/root/repo/docs/quality_int8.json", "w") as f:
    json.dump(out, f, indent=1)
