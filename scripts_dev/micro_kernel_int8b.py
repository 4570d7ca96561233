"""Sweep int8 packed kernel tiles further + measure phase-2 merge cost."""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
    group_max_packed_int8, quantize_rows, unpack_lane, GROUP,
)

M, D, N = 5120, 768, 2_621_440
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
corpus = jax.random.normal(k1, (D, N), jnp.float32)
q = jax.random.normal(k2, (M, D), jnp.float32)

corpus_int, d_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus)
d_scale = d_scale.reshape(1, N)
q_int, q_scale = jax.jit(quantize_rows)(q)
del corpus


def sync(o):
    return np.asarray(o[:1, :1])


def bench(fn, *args, reps=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


flops = 2.0 * M * N * D
for tm, tn in [(256, 4096), (512, 8192), (256, 8192), (1024, 4096)]:
    try:
        dt = bench(lambda a, c, s: group_max_packed_int8(a, c, s, tm=tm, tn=tn),
                   q_int, corpus_int, d_scale)
        print(f"int8 tm={tm} tn={tn}: {dt*1e3:7.1f} ms  {flops/dt/1e12:6.1f} TOP/s")
    except Exception as e:
        print(f"int8 tm={tm} tn={tn} FAILED: {type(e).__name__}: {str(e)[:100]}")

# full phase1+phase2: kernel + approx merge + unpack + qscale apply
@jax.jit
def full(q_int, q_scale, corpus_int, d_scale):
    vals = group_max_packed_int8(q_int, corpus_int, d_scale, tm=512, tn=4096)
    tv, tx = jax.lax.approx_max_k(vals, 100, recall_target=0.95)
    clean, lane = unpack_lane(tv)
    ids = tx.astype(jnp.int32) * GROUP + lane
    return clean * q_scale, ids

dt = bench(full, q_int, q_scale, corpus_int, d_scale)
print(f"phase1+2 (tm=512 tn=4096): {dt*1e3:7.1f} ms  -> {1024/dt:6.0f} q/s-equivalent")
