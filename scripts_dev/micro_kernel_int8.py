"""Kernel-only microbench at bench shapes: bf16 packed vs int8 packed."""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
    group_max_packed, group_max_packed_int8, quantize_rows,
)

M = 5120           # R_VIEWS * BATCH
D = 768
N = 2_621_440

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
corpus_t = jax.random.normal(k1, (D, N), jnp.bfloat16)   # [D, N]
q = jax.random.normal(k2, (M, D), jnp.float32)


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

# bf16 packed (current champion)
dt = bench(lambda q, c: group_max_packed(q, c, tm=512, tn=2048, transposed=True),
           q, corpus_t)
print(f"bf16 packed : {dt*1e3:7.1f} ms  {flops/dt/1e12:6.1f} TF/s")

# int8 packed
qi8 = jax.jit(lambda c: quantize_rows(c, axis=0))
corpus_int, d_scale = qi8(corpus_t.astype(jnp.float32))
d_scale = d_scale.reshape(1, N)
q_int, q_scale = jax.jit(quantize_rows)(q)
sync(corpus_int)

for tm in (512, 1024):
    for tn in (2048, 4096):
        try:
            dt = bench(lambda a, c, s: group_max_packed_int8(a, c, s, tm=tm, tn=tn),
                       q_int, corpus_int, d_scale)
            print(f"int8 packed tm={tm} tn={tn}: {dt*1e3:7.1f} ms  {flops/dt/1e12:6.1f} TOP/s")
        except Exception as e:
            print(f"int8 tm={tm} tn={tn} FAILED: {type(e).__name__}: {str(e)[:150]}")
