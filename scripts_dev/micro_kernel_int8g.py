"""Measure the all-integer global-scale int8 kernel vs the per-doc one."""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
    group_max_packed_int8, group_max_packed_int8_global,
    pallas_dense_topk_int8_global,
    quantize_rows, quantize_global,
)

M, D, N = 5120, 768, 2_621_440
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
corpus = jax.random.normal(k1, (D, N), jnp.float32)
q = jax.random.normal(k2, (M, D), jnp.float32)

c8d, dsc = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus)
dsc = dsc.reshape(1, N)
c8g, gsc = jax.jit(quantize_global)(corpus)
qi, qsc = jax.jit(quantize_rows)(q)
del corpus


def sync(o):
    return np.asarray(o.ravel()[:1])


def bench(fn, *args, reps=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


flops = 2.0 * M * N * D
for tm, tn in [(512, 4096), (512, 8192), (1024, 4096)]:
    try:
        dt = bench(lambda a, c: group_max_packed_int8_global(a, c, tm=tm, tn=tn), qi, c8g)
        print(f"int8-global tm={tm} tn={tn}: {dt*1e3:7.1f} ms  {flops/dt/1e12:6.1f} TOP/s")
    except Exception as e:
        print(f"int8-global tm={tm} tn={tn} FAILED: {str(e)[:90]}")

dt = bench(lambda a, c, s: group_max_packed_int8(a, c, s, tm=512, tn=4096), qi, c8d, dsc)
print(f"int8-perdoc tm=512 tn=4096: {dt*1e3:7.1f} ms  {flops/dt/1e12:6.1f} TOP/s")


# full phase1+2 with the global kernel
@jax.jit
def full(q, c, s):
    return pallas_dense_topk_int8_global(q, c, s, k=100)

dt = bench(lambda q_, c, s: full(q_, c, s)[0], q, c8g, gsc)
print(f"int8-global phase1+2: {dt*1e3:7.1f} ms")
