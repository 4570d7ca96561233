"""Microbench: matmul sustained rates by dtype on this chip (XLA path).

Each case runs `reps` independent dots inside one jit and syncs via a tiny
host readback (the axon tunnel ignores block_until_ready).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

M = K = N = 4096
CHAIN = 8


def bench(fn, *args, reps=5):
    out = fn(*args)
    _ = np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(out[:1, :1])
    return (time.perf_counter() - t0) / reps


def make(dtype, acc):
    key = jax.random.PRNGKey(0)
    if dtype == jnp.bfloat16:
        a = jax.random.normal(key, (CHAIN, M, K), jnp.bfloat16)
        b = jax.random.normal(key, (K, N), jnp.bfloat16)
    else:
        a = (jax.random.normal(key, (CHAIN, M, K)) * 30).astype(dtype)
        b = (jax.random.normal(key, (K, N)) * 30).astype(dtype)

    @jax.jit
    def mm(a, b):
        outs = [
            jax.lax.dot(a[i], b, preferred_element_type=acc)
            for i in range(CHAIN)
        ]
        # touch every output so nothing is DCE'd; cheap elementwise combine
        s = outs[0]
        for o in outs[1:]:
            s = s + o
        return s

    return mm, a, b


flops = 2.0 * M * K * N * CHAIN
for name, dtype, acc in [
    ("bf16/f32", jnp.bfloat16, jnp.float32),
    ("bf16/bf16", jnp.bfloat16, jnp.bfloat16),
    ("int8/int32", jnp.int8, jnp.int32),
]:
    try:
        mm, a, b = make(dtype, acc)
        dt = bench(mm, a, b)
        print(f"{name:12s} {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} T/s")
    except Exception as e:
        print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:120]}")
