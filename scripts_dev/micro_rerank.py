"""Cost of a two-stage rerank view: gather B*k candidate doc vectors and
rescore with dense dot products, at bench scale."""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

N, D, B, K = 2_621_440, 768, 1024, 100
key = jax.random.PRNGKey(0)
corpus8 = (jax.random.normal(key, (N, D)) * 30).astype(jnp.int8)
q = jax.random.normal(key, (B, D), jnp.float32)
ids = jax.random.randint(key, (B, K), 0, N, jnp.int32)


@jax.jit
def rerank_take(q, corpus8, ids):
    cand = jnp.take(corpus8, ids.reshape(-1), axis=0)          # [B*K, D]
    cand = cand.reshape(B, K, D).astype(jnp.bfloat16)
    s = jnp.einsum("bd,bkd->bk", q.astype(jnp.bfloat16), cand,
                   preferred_element_type=jnp.float32)
    return s


@jax.jit
def rerank_onehot(q, corpus8, ids):
    # alternative: one big [B*K, D] gather via dynamic_slice vmap
    def one(i):
        return jax.lax.dynamic_slice(corpus8, (i, 0), (1, D))[0]
    cand = jax.vmap(one)(ids.reshape(-1)).reshape(B, K, D).astype(jnp.bfloat16)
    s = jnp.einsum("bd,bkd->bk", q.astype(jnp.bfloat16), cand,
                   preferred_element_type=jnp.float32)
    return s


def bench(fn, *args, reps=5):
    out = fn(*args)
    _ = np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(out[:1, :1])
    return (time.perf_counter() - t0) / reps


for name, fn in [("take", rerank_take), ("dyn_slice", rerank_onehot)]:
    try:
        dt = bench(fn, q, corpus8, ids)
        print(f"rerank {name}: {dt*1e3:.1f} ms for {B}x{K} candidates")
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:120]}")
