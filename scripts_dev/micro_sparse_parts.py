"""Decompose sparse-kernel cost: gather vs sort vs scan vs final top-k."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B = 1024
key = jax.random.PRNGKey(0)


def bench(fn, *args, reps=5):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


for M in (16384, 32768):
    ids = jax.random.randint(key, (B, M), 0, 2_621_440, jnp.int32)
    vals = jax.random.uniform(key, (B, M), jnp.float32)

    t1 = bench(jax.jit(lambda i: jax.lax.sort(i, dimension=-1)), ids)
    t2 = bench(jax.jit(
        lambda i, v: jax.lax.sort((i, v), dimension=-1, num_keys=1)), ids, vals)

    @jax.jit
    def scan_tail(si, sv):
        last = jnp.concatenate(
            [si[:, 1:] != si[:, :-1], jnp.ones((B, 1), bool)], axis=1)
        c = jnp.cumsum(sv, axis=-1)
        marked = jnp.where(last, c, -jnp.inf)
        shifted = jnp.concatenate(
            [jnp.full((B, 1), -jnp.inf), marked[:, :-1]], axis=1)
        run = jax.lax.cummax(shifted, axis=1)
        sums = c - jnp.where(jnp.isneginf(run), 0.0, run)
        return jnp.where(last, sums, -jnp.inf)

    t3 = bench(scan_tail, ids, vals)
    t4 = bench(jax.jit(
        lambda v: jax.lax.approx_max_k(v, 100, recall_target=0.95)), vals)
    t5 = bench(jax.jit(lambda v: jax.lax.top_k(v, 100)), vals)
    print(f"M={M}: sort1 {t1*1e3:6.1f} | sortpair {t2*1e3:6.1f} | "
          f"scan {t3*1e3:6.1f} | approx_k {t4*1e3:6.1f} | topk {t5*1e3:6.1f} ms",
          flush=True)

# window gather: 16 terms x 2048 from 49M packed postings
z = np.load("/tmp/profile_ensemble_idx.npz")
sp = jnp.asarray(z["sp"])
starts = jax.random.randint(key, (B, 16), 0, len(z["sp"]) - 2048, jnp.int32)


@jax.jit
def gath(starts, sp):
    def one(s):
        return jax.lax.dynamic_slice(sp, (s,), (2048,))
    return jax.vmap(jax.vmap(one))(starts)


t6 = bench(gath, starts, sp)
print(f"gather 16x2048 windows: {t6*1e3:6.1f} ms", flush=True)
