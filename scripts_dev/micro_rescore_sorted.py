"""Does ascending-address candidate order speed the q8r rescore gather?

KERNEL_NOTES round-3 open idea: the [B, C, Td] doc-row gather runs at
~48 GB/s useful (XLA lowers row gathers to a sequential dynamic-slice
loop); candidate ids arrive in score order = random HBM addresses.
sort_ids pre-sorts candidates per query so the loop walks ascending
addresses. Fresh random ids per rep (remote-tunnel identical-args trap).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from qpp_fusion_rag_tpu.ops.sparse import sparse_exact_rescore

N, Td, B, C, Tq = 1_000_000, 512, 256, 2048, 8
rng = np.random.default_rng(0)
doc_packed = jnp.asarray(
    rng.integers(0, 2**30, (N, Td), np.int64).astype(np.int32))
doc_scale = jnp.asarray(rng.random(N, np.float32) + 0.5)
qt = jnp.asarray(rng.integers(0, 1 << 17, (B, Tq)).astype(np.int32))
qw = jnp.asarray(rng.random((B, Tq), np.float32))


def bench(sort_ids, reps=5):
    ids = [jnp.asarray(rng.integers(0, N, (B, C)).astype(np.int32))
           for _ in range(reps + 1)]
    cs = jnp.zeros((B, C), jnp.float32)
    out = sparse_exact_rescore(cs, ids[0], doc_packed, doc_scale, qt, qw,
                               k=100, imp_bits=12, sort_ids=sort_ids)
    _ = np.asarray(out[0]).ravel()[0]
    t0 = time.perf_counter()
    for r in range(reps):
        out = sparse_exact_rescore(cs, ids[r + 1], doc_packed, doc_scale,
                                   qt, qw, k=100, imp_bits=12,
                                   sort_ids=sort_ids)
    _ = np.asarray(out[0]).ravel()[0]
    return (time.perf_counter() - t0) / reps


t_plain = bench(False)
t_sorted = bench(True)
gb = B * C * Td * 4 / 1e9
print(f"rescore B={B} C={C} Td={Td}: unsorted {t_plain*1e3:6.1f} ms "
      f"({gb/t_plain:.0f} GB/s) | sorted {t_sorted*1e3:6.1f} ms "
      f"({gb/t_sorted:.0f} GB/s)  ({t_plain/t_sorted:.2f}x)")
