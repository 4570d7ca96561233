"""Micro-benchmark: doc-row gather layouts for the q8r exact rescore.

The [B, C, Td] doc-row gather dominates the q8r rescore
(docs/KERNEL_NOTES.md: ~26 GB/s effective via XLA's sequential
dynamic-slice lowering). Two traps this script avoids:

  - reduce(gather(x)) gets rewritten to gather(rowreduce(x)) — measure
    the REAL rescore computation (per-query term masks defeat it);
  - repeated executions with IDENTICAL args can be served from a cache
    under the remote-execution tunnel — every rep gets fresh ids.

Candidates:
  a) row rescore   — sparse_exact_rescore on [N, Td]        (today)
  b) group rescore — gather [8*Td] rows of [N//8, 8*Td] (8-doc groups,
                     tile-aligned rows), rescore all 8 docs per group,
                     candidate chunking bounds the HBM temp

Run on TPU. Prints one JSON line per config.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qpp_fusion_rag_tpu.ops.sparse import sparse_exact_rescore

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")

B, C, K = 256, 2048, 100
N = 1_000_000
TQ = 8
IMP_BITS = 14
TDS = [256, 512]
CHUNK = 512
REPS = 5


def _sync(out):
    # host scalar readback: block_until_ready alone does NOT guarantee
    # completion through the remote-execution tunnel (see bench.py)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


def timed(fn, ids_list, *args, **kw):
    fn = partial(fn, **kw) if kw else fn
    out = fn(ids_list[-1], *args)
    _sync(out)
    t0 = time.perf_counter()
    for r in range(REPS):
        out = fn(ids_list[r], *args)
    _sync(out)
    return out, (time.perf_counter() - t0) / REPS


@jax.jit
def row_rescore(cand_ids, cand_s, dp, ds, qt, qw):
    return sparse_exact_rescore(cand_s, cand_ids, dp, ds, qt, qw,
                                k=K, imp_bits=IMP_BITS)


@partial(jax.jit, static_argnames=("td",))
def group_rescore(cand_ids, cand_s, dp8, ds, qt, qw, td=256):
    def chunk(carry, ids_c):                       # ids_c [B, CHUNK]
        rows = jnp.take(dp8, (ids_c // 8).reshape(-1), axis=0)
        rows = rows.reshape(B, CHUNK, 8, td)
        t = jax.lax.shift_right_logical(rows, IMP_BITS)
        imp = (rows & jnp.int32((1 << IMP_BITS) - 1)).astype(jnp.float32)
        matched = jnp.zeros_like(imp)
        for j in range(TQ):
            matched = matched + jnp.where(
                t == qt[:, j, None, None, None],
                qw[:, j, None, None, None], 0.0)
        s8 = jnp.sum(matched * imp, axis=-1)       # [B, CHUNK, 8]
        sc = jnp.take_along_axis(s8, (ids_c % 8)[..., None], axis=-1)[..., 0]
        return carry, sc

    chunks = cand_ids.reshape(B, C // CHUNK, CHUNK).transpose(1, 0, 2)
    _, scs = jax.lax.scan(chunk, 0, chunks)        # [C/CHUNK, B, CHUNK]
    scores = scs.transpose(1, 0, 2).reshape(B, C)
    scores = scores * ds[jnp.maximum(cand_ids, 0)]
    scores = jnp.where(cand_ids >= 0, scores, -jnp.inf)
    tv, ti = jax.lax.top_k(scores, K)
    return tv, jnp.take_along_axis(cand_ids, ti, axis=-1)


def main():
    rng = np.random.default_rng(0)
    ids_list = [jnp.asarray(rng.integers(0, N, size=(B, C), dtype=np.int32))
                for _ in range(REPS + 1)]
    cs = jnp.zeros((B, C), jnp.float32)
    qt = jnp.asarray(rng.integers(0, 100_000, size=(B, TQ), dtype=np.int32))
    qw = jnp.asarray(rng.random((B, TQ), dtype=np.float32))
    ds = jnp.asarray(rng.random((N,), dtype=np.float32))
    out = []
    for td in TDS:
        dp = jnp.asarray(
            rng.integers(0, 2**31 - 1, size=(N, td), dtype=np.int32))
        (rv, ri), t_row = timed(row_rescore, ids_list, cs, dp, ds, qt, qw)
        dp8 = dp.reshape(N // 8, 8 * td)
        (gv, gi), t_grp = timed(group_rescore, ids_list, cs, dp8, ds, qt, qw,
                                td=td)
        agree = float(jnp.mean((jnp.abs(rv - gv) < 1e-3) | ~jnp.isfinite(rv)))
        useful = B * C * td * 4
        rec = {
            "td": td,
            "row_ms": round(t_row * 1e3, 2),
            "row_gbps": round(useful / t_row / 1e9, 1),
            "group_ms": round(t_grp * 1e3, 2),
            "group_raw_gbps": round(8 * useful / t_grp / 1e9, 1),
            "group_useful_gbps": round(useful / t_grp / 1e9, 1),
            "score_agreement": agree,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
        del dp, dp8
    json.dump(out, open("/tmp/micro_gather.json", "w"))


if __name__ == "__main__":
    main()
