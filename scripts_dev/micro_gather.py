"""Micro-benchmark: doc-row gather strategies for the q8r exact rescore.

The [B, C, Td] doc-row gather is the q8r rescore's wall
(docs/KERNEL_NOTES.md: ~26 GB/s effective via XLA's sequential
dynamic-slice lowering). Candidates measured here:

  a) row gather    — jnp.take rows [Td] from [N, Td]      (today's path)
  b) group gather  — jnp.take rows [8*Td] from [N8, 8*Td] (8-doc groups:
                     tile-aligned 8x larger rows; useful BW = 1/8 of raw)
  c) fused rescore — today's sparse_exact_rescore end-to-end for scale

Run on TPU. Prints one JSON line per config.
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")

B, C = 256, 2048
N = 1_000_000
TDS = [256, 512]


def timed(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@partial(jax.jit, donate_argnums=())
def row_gather(doc, ids):
    rows = jnp.take(doc, ids.reshape(-1), axis=0).reshape(B, C, -1)
    return jnp.sum(rows, axis=(1, 2))         # force materialization


@partial(jax.jit, donate_argnums=())
def group_gather(doc8, gids):
    rows = jnp.take(doc8, gids.reshape(-1), axis=0).reshape(B, C, -1)
    return jnp.sum(rows, axis=(1, 2))


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, N, size=(B, C), dtype=np.int32))
    out = []
    for td in TDS:
        doc = jnp.asarray(
            rng.integers(0, 2**31 - 1, size=(N, td), dtype=np.int32))
        t_row = timed(row_gather, doc, ids)
        doc8 = doc.reshape(N // 8, 8 * td)
        gids = ids // 8
        t_grp = timed(group_gather, doc8, gids)
        useful = B * C * td * 4
        rec = {
            "td": td,
            "row_ms": round(t_row * 1e3, 2),
            "row_gbps": round(useful / t_row / 1e9, 1),
            "group_ms": round(t_grp * 1e3, 2),
            "group_raw_gbps": round(8 * useful / t_grp / 1e9, 1),
            "group_useful_gbps": round(useful / t_grp / 1e9, 1),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
        del doc, doc8
    json.dump(out, open("/tmp/micro_gather.json", "w"))


if __name__ == "__main__":
    main()
