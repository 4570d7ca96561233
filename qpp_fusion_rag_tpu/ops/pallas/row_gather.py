"""Fused doc-vector gather + term-match rescore (HBM → VMEM DMA).

STATUS: correct but NOT the production path. Measured on v5e at bench
shapes (N=2.6M, B=1024, Td=128): 10.5/17.2 ms (C=256/512) vs XLA's
take+compare at 7.5-12.9 ms. The aligned 8-row tile fetch moves 8x the
useful bytes per candidate, and that DMA overhead exceeds what fusing
the match saves — XLA's gather of exactly-one-tile rows is already
near the row-fetch floor (~21 ns/row). The production fix was upstream:
pack_doc_vectors(doc_cap=128) makes every row ONE (8, 128) int32 tile,
which halved the XLA gather cost (17→8 ms/view) without any custom
kernel. This file stays as the measured negative result + the
scalar-prefetched random-row DMA idiom (window_gather covers the
contiguous-window case).

Mechanics: each candidate's (8, 128)-tile row group is DMA'd HBM→VMEM
(int32 HBM slices must start on the 8-sublane tile boundary, so the
group holds 8 doc rows and the target row is rotated out — same realign
idiom as window_gather), and the Tq-way term match runs on the VMEM
tile while later candidates' DMAs are in flight. Output is one f32
partial score per candidate; the caller applies doc_scale and validity
masks.

Constraints that shape the design:
- Td is FIXED at 128 lanes: one tile row per doc (pack_doc_vectors
  doc_cap=128; the certified scorer carries a per-doc tail bound for
  the rare docs longer than that — see pack_doc_vectors return_tail).
- Candidates arrive flattened from [B, C] row-major with C % 8 == 0, so
  every aligned group of 8 consecutive candidates shares one query row
  — the Tq match scalars broadcast over the whole (8, 128) tile.
- ids/query scalars live in SMEM (PrefetchScalarGridSpec); SMEM is 1 MB,
  so the caller chunks G at 32768 candidates per pallas_call.

Replaces the exhaustive-scoring inner loop of the reference's
Lucene/Terrier rerank semantics (reference src/retrievers/bm25.py:43-52)
at the memory-system level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 128         # candidates DMA'd concurrently per grid step
TILE = 8           # candidates matched per VPU tile (= sublane count)
LANES = 128        # fixed doc-vector width (one int32 tile row per doc)
CHUNK = 32_768     # ids per pallas_call (SMEM budget)


def _kernel(ids_ref, qt_ref, qw_ref, src_ref, out_ref, scratch, tile_buf,
            sems, *, tq, imp_bits, cand_per_query):
    """Out layout per grid step: out_ref[0, j, t] = score of candidate
    i*ROWS + t*TILE + j (tile sums land sublane-oriented; the caller
    descrambles with one cheap transpose)."""
    i = pl.program_id(0)

    def copy(j):
        d = ids_ref[i * ROWS + j]
        row0 = pl.multiple_of((d // 8) * 8, 8)
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(row0, 8), :], scratch.at[j], sems.at[j])

    for j in range(ROWS):
        copy(j).start()
    for j in range(ROWS):
        copy(j).wait()

    mask = jnp.int32((1 << imp_bits) - 1)
    for t in range(ROWS // TILE):
        t0 = t * TILE
        # 8 consecutive candidates share one query row (C % 8 == 0)
        b = (i * ROWS + t0) // cand_per_query
        for j in range(TILE):
            d = ids_ref[i * ROWS + t0 + j]
            y = pltpu.roll(scratch[t0 + j], shift=(8 - d % 8) % 8, axis=0)
            tile_buf[j] = y[0]
        rows = tile_buf[...]                              # [TILE, LANES]
        terms = jax.lax.shift_right_logical(rows, imp_bits)
        imp = (rows & mask).astype(jnp.float32)
        acc = jnp.zeros((TILE, LANES), jnp.float32)
        for j in range(tq):
            acc = acc + jnp.where(terms == qt_ref[b, j],
                                  qw_ref[b, j] * imp, 0.0)
        out_ref[0, :, t:t + 1] = jnp.sum(acc, axis=1, keepdims=True)


def _one_chunk(src, ids, qt, qw, imp_bits, cand_per_query, interpret):
    G = ids.shape[0]
    tq = qt.shape[1]
    n_steps = G // ROWS
    n_tiles = ROWS // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TILE, n_tiles), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ROWS, 8, LANES), src.dtype),
            pltpu.VMEM((TILE, LANES), src.dtype),
            pltpu.SemaphoreType.DMA((ROWS,)),
        ],
    )
    kernel = partial(_kernel, tq=tq, imp_bits=imp_bits,
                     cand_per_query=cand_per_query)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps, TILE, n_tiles),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids, qt, qw, src)
    # out[i, j, t] = score[i*ROWS + t*TILE + j] -> flatten in (i, t, j)
    return jnp.transpose(out, (0, 2, 1)).reshape(G)


@partial(jax.jit, static_argnames=("imp_bits", "interpret"))
def rescore_match_pallas(
    doc_packed: jnp.ndarray,   # [N, 128] int32 (term << imp_bits | imp)
    cand_ids: jnp.ndarray,     # [B, C] int32, C % ROWS == 0; -1 pad OK
    q_terms: jnp.ndarray,      # [B, Tq] int32 (-1 pad)
    q_weights: jnp.ndarray,    # [B, Tq] f32 (pad entries ignored via qw=0)
    imp_bits: int = 14,
    interpret: bool = None,
) -> jnp.ndarray:
    """-> unscaled rescore sums [B, C] f32: sum_p imp_p * qw(term_p) per
    candidate row. Caller multiplies by doc_scale and masks invalid ids
    (pass clamped ids; -1 entries are clamped to 0 here and must be
    masked by the caller — matching _exact_rescore_scores' contract)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, C = cand_ids.shape
    if C % TILE:
        raise ValueError(f"C={C} must be a multiple of {TILE}")
    if (B * C) % ROWS:
        raise ValueError(f"B*C={B * C} must be a multiple of {ROWS}")
    if doc_packed.shape[1] != LANES:
        raise ValueError(f"doc_packed must be [N, {LANES}]")
    qw = jnp.where(q_terms >= 0, q_weights, 0.0).astype(jnp.float32)
    qt = jnp.where(q_terms >= 0, q_terms, -1)
    flat = jnp.maximum(cand_ids.reshape(-1), 0)
    G = flat.shape[0]
    # chunks must start on BOTH a query boundary (the kernel rebases its
    # query index per chunk) and a grid-step boundary
    step = C * ROWS // np.gcd(C, ROWS)
    chunk = max(CHUNK // step, 1) * step
    outs = []
    for off in range(0, G, chunk):
        ids_c = flat[off:off + chunk]
        # queries owning this chunk: rebase so qt/qw fit SMEM per call
        b0, b1 = off // C, (off + ids_c.shape[0] - 1) // C + 1
        outs.append(_one_chunk(
            src=doc_packed, ids=ids_c, qt=qt[b0:b1], qw=qw[b0:b1],
            imp_bits=imp_bits, cand_per_query=C, interpret=interpret))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return out.reshape(B, C)


def pad_doc_rows(doc_packed: np.ndarray, imp_bits: int) -> np.ndarray:
    """Pad a pack_doc_vectors table to the kernel layout: exactly 128
    columns (sentinel-padded) and a row count divisible by 8 (aligned
    group fetches stay in bounds)."""
    n, td = doc_packed.shape
    sentinel = np.int32(((1 << (31 - imp_bits)) - 1) << imp_bits)
    if td > LANES:
        raise ValueError(
            f"doc vectors have Td={td} > {LANES}; pack with doc_cap=128")
    out = np.full((((n + 7) // 8) * 8, LANES), sentinel, np.int32)
    out[:n, :td] = doc_packed
    return out
