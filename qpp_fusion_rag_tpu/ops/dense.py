"""Dense retrieval as streaming matmul top-k (exact, MXU-friendly).

Replaces the reference's FAISS IndexFlatIP search and its segmented-HNSW
approximation (reference src/retrievers/bge.py:186-237,
src/indexing/hnsw.py:64-202) with the TPU idiom: the corpus embedding matrix
lives in HBM (bf16), queries stream against it in document chunks, and a
running top-k buffer is merged per chunk — so the full [B, N] score matrix is
never materialized. Exact brute force ≥ HNSW recall by construction.

The reference's serial per-segment knn + host merge-sort (bge.py:216-237) is
exactly this algorithm; here each chunk merge is a `lax.top_k` over
[running_k | chunk] inside one `lax.scan`, fully on device.

Multi-chip: `parallel.sharded` wraps these kernels in `shard_map` with the
corpus axis sharded over the mesh and a tiled all-gather top-k merge.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG = jnp.float32(-jnp.inf)


def _pad_corpus(corpus: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, int]:
    n = corpus.shape[0]
    pad = (-n) % chunk
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    return corpus, n


@partial(jax.jit, static_argnames=("k", "chunk"))
def dense_topk(
    queries: jnp.ndarray,   # [B, D]
    corpus: jnp.ndarray,    # [N, D] (any dtype; matmul accumulates f32)
    k: int = 100,
    chunk: int = 16384,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact inner-product top-k: -> (scores [B, k] f32 desc, ids [B, k] i32).

    Streams the corpus in `chunk`-document tiles; peak memory is
    O(B * (k + chunk)) instead of O(B * N).
    """
    B = queries.shape[0]
    corpus, n = _pad_corpus(corpus, chunk)
    n_chunks = corpus.shape[0] // chunk
    q = queries.astype(corpus.dtype)

    init = (
        jnp.full((B, k), NEG, dtype=jnp.float32),
        jnp.full((B, k), -1, dtype=jnp.int32),
    )
    local_ids = jnp.arange(chunk, dtype=jnp.int32)

    def body(carry, ci):
        vals, ids = carry
        block = jax.lax.dynamic_slice_in_dim(corpus, ci * chunk, chunk, axis=0)
        s = jnp.dot(q, block.T, preferred_element_type=jnp.float32)  # [B, chunk]
        gids = ci * chunk + local_ids
        s = jnp.where(gids[None, :] < n, s, NEG)
        cat_v = jnp.concatenate([vals, s], axis=-1)
        cat_i = jnp.concatenate([ids, jnp.broadcast_to(gids, (B, chunk))], axis=-1)
        vals, top = jax.lax.top_k(cat_v, k)
        ids = jnp.take_along_axis(cat_i, top, axis=-1)
        return (vals, ids), None

    (vals, ids), _ = jax.lax.scan(body, init, jnp.arange(n_chunks, dtype=jnp.int32))
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals, ids


@partial(jax.jit, static_argnames=("k", "chunk"))
def multi_view_topk(
    queries: jnp.ndarray,    # [B, D]
    view_proj: jnp.ndarray,  # [R, D, Dv] per-retriever query projection
    corpus: jnp.ndarray,     # [N, Dv]
    k: int = 100,
    chunk: int = 16384,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """R retriever views over one corpus -> (scores [R, B, k], ids [R, B, k]).

    Models a multi-retriever ensemble whose retrievers differ in query
    encoding (the projection); scoring shares the corpus stream so the
    HBM read of E is amortized across all R views.
    """
    qv = jnp.einsum(
        "bd,rdv->rbv", queries.astype(jnp.float32), view_proj.astype(jnp.float32)
    ).astype(corpus.dtype)
    R, B, _ = qv.shape
    corpus, n = _pad_corpus(corpus, chunk)
    n_chunks = corpus.shape[0] // chunk

    init = (
        jnp.full((R, B, k), NEG, dtype=jnp.float32),
        jnp.full((R, B, k), -1, dtype=jnp.int32),
    )
    local_ids = jnp.arange(chunk, dtype=jnp.int32)

    def body(carry, ci):
        vals, ids = carry
        block = jax.lax.dynamic_slice_in_dim(corpus, ci * chunk, chunk, axis=0)
        s = jnp.einsum("rbv,cv->rbc", qv, block, preferred_element_type=jnp.float32)
        gids = ci * chunk + local_ids
        s = jnp.where(gids[None, None, :] < n, s, NEG)
        cat_v = jnp.concatenate([vals, s], axis=-1)
        cat_i = jnp.concatenate(
            [ids, jnp.broadcast_to(gids, (R, B, chunk))], axis=-1
        )
        vals, top = jax.lax.top_k(cat_v, k)
        ids = jnp.take_along_axis(cat_i, top, axis=-1)
        return (vals, ids), None

    (vals, ids), _ = jax.lax.scan(body, init, jnp.arange(n_chunks, dtype=jnp.int32))
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals, ids


def merge_topk(
    vals_a: jnp.ndarray, ids_a: jnp.ndarray,
    vals_b: jnp.ndarray, ids_b: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two top-k buffers along the last axis (segment-merge primitive,
    the on-device analogue of reference bge.py:230-235)."""
    cat_v = jnp.concatenate([vals_a, vals_b], axis=-1)
    cat_i = jnp.concatenate([ids_a, ids_b], axis=-1)
    vals, top = jax.lax.top_k(cat_v, k)
    return vals, jnp.take_along_axis(cat_i, top, axis=-1)
