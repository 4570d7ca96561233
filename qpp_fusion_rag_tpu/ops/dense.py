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

# plain Python float, NOT jnp.float32(...): a module-level jnp scalar
# initializes the XLA backend at import time, which breaks
# jax.distributed.initialize ordering on multi-host (multihost.py)
NEG = float("-inf")

# Default per-chunk recall for the approximate top-k path. On TPU,
# `lax.approx_max_k` maps to a hardware-friendly partial-reduce that is
# ~50x faster than exact `lax.top_k` on wide score rows; the reference's own
# dense retriever is HNSW-approximate (src/retrievers/bge.py:196-237), so
# approximate-with-high-recall matches its contract while exact remains
# available. 0.95 sits below a measured v5e performance cliff (target 0.95:
# 132 TF/s sustained, achieved recall@100 ≈ 0.977 on random data; target
# 0.97: 61 TF/s; target 0.99: 10 TF/s).
DEFAULT_RECALL = 0.95


def _chunk_topk(s: jnp.ndarray, k: int, exact: bool, recall: float):
    """Per-chunk candidate selection, padded to exactly k columns."""
    if exact or s.shape[-1] <= k:
        v, i = jax.lax.top_k(s, min(k, s.shape[-1]))
        pad = k - v.shape[-1]
        if pad:
            v = jnp.pad(v, ((0, 0),) * (v.ndim - 1) + ((0, pad),), constant_values=NEG)
            i = jnp.pad(i, ((0, 0),) * (i.ndim - 1) + ((0, pad),), constant_values=0)
        return v, i
    return jax.lax.approx_max_k(s, k, recall_target=recall)


def _final_merge(vals: jnp.ndarray, ids: jnp.ndarray, k: int, exact: bool, recall: float):
    """One merge over all chunks' candidates [..., n_chunks*k] -> top-k.

    Exact `lax.top_k` on TPU costs ~12 ms per call on wide rows (v5e), so a
    per-chunk carry merge dominates the whole retrieval; collecting
    candidates and merging once makes the merge cost independent of the
    number of chunks. The approximate final merge is safe: candidate
    columns are k-sorted blocks, which approx_max_k's tile reduction
    handles at its stated recall.
    """
    if exact or vals.shape[-1] <= k:
        mv, top = jax.lax.top_k(vals, min(k, vals.shape[-1]))
    else:
        mv, top = jax.lax.approx_max_k(vals, k, recall_target=recall)
    return mv, jnp.take_along_axis(ids, top, axis=-1)


def _mask_last_chunk(s, ci, n_chunks, chunk, n):
    """Mask zero-vector pad docs (they exist only in the last chunk). Guarded
    by lax.cond so the full-score-tensor mask pays its HBM round-trip for one
    chunk, not all of them; pad docs score exactly 0 and could otherwise
    displace negative true scores from the candidate set."""
    if n % chunk == 0:
        return s
    iota = jnp.arange(chunk, dtype=jnp.int32)[None, :]
    return jax.lax.cond(
        ci == n_chunks - 1,
        lambda x: jnp.where(ci * chunk + iota < n, x, NEG),
        lambda x: x,
        s,
    )


def _pad_corpus(corpus: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, int]:
    n = corpus.shape[0]
    pad = (-n) % chunk
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    return corpus, n


@partial(jax.jit, static_argnames=("k", "chunk", "exact", "recall"))
def dense_topk(
    queries: jnp.ndarray,   # [B, D]
    corpus: jnp.ndarray,    # [N, D] (any dtype; matmul accumulates f32)
    k: int = 100,
    chunk: int = 16384,
    exact: bool = False,
    recall: float = DEFAULT_RECALL,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inner-product top-k: -> (scores [B, k] f32 desc, ids [B, k] i32).

    Streams the corpus in `chunk`-document tiles; peak memory is
    O(B * (k + chunk)) instead of O(B * N). Per-chunk candidates come from
    `approx_max_k` (default) or exact `top_k`; the running merge across
    chunks is always an exact top_k over 2k candidates.
    """
    B = queries.shape[0]
    corpus, n = _pad_corpus(corpus, chunk)
    n_chunks = corpus.shape[0] // chunk
    q = queries.astype(corpus.dtype)

    def body(_, ci):
        block = jax.lax.dynamic_slice_in_dim(corpus, ci * chunk, chunk, axis=0)
        s = jnp.dot(q, block.T, preferred_element_type=jnp.float32)  # [B, chunk]
        s = _mask_last_chunk(s, ci, n_chunks, chunk, n)
        cv, cidx = _chunk_topk(s, k, exact, recall)                  # [B, k]
        return None, (cv, cidx.astype(jnp.int32) + ci * chunk)

    _, (cand_v, cand_i) = jax.lax.scan(body, None, jnp.arange(n_chunks, dtype=jnp.int32))
    # [n_chunks, B, k] -> [B, n_chunks*k]; padding rows (zero vectors beyond
    # n) are masked HERE on the tiny candidate set — masking the full score
    # tensor per chunk would cost an extra HBM round-trip of R*B*N floats.
    cand_v = jnp.moveaxis(cand_v, 0, 1).reshape(B, n_chunks * k)
    cand_i = jnp.moveaxis(cand_i, 0, 1).reshape(B, n_chunks * k)
    cand_v = jnp.where(cand_i < n, cand_v, NEG)
    vals, ids = _final_merge(cand_v, cand_i, k, exact=True, recall=recall)
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals, ids


@partial(jax.jit, static_argnames=("k", "chunk", "exact", "recall"))
def multi_view_topk(
    queries: jnp.ndarray,    # [B, D]
    view_proj: jnp.ndarray,  # [R, D, Dv] per-retriever query projection
    corpus: jnp.ndarray,     # [N, Dv]
    k: int = 100,
    chunk: int = 16384,
    exact: bool = False,
    recall: float = DEFAULT_RECALL,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """R retriever views over one corpus -> (scores [R, B, k], ids [R, B, k]).

    Models a multi-retriever ensemble whose retrievers differ in query
    encoding (the projection); scoring shares the corpus stream so the
    HBM read of E is amortized across all R views. The [R, B] leading axes
    fold into one top-k row dimension per chunk.
    """
    qv = jnp.einsum(
        "bd,rdv->rbv", queries.astype(jnp.float32), view_proj.astype(jnp.float32)
    ).astype(corpus.dtype)
    R, B, _ = qv.shape
    qflat = qv.reshape(R * B, -1)
    corpus, n = _pad_corpus(corpus, chunk)
    n_chunks = corpus.shape[0] // chunk

    def body(_, ci):
        block = jax.lax.dynamic_slice_in_dim(corpus, ci * chunk, chunk, axis=0)
        s = jnp.dot(qflat, block.T, preferred_element_type=jnp.float32)  # [R*B, chunk]
        s = _mask_last_chunk(s, ci, n_chunks, chunk, n)
        cv, cidx = _chunk_topk(s, k, exact, recall)
        return None, (cv, cidx.astype(jnp.int32) + ci * chunk)

    _, (cand_v, cand_i) = jax.lax.scan(body, None, jnp.arange(n_chunks, dtype=jnp.int32))
    cand_v = jnp.moveaxis(cand_v, 0, 1).reshape(R * B, n_chunks * k)
    cand_i = jnp.moveaxis(cand_i, 0, 1).reshape(R * B, n_chunks * k)
    cand_v = jnp.where(cand_i < n, cand_v, NEG)  # mask pad docs on candidates only
    vals, ids = _final_merge(cand_v, cand_i, k, exact=True, recall=recall)
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals.reshape(R, B, k), ids.reshape(R, B, k)


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
