"""Mesh-sharded retrieval: corpus-parallel dense top-k with ICI merge.

The corpus embedding matrix is sharded row-wise over the ``corpus`` mesh axis
and the query batch over ``data``. Each chip runs the local streaming top-k
(ops.dense), then partial results merge with a tiled `all_gather` + `top_k`
over the corpus axis — a binary-tree/all-gather top-k merge riding ICI,
replacing the reference's sequential segment search + host merge-sort
(reference src/retrievers/bge.py:216-237).

Communication cost per query batch is O(B * k * n_corpus_shards) values —
independent of corpus size N.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from qpp_fusion_rag_tpu.ops import dense
from qpp_fusion_rag_tpu.parallel.mesh import CORPUS_AXIS, DATA_AXIS


def _merge_over_corpus(vals: jnp.ndarray, ids: jnp.ndarray, k: int):
    """Inside shard_map: merge per-shard top-k buffers over the corpus axis.

    vals/ids: [..., k] local buffers with *global* doc ids.
    all_gather(tiled) -> [..., k * n_shards] -> top_k.
    """
    all_vals = jax.lax.all_gather(vals, CORPUS_AXIS, axis=vals.ndim - 1, tiled=True)
    all_ids = jax.lax.all_gather(ids, CORPUS_AXIS, axis=ids.ndim - 1, tiled=True)
    merged, top = jax.lax.top_k(all_vals, k)
    return merged, jnp.take_along_axis(all_ids, top, axis=-1)


def _pad_corpus(corpus: jnp.ndarray, n_shards: int) -> Tuple[jnp.ndarray, int]:
    """Zero-pad rows so N divides the corpus-axis size. Padded rows score 0
    and are masked to (-inf, -1) by global id before the ICI merge — at most
    n_shards-1 pad rows exist, all in the last shard, so they can displace at
    most that many all-negative-score candidates from one local top-k."""
    n_real = corpus.shape[0]
    pad = (-n_real) % n_shards
    if pad:
        corpus = jnp.concatenate(
            [corpus, jnp.zeros((pad, corpus.shape[1]), corpus.dtype)], axis=0
        )
    return corpus, n_real


def sharded_dense_topk(
    queries: jnp.ndarray,   # [B, D]  sharded over data
    corpus: jnp.ndarray,    # [N, D]  sharded over corpus (padded if needed)
    mesh: Mesh,
    k: int = 100,
    chunk: int = 8192,
    exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed top-k -> (scores [B, k], global ids [B, k])."""
    corpus, n_real = _pad_corpus(corpus, mesh.shape[CORPUS_AXIS])

    def local(q, c):
        vals, ids = dense.dense_topk(q, c, k=k, chunk=min(chunk, c.shape[0]), exact=exact)
        shard = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32)
        gids = ids + shard * c.shape[0]
        keep = (ids >= 0) & (gids < n_real)      # drop zero-pad rows
        ids = jnp.where(keep, gids, -1)
        vals = jnp.where(keep, vals, -jnp.inf)
        return _merge_over_corpus(vals, ids, k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(CORPUS_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_rep=False,
    )
    return jax.jit(fn)(queries, corpus)


def sharded_multi_view_topk(
    queries: jnp.ndarray,    # [B, D]   sharded over data
    view_proj: jnp.ndarray,  # [R, D, Dv] replicated
    corpus: jnp.ndarray,     # [N, Dv]  sharded over corpus
    mesh: Mesh,
    k: int = 100,
    chunk: int = 8192,
    exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed R-view retrieval -> (scores [R, B, k], ids [R, B, k])."""
    corpus, n_real = _pad_corpus(corpus, mesh.shape[CORPUS_AXIS])

    def local(q, proj, c):
        vals, ids = dense.multi_view_topk(q, proj, c, k=k, chunk=min(chunk, c.shape[0]), exact=exact)
        shard = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32)
        gids = ids + shard * c.shape[0]
        keep = (ids >= 0) & (gids < n_real)
        ids = jnp.where(keep, gids, -1)
        vals = jnp.where(keep, vals, -jnp.inf)
        return _merge_over_corpus(vals, ids, k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(None, None, None), P(CORPUS_AXIS, None)),
        out_specs=(P(None, DATA_AXIS, None), P(None, DATA_AXIS, None)),
        check_rep=False,
    )
    return jax.jit(fn)(queries, view_proj, corpus)
