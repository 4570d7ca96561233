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


def shard_sparse_csr(
    offsets,                 # [T+1] int CSR term offsets (impact-ordered runs)
    flat_docs,               # [P] int32 doc ids
    flat_weights,            # [P] f32 impacts
    n_docs: int,
    n_shards: int,
):
    """Partition CSR impact lists by contiguous doc range into n_shards
    stacked per-shard indexes (the sparse analogue of the dense corpus row
    split; reference segmenting idea: src/indexing/hnsw.py:64-202).

    Shard s owns docs [s*ceil(N/S), (s+1)*ceil(N/S)); each term's posting
    run is split by that range WITHOUT re-sorting, so per-term impact order
    is preserved shard-locally and p_cap pruning stays impact-correct.
    Returns numpy arrays shaped for shard_map (leading shard axis):
        offsets_s [S, T+1] int32 (local CSR),
        docs_s    [S, Pmax] int32 LOCAL doc ids,
        weights_s [S, Pmax] f32,
        doc_base  [S] int32 global id of each shard's doc 0.
    """
    import numpy as np

    offsets = np.asarray(offsets, dtype=np.int64)
    flat_docs = np.asarray(flat_docs)
    flat_weights = np.asarray(flat_weights)
    T = len(offsets) - 1
    per = -(-n_docs // n_shards)
    doc_base = (np.arange(n_shards) * per).astype(np.int32)
    shard_of = np.minimum(flat_docs // per, n_shards - 1).astype(np.int32)

    # stable sort postings by (term, shard) keeping impact order within runs
    term_of = np.repeat(np.arange(T, dtype=np.int64), np.diff(offsets))
    order = np.argsort(term_of * n_shards + shard_of, kind="stable")
    s_docs = flat_docs[order]
    s_w = flat_weights[order]
    s_shard = shard_of[order]
    s_term = term_of[order]

    counts = np.zeros((n_shards, T), dtype=np.int64)
    np.add.at(counts, (s_shard, s_term), 1)
    p_max = int(counts.sum(axis=1).max()) if len(s_docs) else 0
    offsets_s = np.zeros((n_shards, T + 1), dtype=np.int32)
    np.cumsum(counts, axis=1, out=offsets_s[:, 1:])
    docs_s = np.zeros((n_shards, max(p_max, 1)), dtype=np.int32)
    weights_s = np.zeros((n_shards, max(p_max, 1)), dtype=np.float32)
    # postings of shard s are the subsequence with s_shard == s, already in
    # (term, impact) order thanks to the stable sort
    for s in range(n_shards):
        m = s_shard == s
        cnt = int(m.sum())
        docs_s[s, :cnt] = s_docs[m] - doc_base[s]
        weights_s[s, :cnt] = s_w[m]
    return offsets_s, docs_s, weights_s, doc_base


def sharded_sparse_topk(
    q_terms,                 # [B, Tq] int32 (-1 pad)     sharded over data
    q_weights,               # [B, Tq] f32                sharded over data
    offsets_s,               # [S, T+1] int32             sharded over corpus
    docs_s,                  # [S, Pmax] int32 local ids  sharded over corpus
    weights_s,               # [S, Pmax] f32              sharded over corpus
    doc_base,                # [S] int32                  sharded over corpus
    mesh: Mesh,
    n_docs: int,
    k: int = 100,
    p_cap: int = 1024,
    exact_topk: bool = True,
):
    """Distributed sparse top-k -> (scores [B, k], GLOBAL doc ids [B, k]).

    Each chip scores its doc-range partition with the shared CSR kernel
    (ops.sparse.sparse_score_topk), then partials merge over the corpus
    axis with the same tiled all_gather + top_k as the dense path."""
    from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk

    def local(qt, qw, off, docs, w, base):
        vals, ids = sparse_score_topk(
            docs[0], w[0], off[0], qt, qw, k=k, p_cap=p_cap,
            exact_topk=exact_topk,
        )
        gids = ids + base[0]
        keep = (ids >= 0) & (gids < n_docs)
        ids = jnp.where(keep, gids, -1)
        vals = jnp.where(keep, vals, -jnp.inf)
        return _merge_over_corpus(vals, ids, k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None), P(DATA_AXIS, None),
            P(CORPUS_AXIS, None), P(CORPUS_AXIS, None),
            P(CORPUS_AXIS, None), P(CORPUS_AXIS),
        ),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_rep=False,
    )
    return jax.jit(fn)(q_terms, q_weights, offsets_s, docs_s, weights_s, doc_base)


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


def sharded_ensemble_step(
    bm25_terms,              # [B, T1] int32 (-1 pad)   sharded over data
    bm25_qw,                 # [B, T1] f32
    splade_terms,            # [B, T2] int32
    splade_qw,               # [B, T2] f32
    q_emb,                   # [B, D] f32               sharded over data
    rerank_proj,             # [2, D, D] f32            replicated
    text_feats,              # [B, 4] f32               sharded over data
    bm25_shards,             # shard_sparse_csr output (offsets_s, docs_s, weights_s, doc_base)
    splade_shards,
    corpus,                  # [N, D] f32 rows          sharded over corpus
    mesh: Mesh,
    n_docs: int,
    k: int = 100,
    k_out: int = 100,
    p_cap: int = 1024,
    qpp_index: int = 5,
):
    """The FULL heterogeneous 5-view ensemble over a (data, corpus) mesh:
    BM25 + SPLADE (doc-range-partitioned CSR), dense, and two shared-
    candidate rerank views, then QPP + weighted fusion — one shard_map
    program, all cross-chip traffic on ICI.

    Per-view communication: sparse/dense partial top-k merges are the
    tiled all_gather + top_k of sharded_dense_topk (O(B·k·S) values);
    the rerank views assemble candidate vectors with ONE psum over the
    corpus axis (each shard contributes the rows of its doc range), then
    score replicated. QPP + fusion compute replicated per corpus member
    on the merged [5, B_loc, k] runs — O(B·k) work, cheaper than a
    round-trip reshard. Multi-chip analogue of
    pipeline.ensemble.ensemble_retrieval_step (single-chip production
    path keeps the Pallas int8/q8 kernels; this composition is the
    scale-out correctness/reference path — the Pallas kernels slot into
    `local` per shard on real hardware).
    -> (fused_ids [B, k_out], fused_scores [B, k_out], qpp [5, B, 13]).
    """
    from qpp_fusion_rag_tpu.ops import fusion as F
    from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk
    from qpp_fusion_rag_tpu.pipeline.engine import qpp_from_runs, weight_and_fuse

    corpus, n_real = _pad_corpus(corpus, mesh.shape[CORPUS_AXIS])

    def sparse_local(qt, qw, off, docs, w, base):
        vals, ids = sparse_score_topk(
            docs[0], w[0], off[0], qt, qw, k=k, p_cap=p_cap, exact_topk=True,
        )
        gids = ids + base[0]
        keep = (ids >= 0) & (gids < n_docs)
        return _merge_over_corpus(
            jnp.where(keep, vals, -jnp.inf), jnp.where(keep, gids, -1), k
        )

    def local(bt, bw, st, sw, q, proj, tf,
              b_off, b_docs, b_w, b_base, s_off, s_docs, s_w, s_base, c):
        bm25_s, bm25_i = sparse_local(bt, bw, b_off, b_docs, b_w, b_base)
        spl_s, spl_i = sparse_local(st, sw, s_off, s_docs, s_w, s_base)

        # dense view over the local row range
        shard = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32)
        scores = q @ c.T                                   # [B_loc, N_loc]
        lv, li = jax.lax.top_k(scores, min(k, c.shape[0]))
        gids = li + shard * c.shape[0]
        keep = gids < n_real
        dense_s, dense_i = _merge_over_corpus(
            jnp.where(keep, lv, -jnp.inf), jnp.where(keep, gids, -1), k
        )

        # rerank views: assemble candidate vectors with one psum
        base = shard * c.shape[0]
        safe = jnp.maximum(bm25_i, 0)
        local_idx = jnp.clip(safe - base, 0, c.shape[0] - 1)
        own = (safe >= base) & (safe < base + c.shape[0])
        cand_local = jnp.where(own[..., None], c[local_idx], 0.0)
        cand = jax.lax.psum(cand_local, CORPUS_AXIS)       # [B_loc, K, D]
        qv = jnp.einsum("bd,vdw->vbw", q, proj)            # [2, B_loc, D]
        rs = jnp.einsum("vbd,bkd->vbk", qv, cand)
        rs = jnp.where(bm25_i >= 0, rs, -jnp.inf)
        order = jnp.argsort(-rs, axis=-1)
        rids = jnp.broadcast_to(jnp.where(bm25_i >= 0, bm25_i, -1), rs.shape)
        rr_s = jnp.take_along_axis(rs, order, axis=-1)
        rr_i = jnp.take_along_axis(rids, order, axis=-1)

        vals = jnp.stack([bm25_s, spl_s, dense_s, rr_s[0], rr_s[1]])
        ids = jnp.stack([bm25_i, spl_i, dense_i, rr_i[0], rr_i[1]])
        # QPP min-max normalization couples across the WHOLE query batch
        # (reference src/qpp.py:340-374 semantics); with the batch sharded
        # over `data`, the extrema must be global — pmin/pmax over the
        # data axis, then the same (v - min)/(max - min) as normalize_qpp
        qpp = qpp_from_runs(vals, ids, tf, normalize=False)
        vmin = jax.lax.pmin(jnp.min(qpp, axis=1, keepdims=True), DATA_AXIS)
        vmax = jax.lax.pmax(jnp.max(qpp, axis=1, keepdims=True), DATA_AXIS)
        scale = jnp.where(vmax > vmin, vmax - vmin, 1.0)
        qpp = jnp.where(vmax > vmin, (qpp - vmin) / scale, 0.5)
        norm = F._row_minmax(vals, ids >= 0, fill=-jnp.inf)
        fused_ids, fused_scores = weight_and_fuse(
            ids, norm, qpp[..., qpp_index], k_out=k_out
        )
        return fused_ids, fused_scores, qpp

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None), P(DATA_AXIS, None),
            P(DATA_AXIS, None), P(DATA_AXIS, None),
            P(DATA_AXIS, None), P(None, None, None), P(DATA_AXIS, None),
            P(CORPUS_AXIS, None), P(CORPUS_AXIS, None),
            P(CORPUS_AXIS, None), P(CORPUS_AXIS),
            P(CORPUS_AXIS, None), P(CORPUS_AXIS, None),
            P(CORPUS_AXIS, None), P(CORPUS_AXIS),
            P(CORPUS_AXIS, None),
        ),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None),
                   P(None, DATA_AXIS, None)),
        check_rep=False,
    )
    return jax.jit(fn)(
        bm25_terms, bm25_qw, splade_terms, splade_qw, q_emb, rerank_proj,
        text_feats, *bm25_shards, *splade_shards, corpus,
    )
