"""Heterogeneous ensemble serving step: the reference's actual retriever
mix — sparse + dense + two-stage reranked — in ONE compiled program.

The reference's stage-02 ensemble is BM25, SPLADE, BGE, BM25→TCT-ColBERT
and BM25→MonoT5 run as five separate processes over files (reference
scripts/02_retrieve.py:98-284). Here the same *structure* executes as a
single jitted step over a shared doc-id space:

    view 1: BM25 impacts      — CSR posting windows (ops.sparse)
    view 2: SPLADE impacts    — second CSR with learned-impact stats
    view 3: dense             — int8 MXU kernel (ops.pallas.dense_topk)
    view 4: BM25→dense rerank — gather BM25's top-k candidate vectors,
    view 5: BM25→dense rerank   rescore with a per-view projection

The rerank views are two-stage by construction (candidates from the
sparse first stage, scores from a second-stage model), with a bi-encoder
second stage: a full cross-encoder forward at serving rate is not a
single-digit-millisecond op on any hardware — the reference runs MonoT5
offline for the same reason. QPP + weighted fusion then run exactly as
in the dense flagship step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from qpp_fusion_rag_tpu.ops import fusion as F
from qpp_fusion_rag_tpu.ops.sparse import (
    sparse_rescore_topk_packed,
    sparse_score_topk_packed,
)
from qpp_fusion_rag_tpu.pipeline.engine import qpp_from_runs, weight_and_fuse


class EnsembleIndexes(NamedTuple):
    """Device arrays for the 5-view ensemble (shared doc-id space 0..N).

    Sparse views store PACKED postings — (doc << 8 | uint8 impact) int32,
    ops.sparse.pack_postings — halving the window-gather HBM traffic that
    dominates sparse cost at p_cap >= 2048."""
    bm25_packed: jnp.ndarray     # [P1] int32
    bm25_scales: jnp.ndarray     # [T1] f32
    bm25_offsets: jnp.ndarray    # [T1+1] int32
    splade_packed: jnp.ndarray   # [P2] int32
    splade_scales: jnp.ndarray   # [T2] f32
    splade_offsets: jnp.ndarray  # [T2+1] int32
    corpus_int: jnp.ndarray      # [D, N] int8 (dense kernel layout)
    corpus_rows: jnp.ndarray     # [N, D] int8 (rerank gather layout)
    d_scale: jnp.ndarray         # [1, N] f32


def rerank_candidates(
    q_vec: jnp.ndarray,        # [B, D] or [V, B, D] second-stage queries
    cand_ids: jnp.ndarray,     # [B, K] first-stage doc ids (-1 pad)
    corpus_rows: jnp.ndarray,  # [N, D] int8
    d_scale: jnp.ndarray,      # [1, N] f32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage rerank: gather candidate vectors, rescore, re-sort.
    -> (scores [..., B, K] desc, ids [..., B, K]). ~10 ms per 1024x100
    on v5e — the candidate-vector gather dominates, so multiple rerank
    views over the SAME candidates pass stacked queries [V, B, D] and
    share one gather."""
    B, K = cand_ids.shape
    safe = jnp.maximum(cand_ids, 0)
    cand = jnp.take(corpus_rows, safe.reshape(-1), axis=0)
    cand = cand.reshape(B, K, -1).astype(jnp.bfloat16)
    s = jnp.einsum("...bd,bkd->...bk", q_vec.astype(jnp.bfloat16), cand,
                   preferred_element_type=jnp.float32)
    s = s * d_scale[0][safe]
    s = jnp.where(cand_ids >= 0, s, -jnp.inf)
    order = jnp.argsort(-s, axis=-1)
    ids = jnp.broadcast_to(jnp.where(cand_ids >= 0, cand_ids, -1), s.shape)
    return jnp.take_along_axis(s, order, axis=-1), jnp.take_along_axis(
        ids, order, axis=-1)


@partial(jax.jit, static_argnames=(
    "k", "k_out", "p_cap", "method", "qpp_index", "sparse_candidates",
    "sparse_mode"))
def ensemble_retrieval_step(
    idx: EnsembleIndexes,
    bm25_terms: jnp.ndarray,    # [B, T_bm] int32 (-1 pad)
    bm25_qw: jnp.ndarray,       # [B, T_bm] f32
    splade_terms: jnp.ndarray,  # [B, T_sp] int32
    splade_qw: jnp.ndarray,     # [B, T_sp] f32
    q_emb: jnp.ndarray,         # [B, D] dense query embedding
    rerank_proj: jnp.ndarray,   # [2, D, D] second-stage projections
    text_feats: jnp.ndarray,    # [B, 4]
    k: int = 100,
    k_out: int = 100,
    p_cap: int = 2048,
    method: int = F.COMBSUM,
    qpp_index: int = 5,         # RSD
    sparse_candidates: int = 0,
    sparse_mode: str = "sort",
    mlp_params=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """5-view heterogeneous retrieve → QPP → weighted fuse.
    -> (fused_ids [B, k_out], fused_scores [B, k_out], qpp [5, B, 13]).

    sparse_mode picks the sparse scorer:
      "sort" — segmented pair sort (exact dedup; the default),
      "q8"   — quantized single-key sort (recall@100 0.992, ~10-20%
               faster sort; ops.sparse.sparse_score_topk_q8),
    and sparse_candidates > 0 overrides both with the sort-free rescore
    kernel (pool = candidates·k, recall@100 >= 0.99 at 8) — MEASURED
    SLOWER at bench shapes (256 vs 184 ms/batch: the [B, pool, M] match
    materializes) but the winner at small M. All modes use the Pallas
    DMA window gather on TPU (ops.pallas.window_gather)."""
    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import pallas_dense_topk_int8
    from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk_q8

    if sparse_candidates > 0:
        def sparse(packed, offsets, scales, terms, qw):
            return sparse_rescore_topk_packed(
                packed, offsets, scales, terms, qw,
                k=k, p_cap=p_cap, candidates=sparse_candidates)
    elif sparse_mode == "q8":
        def sparse(packed, offsets, scales, terms, qw):
            return sparse_score_topk_q8(
                packed, offsets, scales, terms, qw,
                k=k, p_cap=p_cap, exact_topk=False)
    else:
        def sparse(packed, offsets, scales, terms, qw):
            return sparse_score_topk_packed(
                packed, offsets, scales, terms, qw,
                k=k, p_cap=p_cap, exact_topk=False)

    bm25_s, bm25_i = sparse(
        idx.bm25_packed, idx.bm25_offsets, idx.bm25_scales,
        bm25_terms, bm25_qw,
    )
    splade_s, splade_i = sparse(
        idx.splade_packed, idx.splade_offsets, idx.splade_scales,
        splade_terms, splade_qw,
    )
    dense_s, dense_i = pallas_dense_topk_int8(
        q_emb, idx.corpus_int, idx.d_scale, k=k,
    )
    qv = jnp.einsum("bd,vdw->vbw", q_emb.astype(jnp.float32), rerank_proj)
    rr_s, rr_i = rerank_candidates(qv, bm25_i, idx.corpus_rows, idx.d_scale)
    rr1_s, rr1_i, rr2_s, rr2_i = rr_s[0], rr_i[0], rr_s[1], rr_i[1]

    vals = jnp.stack([bm25_s, splade_s, dense_s, rr1_s, rr2_s])   # [5, B, K]
    ids = jnp.stack([bm25_i, splade_i, dense_i, rr1_i, rr2_i])
    qpp = qpp_from_runs(vals, ids, text_feats)
    norm = F._row_minmax(vals, ids >= 0, fill=-jnp.inf)
    if mlp_params is not None:
        # learned fusion: per-query softmax weights from the 5x13 QPP
        # feature block (serving analogue of learned_fused_retrieval_step)
        from qpp_fusion_rag_tpu.pipeline.engine import mlp_apply

        R, B, M = qpp.shape
        feats = jnp.transpose(qpp, (1, 0, 2)).reshape(B, R * M)
        weights = jax.nn.softmax(mlp_apply(mlp_params, feats), axis=-1).T
    else:
        weights = qpp[..., qpp_index]
    fused_ids, fused_scores = weight_and_fuse(
        ids, norm, weights, method=method, k_out=k_out
    )
    return fused_ids, fused_scores, qpp
