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

The per-view primitives below (make_sparse_scorer / dense_view_topk /
score_candidates / minmax_extrema + apply_minmax) are THE shared
implementations: `ensemble_retrieval_step` composes them single-chip and
`parallel.sharded.sharded_ensemble_step` composes the very same functions
per corpus shard inside shard_map — the only differences at scale are
global-id offsets, the ICI top-k merges, and the psum candidate-vector
assembly. One code path, one kernel set, two compositions.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from qpp_fusion_rag_tpu.ops import fusion as F
from qpp_fusion_rag_tpu.ops.sparse import (
    sparse_rescore_topk_packed,
    sparse_score_topk_packed,
    sparse_score_topk_q8,
    sparse_score_topk_q8_certified,
    sparse_score_topk_q8_rescored,
)
from qpp_fusion_rag_tpu.pipeline.engine import qpp_from_runs, weight_and_fuse


class EnsembleIndexes(NamedTuple):
    """Device arrays for the 5-view ensemble (shared doc-id space 0..N).

    Sparse views store PACKED postings — (doc << 8 | uint8 impact) int32,
    ops.sparse.pack_postings — halving the window-gather HBM traffic that
    dominates sparse cost at p_cap >= 2048.

    The optional doc-major fields power the RANK-SAFE sparse mode
    (sparse_mode="q8r"): ops.sparse.pack_doc_vectors rows used to exactly
    rescore candidate docs against their FULL term contributions,
    restoring the reference's exhaustive-scoring rank semantics
    (src/retrievers/splade.py:75-80) at window-kernel speed."""
    bm25_packed: jnp.ndarray     # [P1] int32
    bm25_scales: jnp.ndarray     # [T1] f32
    bm25_offsets: jnp.ndarray    # [T1+1] int32
    splade_packed: jnp.ndarray   # [P2] int32
    splade_scales: jnp.ndarray   # [T2] f32
    splade_offsets: jnp.ndarray  # [T2+1] int32
    corpus_int: jnp.ndarray      # [D, N] int8 (dense kernel layout)
    corpus_rows: jnp.ndarray     # [N, D] int8 (rerank gather layout)
    d_scale: jnp.ndarray         # [1, N] f32
    bm25_doc_packed: Optional[jnp.ndarray] = None    # [N, Td1] int32
    bm25_doc_scale: Optional[jnp.ndarray] = None     # [N] f32
    splade_doc_packed: Optional[jnp.ndarray] = None  # [N, Td2] int32
    splade_doc_scale: Optional[jnp.ndarray] = None   # [N] f32
    # metadata, not a device leaf: the imp_bits the doc_packed fields were
    # built with (ops.sparse.pack_doc_vectors). The step entry points
    # inherit it and refuse a conflicting explicit doc_imp_bits — a
    # mismatch mis-splits the packed term/impact fields and silently
    # corrupts rescored scores. Stripped (set to None) before tracing.
    doc_imp_bits: Optional[int] = None
    # per-doc largest DROPPED weight when the doc vectors were built with
    # doc_cap (pack_doc_vectors return_tail) — REQUIRED for sparse_mode
    # 'q8c' on capped vectors, else certificates silently overclaim
    bm25_tail: Optional[jnp.ndarray] = None          # [N] f32
    splade_tail: Optional[jnp.ndarray] = None        # [N] f32


# =============================================================================
# Shared per-view primitives (single-chip AND per-shard inside shard_map)
# =============================================================================

def make_sparse_scorer(sparse_mode: str, sparse_candidates: int,
                       k: int, p_cap: int, imp_bits: int = 8,
                       presorted: bool = False, sort_ids: bool = False):
    """-> scorer(packed, offsets, scales, terms, qw, doc_packed, doc_scale)
    -> (scores [B, k] desc, doc ids [B, k], -1 pad; LOCAL ids on a shard).

    sparse_mode:
      "sort" — segmented pair sort (exact dedup over the windows),
      "q8"   — quantized single-key sort (recall@100 0.992 vs "sort",
               ~10-20% faster; ops.sparse.sparse_score_topk_q8),
      "q8r"  — RANK-SAFE mode: q8 generates a top-pool of
               `sparse_candidates` (default 512) candidates, every one
               exactly rescored against its full doc vector
               (ops.sparse.sparse_score_topk_q8_rescored; recall@10 vs
               full-depth exact 0.98 at 1024 / 0.99 at 2048 candidates,
               nDCG@10 retention 0.9995 / 1.0000 —
               docs/quality_rescore.json).
    sparse_candidates > 0 with mode "sort"/"q8" selects the sort-free
    window-rescore kernel instead (pool = candidates·k) — the winner at
    small window counts, slower at bench shapes.

    presorted=True (q8/q8r only) reads the DUAL doc-ordered posting
    layout (ops.sparse.pack_postings_presorted, built at cap == p_cap):
    gathered windows arrive pre-sorted so the Pallas bitonic network
    skips its first log2(p_cap) rounds — identical candidates/scores,
    fewer sort stages."""
    if sparse_mode == "q8r":
        cand = sparse_candidates if sparse_candidates > 0 else 512

        def scorer(packed, offsets, scales, terms, qw,
                   doc_packed=None, doc_scale=None):
            if doc_packed is None:
                raise ValueError(
                    "sparse_mode='q8r' needs doc-major vectors "
                    "(pack_doc_vectors) on the index")
            return sparse_score_topk_q8_rescored(
                packed, offsets, scales, doc_packed, doc_scale,
                terms, qw, k=k, p_cap=p_cap, candidates=cand,
                imp_bits=imp_bits, presorted=presorted, sort_ids=sort_ids)
    elif sparse_mode == "q8c":
        # CERTIFIED rank-exact mode: q8r plus a per-query exactness
        # certificate (ops.sparse.sparse_score_topk_q8_certified) — the
        # scorer returns a 4-tuple (scores, ids, certified [B], slack [B]);
        # callers AND the certificates across views and escalate the
        # uncertified queries (the reference's Lucene/Terrier traversal
        # is exact by construction, src/retrievers/bm25.py:43-52 — this
        # mode PROVES the same guarantee per query at window-kernel cost)
        cand = sparse_candidates if sparse_candidates > 0 else 1024
        if sort_ids:
            raise ValueError(
                "sparse_mode='q8c' does not support sort_ids (measured "
                "no benefit on q8r — docs/KERNEL_NOTES.md — so the "
                "certified kernel never grew the plumbing)")

        def scorer(packed, offsets, scales, terms, qw,
                   doc_packed=None, doc_scale=None, tail=None):
            if doc_packed is None:
                raise ValueError(
                    "sparse_mode='q8c' needs doc-major vectors "
                    "(pack_doc_vectors) on the index")
            return sparse_score_topk_q8_certified(
                packed, offsets, scales, doc_packed, doc_scale,
                terms, qw, k=k, p_cap=p_cap, candidates=cand,
                imp_bits=imp_bits, presorted=presorted, tail_max=tail)
    elif sparse_candidates > 0:
        if presorted:
            raise ValueError(
                "the sort-free window-rescore kernel (sparse_candidates > 0 "
                "with mode 'sort'/'q8') does not support the presorted dual "
                "layout (it would double-count the asc+desc copies); use "
                "sparse_mode 'q8r' for a rescored presorted config")
        def scorer(packed, offsets, scales, terms, qw,
                   doc_packed=None, doc_scale=None):
            return sparse_rescore_topk_packed(
                packed, offsets, scales, terms, qw,
                k=k, p_cap=p_cap, candidates=sparse_candidates)
    elif sparse_mode == "q8":
        def scorer(packed, offsets, scales, terms, qw,
                   doc_packed=None, doc_scale=None):
            return sparse_score_topk_q8(
                packed, offsets, scales, terms, qw,
                k=k, p_cap=p_cap, exact_topk=False, presorted=presorted)
    elif sparse_mode == "sort":
        if presorted:
            raise ValueError(
                "presorted layout needs sparse_mode 'q8' or 'q8r'")
        def scorer(packed, offsets, scales, terms, qw,
                   doc_packed=None, doc_scale=None):
            return sparse_score_topk_packed(
                packed, offsets, scales, terms, qw,
                k=k, p_cap=p_cap, exact_topk=False)
    else:
        raise ValueError(f"unknown sparse_mode {sparse_mode!r}")
    return scorer


def dense_view_topk(q_emb: jnp.ndarray, corpus_int: jnp.ndarray,
                    d_scale: jnp.ndarray, k: int):
    """Production dense view: int8 MXU fused top-k (Pallas; interpret mode
    off-TPU). -> (scores [B, k], ids [B, k] local to `corpus_int`)."""
    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import pallas_dense_topk_int8

    return pallas_dense_topk_int8(q_emb, corpus_int, d_scale, k=k)


def score_candidates(
    q_vec: jnp.ndarray,       # [..., B, D] second-stage queries
    cand: jnp.ndarray,        # [B, K, D] candidate vectors (int8 or f32)
    cand_ids: jnp.ndarray,    # [B, K] first-stage doc ids (-1 pad)
    scale_vals: Optional[jnp.ndarray] = None,  # [B, K] per-candidate scales
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared second-stage scoring: bf16 einsum over candidate vectors,
    optional per-candidate dequant scale, then per-view re-sort.
    -> (scores [..., B, K] desc, ids [..., B, K])."""
    s = jnp.einsum("...bd,bkd->...bk", q_vec.astype(jnp.bfloat16),
                   cand.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    if scale_vals is not None:
        s = s * scale_vals
    s = jnp.where(cand_ids >= 0, s, -jnp.inf)
    ids = jnp.broadcast_to(cand_ids, s.shape)   # pad value is already -1
    # key/payload sort: ~2x the argsort + 2x take_along_axis formulation
    # at [2, 1024, 100] on v5e (one permute instead of sort+two gathers)
    neg, out_ids = jax.lax.sort((-s, ids), dimension=-1, num_keys=1)
    return -neg, out_ids


def rerank_candidates(
    q_vec: jnp.ndarray,        # [B, D] or [V, B, D] second-stage queries
    cand_ids: jnp.ndarray,     # [B, K] first-stage doc ids (-1 pad)
    corpus_rows: jnp.ndarray,  # [N, D] int8 (per-doc scaled) or bf16/f32
    d_scale: jnp.ndarray,      # [1, N] f32 (ignored for non-int8 rows)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage rerank: gather candidate vectors, rescore, re-sort.
    -> (scores [..., B, K] desc, ids [..., B, K]). ~10 ms per 1024x100
    on v5e — the candidate-vector gather dominates, so multiple rerank
    views over the SAME candidates pass stacked queries [V, B, D] and
    share one gather. (The sharded path assembles `cand` with a psum
    over the corpus axis instead, then calls the same score_candidates.)
    """
    B, K = cand_ids.shape
    safe = jnp.maximum(cand_ids, 0)
    cand = jnp.take(corpus_rows, safe.reshape(-1), axis=0).reshape(B, K, -1)
    scale = d_scale[0][safe] if corpus_rows.dtype == jnp.int8 else None
    return score_candidates(q_vec, cand, cand_ids, scale)


def dense_view_rescored(q_emb: jnp.ndarray, corpus_int: jnp.ndarray,
                        d_scale: jnp.ndarray, corpus_rows: jnp.ndarray,
                        k: int, pool: int):
    """RANK-SAFE dense view: int8 MXU kernel generates a top-`pool`
    candidate set, then the pooled rows are rescored at the row storage
    precision (bf16 rows lift recall@10 from the int8 kernel's ~0.96 to
    the bf16 ceiling ~0.998 vs f32 exact, docs/quality_int8.json) and
    re-ranked. The exact analogue of the sparse q8r mode.
    -> (scores [B, k], ids [B, k] local to `corpus_int`)."""
    cs, ci = dense_view_topk(q_emb, corpus_int, d_scale, max(pool, k))
    rs, ri = rerank_candidates(q_emb, ci, corpus_rows, d_scale)
    return rs[..., :k], ri[..., :k]


# QPP normalization helpers live in ops.qpp; re-exported here because the
# sharded composition (parallel.sharded) imports the per-view surface from
# this module.
from qpp_fusion_rag_tpu.ops.qpp import (   # noqa: E402  (re-export)
    apply_minmax,
    minmax_extrema,
    normalize_qpp_with,
    qpp_calibration_stats,
)


def fuse_tail(
    vals: jnp.ndarray,        # [R, B, K] raw view scores (desc)
    ids: jnp.ndarray,         # [R, B, K] global doc ids (-1 pad)
    qpp: jnp.ndarray,         # [R, B, 13] NORMALIZED QPP
    method: int,
    qpp_index: int,
    k_out: int,
    mlp_params=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared fusion tail: per-view .norm.res min-max + weighted fusion,
    weights from a QPP column or a learned MLP over the 5x13 features."""
    norm = F._row_minmax(vals, ids >= 0, fill=-jnp.inf)
    if mlp_params is not None:
        from qpp_fusion_rag_tpu.models.mlp import mlp_apply

        R, B, M = qpp.shape
        feats = jnp.transpose(qpp, (1, 0, 2)).reshape(B, R * M)
        weights = jax.nn.softmax(mlp_apply(mlp_params, feats), axis=-1).T
    else:
        weights = qpp[..., qpp_index]
    return weight_and_fuse(ids, norm, weights, method=method, k_out=k_out)


# =============================================================================
# Single-chip composition
# =============================================================================

@partial(jax.jit, static_argnames=(
    "k", "k_out", "p_cap", "method", "qpp_index", "sparse_candidates",
    "sparse_mode", "doc_imp_bits", "dense_rescore_pool",
    "sparse_presorted", "sparse_sort_ids"))
def _ensemble_retrieval_step(
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
    qpp_norm_stats: jnp.ndarray = None,   # [5, 2, 13] calibration min/max
    doc_imp_bits: int = 8,                # pack_doc_vectors precision
    dense_rescore_pool: int = 0,          # >0: rank-safe dense view
    sparse_presorted: bool = False,       # dual doc-ordered posting layout
    sparse_sort_ids: bool = False,        # ascending-address rescore gather
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """5-view heterogeneous retrieve → QPP → weighted fuse.
    -> (fused_ids [B, k_out], fused_scores [B, k_out], qpp [5, B, 13]);
    sparse_mode="q8c" appends (certified [B] bool, slack [B] f32) — the
    AND of both sparse views' rank-exactness certificates.

    See make_sparse_scorer for sparse_mode semantics ("q8r" is the
    rank-safe production mode; sparse_presorted reads the dual
    doc-ordered layout built by pack_postings_presorted at cap == p_cap).
    qpp_norm_stats switches QPP weight normalization from in-batch
    min-max to frozen calibration statistics (batch-size-invariant;
    qpp_calibration_stats)."""
    sparse = make_sparse_scorer(sparse_mode, sparse_candidates, k, p_cap,
                                imp_bits=doc_imp_bits,
                                presorted=sparse_presorted,
                                sort_ids=sparse_sort_ids)
    tails = ({"tail": idx.bm25_tail}, {"tail": idx.splade_tail}) \
        if sparse_mode == "q8c" else ({}, {})
    bm25_out = sparse(
        idx.bm25_packed, idx.bm25_offsets, idx.bm25_scales,
        bm25_terms, bm25_qw, idx.bm25_doc_packed, idx.bm25_doc_scale,
        **tails[0],
    )
    splade_out = sparse(
        idx.splade_packed, idx.splade_offsets, idx.splade_scales,
        splade_terms, splade_qw, idx.splade_doc_packed, idx.splade_doc_scale,
        **tails[1],
    )
    if sparse_mode == "q8c":
        bm25_s, bm25_i, bm25_cert, bm25_slack = bm25_out
        splade_s, splade_i, sp_cert, sp_slack = splade_out
        cert = bm25_cert & sp_cert
        slack = jnp.minimum(bm25_slack, sp_slack)
    else:
        bm25_s, bm25_i = bm25_out
        splade_s, splade_i = splade_out
    if dense_rescore_pool > 0:
        dense_s, dense_i = dense_view_rescored(
            q_emb, idx.corpus_int, idx.d_scale, idx.corpus_rows, k,
            dense_rescore_pool)
    else:
        dense_s, dense_i = dense_view_topk(
            q_emb, idx.corpus_int, idx.d_scale, k)
    qv = jnp.einsum("bd,vdw->vbw", q_emb.astype(jnp.float32), rerank_proj)
    rr_s, rr_i = rerank_candidates(qv, bm25_i, idx.corpus_rows, idx.d_scale)

    vals = jnp.stack([bm25_s, splade_s, dense_s, rr_s[0], rr_s[1]])  # [5, B, K]
    ids = jnp.stack([bm25_i, splade_i, dense_i, rr_i[0], rr_i[1]])
    qpp_raw = qpp_from_runs(vals, ids, text_feats, normalize=False)
    qpp = normalize_qpp_with(qpp_raw, qpp_norm_stats)
    fused_ids, fused_scores = fuse_tail(
        vals, ids, qpp, method, qpp_index, k_out, mlp_params)
    if sparse_mode == "q8c":
        # per-query proof that BOTH sparse views returned their true
        # top-k (the dense/rerank views' int8/bf16 precision is a
        # documented engine property, not part of this certificate)
        return fused_ids, fused_scores, qpp, cert, slack
    return fused_ids, fused_scores, qpp


def resolve_doc_imp_bits(idx_bits, kw_bits, default: int = 8) -> int:
    """Reconcile the imp_bits recorded on an index NamedTuple with an
    explicitly passed doc_imp_bits: inherit the recorded value when the
    caller didn't pass one, and refuse a conflict (a wrong imp_bits
    mis-splits pack_doc_vectors' term/impact bit fields and corrupts
    rescored scores with no error)."""
    if idx_bits is None:
        return default if kw_bits is None else kw_bits
    if kw_bits is not None and kw_bits != idx_bits:
        raise ValueError(
            f"doc_imp_bits={kw_bits} conflicts with the index's packed "
            f"doc vectors (built with imp_bits={idx_bits})")
    return idx_bits


def ensemble_retrieval_step(idx, *args, **kw):
    """Host-side front door for the jitted step: (a) with
    sparse_presorted=True, verify p_cap covers the dual layout's build
    cap BEFORE tracing (a smaller p_cap silently reads doc-id-prefix
    subsets — the same guard sharded_ensemble_step applies); the check
    is weakref-cached per offsets array, so steady-state serving pays
    nothing; (b) reconcile doc_imp_bits with the value recorded on the
    index (resolve_doc_imp_bits) and strip the metadata field before
    tracing. See _ensemble_retrieval_step for the full signature."""
    import inspect

    kw["doc_imp_bits"] = resolve_doc_imp_bits(
        idx.doc_imp_bits, kw.get("doc_imp_bits"))
    if idx.doc_imp_bits is not None:
        idx = idx._replace(doc_imp_bits=None)
    try:
        bound = inspect.signature(_ensemble_retrieval_step).bind(
            idx, *args, **kw)
        bound.apply_defaults()
        presorted = bound.arguments.get("sparse_presorted", False)
        p_cap = bound.arguments.get("p_cap")
    except TypeError:
        # let the jitted call raise the real signature error
        presorted, p_cap = kw.get("sparse_presorted", False), None
    if presorted and p_cap is not None:
        from qpp_fusion_rag_tpu.ops.sparse import validate_presorted_cap

        validate_presorted_cap(idx.bm25_offsets, p_cap)
        validate_presorted_cap(idx.splade_offsets, p_cap)
    return _ensemble_retrieval_step(idx, *args, **kw)
