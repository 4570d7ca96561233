"""Vectorized IR metric kernels (device-side).

Replaces the reference's ir_measures/pytrec_eval dependency
(reference src/evaluation/ir_evaluator.py:23-24) with pure JAX reductions over
aligned relevance tensors, so evaluation can run on-device for thousands of
queries at once (and inside jit, e.g. for oracle/target computation during
learned-fusion training).

Inputs are produced host-side by :func:`align_relevance`:

    gains   : float32 [Q, K]   relevance gain of the doc at each rank
                               (0 for non-relevant / padding)
    n_rel   : int32   [Q]      total number of relevant docs per query
    ideal   : float32 [Q, K]   per-query relevance gains sorted descending
                               (truncated/padded to K) for IDCG

Formulas match trec_eval / pytrec_eval semantics (linear gain,
log2(rank+1) discount), which is what ir_measures computes for the
reference's metric strings (nDCG@k, RR@k, R@k, P@k, AP).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# =============================================================================
# Host-side alignment
# =============================================================================

def align_relevance(
    doc_ids: np.ndarray,
    qid_list: Sequence[str],
    qrels: Dict[str, Dict[str, int]],
    vocab,
    ideal_k: int | None = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Align sparse qrels to a run tensor.

    Args:
        doc_ids: int32 [Q, K] retrieved doc ids (PAD=-1).
        qid_list: Q query ids (row order of doc_ids).
        qrels: {qid: {docno: rel}}.
        vocab: DocVocab mapping docno <-> id.
        ideal_k: length of the ideal-gain vector (defaults to K).

    Returns:
        (gains [Q, K] f32, n_rel [Q] i32, ideal [Q, ideal_k] f32)
    """
    Q, K = doc_ids.shape
    ideal_k = ideal_k or K
    gains = np.zeros((Q, K), dtype=np.float32)
    n_rel = np.zeros((Q,), dtype=np.int32)
    ideal = np.zeros((Q, ideal_k), dtype=np.float32)

    # one gain lookup table indexed by vocab id (numpy fancy-indexing)
    # instead of a Python dict probe per (query, rank): per_query_metric
    # calls this per retriever, so the inner loop was Q*K*R dict.get's
    rel_arr = np.zeros(len(vocab) + 1, dtype=np.float32)
    for qi, qid in enumerate(qid_list):
        rels = qrels.get(qid)
        if not rels:
            continue
        ids = np.asarray([vocab.id_of(d) for d in rels], dtype=np.int64)
        vals = np.asarray(list(rels.values()), dtype=np.float32)
        # n_rel counts ALL positively-judged docs (retrieved or not —
        # recall's denominator); the gain table only needs in-vocab ones
        n_rel[qi] = int(np.sum(vals > 0))
        known = ids >= 0
        ids, vals = ids[known], vals[known]
        rel_arr[ids] = np.maximum(vals, 0.0)
        row = doc_ids[qi]
        gains[qi] = rel_arr[np.clip(row, 0, len(vocab))] * (row >= 0)
        rel_arr[ids] = 0.0                      # reset for the next query
        pos = sorted((r for r in rels.values() if r > 0), reverse=True)[:ideal_k]
        ideal[qi, : len(pos)] = pos
    return gains, n_rel, ideal


# =============================================================================
# Device kernels — all [Q, K] -> [Q]
# =============================================================================

def _discounts(K: int) -> jnp.ndarray:
    ranks = jnp.arange(1, K + 1, dtype=jnp.float32)
    return 1.0 / jnp.log2(ranks + 1.0)


@partial(jax.jit, static_argnames=("k",))
def ndcg_at(gains: jnp.ndarray, ideal: jnp.ndarray, k: int) -> jnp.ndarray:
    """nDCG@k: DCG_k / IDCG_k, linear gain, log2(rank+1) discount.

    IDCG truncates at min(k, ideal width) INDEPENDENTLY of the run
    depth: for k > K (a truncated run evaluated at a deeper cutoff)
    trec_eval still sums min(k, n_rel) ideal gains — callers must size
    `ideal` to the deepest cutoff (align_relevance ideal_k), or nDCG
    overestimates on truncated runs."""
    K = gains.shape[-1]
    Ki = ideal.shape[-1]
    kk = min(k, K)
    ki = min(k, Ki)
    dcg = jnp.sum(gains[..., :kk] * _discounts(K)[:kk], axis=-1)
    idcg = jnp.sum(ideal[..., :ki] * _discounts(Ki)[:ki], axis=-1)
    return jnp.where(idcg > 0, dcg / jnp.maximum(idcg, 1e-30), 0.0)


@partial(jax.jit, static_argnames=("k",))
def rr_at(gains: jnp.ndarray, k: int) -> jnp.ndarray:
    """RR@k: reciprocal rank of the first relevant doc within top-k, else 0."""
    K = gains.shape[-1]
    kk = min(k, K)
    rel = gains[..., :kk] > 0
    first = jnp.argmax(rel, axis=-1)  # 0 if none — guarded below
    any_rel = jnp.any(rel, axis=-1)
    return jnp.where(any_rel, 1.0 / (first.astype(jnp.float32) + 1.0), 0.0)


@partial(jax.jit, static_argnames=("k",))
def recall_at(gains: jnp.ndarray, n_rel: jnp.ndarray, k: int) -> jnp.ndarray:
    """R@k: |relevant in top-k| / n_rel."""
    K = gains.shape[-1]
    kk = min(k, K)
    hits = jnp.sum(gains[..., :kk] > 0, axis=-1).astype(jnp.float32)
    n = n_rel.astype(jnp.float32)
    return jnp.where(n > 0, hits / jnp.maximum(n, 1.0), 0.0)


@partial(jax.jit, static_argnames=("k",))
def precision_at(gains: jnp.ndarray, k: int) -> jnp.ndarray:
    """P@k: |relevant in top-k| / k (fixed denominator, trec_eval semantics)."""
    K = gains.shape[-1]
    kk = min(k, K)
    hits = jnp.sum(gains[..., :kk] > 0, axis=-1).astype(jnp.float32)
    return hits / float(k)


@jax.jit
def average_precision(gains: jnp.ndarray, n_rel: jnp.ndarray) -> jnp.ndarray:
    """AP over the full run depth: mean of P@i at relevant ranks / n_rel."""
    rel = (gains > 0).astype(jnp.float32)
    cum_hits = jnp.cumsum(rel, axis=-1)
    ranks = jnp.arange(1, gains.shape[-1] + 1, dtype=jnp.float32)
    p_at_i = cum_hits / ranks
    ap_sum = jnp.sum(p_at_i * rel, axis=-1)
    n = n_rel.astype(jnp.float32)
    return jnp.where(n > 0, ap_sum / jnp.maximum(n, 1.0), 0.0)


# =============================================================================
# Metric-string dispatch ("nDCG@10", "RR@5", "AP", ...)
# =============================================================================

def parse_measure(name: str) -> Tuple[str, int | None]:
    if "@" in name:
        base, k = name.split("@", 1)
        return base, int(k)
    return name, None


def compute_measures(
    names: Sequence[str],
    gains: jnp.ndarray,
    n_rel: jnp.ndarray,
    ideal: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Compute named measures -> {name: per-query [Q] array}."""
    out: Dict[str, jnp.ndarray] = {}
    for name in names:
        base, k = parse_measure(name)
        b = base.lower()
        if b == "ndcg":
            out[name] = ndcg_at(gains, ideal, k or gains.shape[-1])
        elif b in ("rr", "mrr"):
            out[name] = rr_at(gains, k or gains.shape[-1])
        elif b in ("r", "recall"):
            if k is None:
                raise ValueError(f"{name}: recall needs a cutoff")
            out[name] = recall_at(gains, n_rel, k)
        elif b in ("p", "precision"):
            if k is None:
                raise ValueError(f"{name}: precision needs a cutoff")
            out[name] = precision_at(gains, k)
        elif b in ("ap", "map"):
            out[name] = average_precision(gains, n_rel)
        else:
            raise ValueError(f"Unknown measure {name!r}")
    return out


def aggregate_measures(per_query: Dict[str, jnp.ndarray], judged: np.ndarray) -> Dict[str, float]:
    """Mean over judged queries only (trec_eval averages over qrels queries)."""
    judged = np.asarray(judged, dtype=bool)
    denom = max(int(judged.sum()), 1)
    return {
        name: float(np.asarray(vals)[judged].sum() / denom)
        for name, vals in per_query.items()
    }


# Convenience list-based single-query nDCG (reference compute_ndcg,
# src/evaluation/ir_evaluator.py:199-221: ranked list + {docid: rel}).
def compute_ndcg(ranked_docs: List[str], qrels: Dict[str, int], k: int = 10) -> float:
    kk = min(k, len(ranked_docs)) if ranked_docs else 0
    gains = np.zeros((1, max(kk, 1)), dtype=np.float32)
    for i, d in enumerate(ranked_docs[:kk]):
        r = qrels.get(d, 0)
        if r > 0:
            gains[0, i] = r
    pos = sorted((r for r in qrels.values() if r > 0), reverse=True)[:k]
    ideal = np.zeros((1, max(len(pos), 1)), dtype=np.float32)
    ideal[0, : len(pos)] = pos
    d_run = 1.0 / np.log2(np.arange(1, gains.shape[1] + 1) + 1.0)
    d_ideal = 1.0 / np.log2(np.arange(1, ideal.shape[1] + 1) + 1.0)
    dcg = float((gains[0] * d_run).sum())
    idcg = float((ideal[0] * d_ideal).sum())
    return dcg / idcg if idcg > 0 else 0.0
