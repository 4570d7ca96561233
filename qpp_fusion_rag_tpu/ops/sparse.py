"""Sparse (BM25 / learned-impact) scoring on device.

Replaces JVM postings traversal (Terrier BM25 via PyTerrier, reference
src/retrievers/bm25.py:29-52; Lucene impact search via Pyserini,
src/retrievers/splade.py:75-80) with a TPU formulation over the CSR
impact lists built by the native indexer (native/sparse_index.cpp):

  1. each query term gathers a fixed-size window of its impact-ordered
     postings (top-`p_cap` by impact — terms with df <= p_cap are exact;
     longer lists are impact-pruned, the standard quantized-impact
     approximation),
  2. candidate (doc, weight·query_weight) pairs flatten per query,
  3. duplicates (docs hit by several terms) reduce with a sort +
     prefix-scan segmented sum,
  4. `top_k` returns the fused candidate ranking.

Everything is static-shaped: queries pad to `max_terms` (-1), windows mask
beyond the true posting length.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from qpp_fusion_rag_tpu.ops.segment import SENTINEL, segmented_topk


@partial(jax.jit, static_argnames=("k", "p_cap", "exact_topk"))
def sparse_score_topk(
    flat_docs: jnp.ndarray,     # [P_total] int32 CSR doc ids (impact-ordered per term)
    flat_weights: jnp.ndarray,  # [P_total] f32 impacts, or uint8 quantized
    offsets: jnp.ndarray,       # [T+1] int32 CSR term offsets
    q_terms: jnp.ndarray,       # [B, Tq] int32 term ids (-1 pad)
    q_weights: jnp.ndarray,     # [B, Tq] f32 per-term query weights (qtf / impacts)
    k: int = 100,
    p_cap: int = 1024,
    term_scales: jnp.ndarray = None,  # [T] f32 dequant scales when weights are uint8
    exact_topk: bool = True,          # approx is opt-in: exact results by default
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (scores [B, k] f32 desc, doc ids [B, k] i32, -1 padded).

    With `term_scales`, impacts are stored uint8 (Anserini-style quantized
    impact lists: 4x less postings memory and gather traffic); the per-term
    scale folds into the query weight so dequantization costs nothing extra.
    """
    P_total = flat_docs.shape[0]
    tq_valid = q_terms >= 0
    terms = jnp.where(tq_valid, q_terms, 0)
    starts = offsets[terms]                          # [B, Tq]
    lens = offsets[terms + 1] - starts
    lens = jnp.where(tq_valid, lens, 0)

    if term_scales is not None:
        q_weights = q_weights * term_scales[terms]   # fold dequant scale in

    win = jnp.arange(p_cap, dtype=jnp.int32)
    gidx = jnp.clip(starts[..., None] + win, 0, max(P_total - 1, 0))  # [B, Tq, P]
    valid = win < lens[..., None]
    docs = jnp.where(valid, flat_docs[gidx], SENTINEL)
    w = flat_weights[gidx].astype(jnp.float32)
    vals = jnp.where(valid, w * q_weights[..., None], 0.0)

    B = q_terms.shape[0]
    docs = docs.reshape(B, -1)
    vals = vals.reshape(B, -1)

    def one(d, v):
        ids, scores, _ = segmented_topk(d, v, k, exact_topk=exact_topk)
        return scores, ids

    return jax.vmap(one)(docs, vals)
