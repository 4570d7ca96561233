"""Embedding-based dense QPP (the real DenseVec predictors).

The JSON bridge the reference invokes substitutes a score-spread proxy for
dense QPP (QPPBridge.java:444-453); the research codebase's real versions
measure geometry in embedding space (reference qpp/DenseVecSpecificity.java
— diameter of the query + top-k doc vectors; DenseVecMatryoskaSpecificity
— log-weighted variant over nested dimension prefixes). Both are natural
on TPU where the retrieval embeddings are already device-resident.

Intuition: an easy query's top documents cluster tightly around it
(small diameter → high specificity); the predictor is 1/(1+diameter).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def dense_qpp(
    query_emb: jnp.ndarray,   # [B, D]
    doc_embs: jnp.ndarray,    # [B, K, D] embeddings of each query's top docs
    k: int = 10,
    valid: jnp.ndarray = None,  # [B, K] bool — False = pad slot (excluded)
) -> jnp.ndarray:
    """-> [B] specificity = 1 / (1 + mean pairwise distance of
    {query} ∪ top-k docs) (DenseVecSpecificity's diameter formulation).

    Pad slots (valid=False) are excluded from the pairwise mean, so a query
    with a short result list is scored on its real docs only — padding must
    not shrink the apparent diameter."""
    pts = jnp.concatenate([query_emb[:, None, :], doc_embs[:, :k, :]], axis=1)
    if valid is None:
        pt_valid = jnp.ones(pts.shape[:2], bool)
    else:
        pt_valid = jnp.concatenate(
            [jnp.ones((pts.shape[0], 1), bool), valid[:, :k].astype(bool)], axis=1
        )
    # mean pairwise L2 over the valid points, computed via the Gram trick
    sq = jnp.sum(pts * pts, axis=-1)                                  # [B, P]
    gram = jnp.einsum("bpd,bqd->bpq", pts, pts,
                      preferred_element_type=jnp.float32)
    d2 = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2 * gram, 0.0)
    pair = (pt_valid[:, :, None] & pt_valid[:, None, :]).astype(d2.dtype)
    n = jnp.sum(pt_valid, axis=1).astype(d2.dtype)                    # [B]
    off_diag = jnp.maximum(n * (n - 1), 1.0)
    diameter = jnp.sum(jnp.sqrt(d2) * pair, axis=(1, 2)) / off_diag
    return 1.0 / (1.0 + diameter)


@partial(jax.jit, static_argnames=("k", "n_levels"))
def dense_qpp_matryoshka(
    query_emb: jnp.ndarray,   # [B, D]
    doc_embs: jnp.ndarray,    # [B, K, D]
    k: int = 10,
    n_levels: int = 4,
    valid: jnp.ndarray = None,  # [B, K] bool — False = pad slot
) -> jnp.ndarray:
    """-> [B] log-weighted mean of dense_qpp over nested dimension prefixes
    D, D/2, D/4, ... (DenseVecMatryoskaSpecificity's shape: coarse
    prefixes carry the dominant semantic directions). Level weights
    follow the reference's 1/log(1+i) decay
    (DenseVecMatryoskaSpecificity.java:17-20): w_level = 1/log(2+level),
    so the full-dimension level dominates and finer prefixes taper
    logarithmically."""
    D = query_emb.shape[-1]
    total, weight_sum = 0.0, 0.0
    dim = D
    for level in range(n_levels):
        w = 1.0 / math.log(2.0 + level)
        total = total + w * dense_qpp(query_emb[:, :dim], doc_embs[:, :, :dim],
                                      k=k, valid=valid)
        weight_sum += w
        dim = max(dim // 2, 1)
    return total / weight_sum


def dense_qpp_from_index(
    query_emb,               # [B, D] numpy/jax
    doc_ids,                 # [B, K] row ids into the dense index (-1 pad)
    index_embeddings,        # [N, D] the dense index matrix
    k: int = 10,
    matryoshka: bool = False,
) -> Tuple:
    """Convenience wrapper: gather top-doc embeddings from a dense index
    and compute both predictors. Pad rows (-1 ids) are masked out of the
    pairwise mean entirely — short result lists are scored on their real
    docs only."""
    import numpy as np

    q = jnp.asarray(np.asarray(query_emb, dtype=np.float32))
    ids = jnp.asarray(np.asarray(doc_ids[:, :k], dtype=np.int64))
    emb = jnp.asarray(np.asarray(index_embeddings, dtype=np.float32))
    safe = jnp.maximum(ids, 0)
    docs = emb[safe]                                           # [B, k, D]
    fn = dense_qpp_matryoshka if matryoshka else dense_qpp
    return fn(q, docs, k=k, valid=ids >= 0)
