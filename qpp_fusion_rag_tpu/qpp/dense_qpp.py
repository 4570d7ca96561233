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

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def dense_qpp(
    query_emb: jnp.ndarray,   # [B, D]
    doc_embs: jnp.ndarray,    # [B, K, D] embeddings of each query's top docs
    k: int = 10,
) -> jnp.ndarray:
    """-> [B] specificity = 1 / (1 + mean pairwise distance of
    {query} ∪ top-k docs) (DenseVecSpecificity's diameter formulation)."""
    pts = jnp.concatenate([query_emb[:, None, :], doc_embs[:, :k, :]], axis=1)
    # mean pairwise L2 over the (k+1) points, computed via the Gram trick
    sq = jnp.sum(pts * pts, axis=-1)                                  # [B, P]
    gram = jnp.einsum("bpd,bqd->bpq", pts, pts,
                      preferred_element_type=jnp.float32)
    d2 = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2 * gram, 0.0)
    P = pts.shape[1]
    off_diag = P * (P - 1)
    diameter = jnp.sum(jnp.sqrt(d2), axis=(1, 2)) / jnp.maximum(off_diag, 1)
    return 1.0 / (1.0 + diameter)


@partial(jax.jit, static_argnames=("k", "n_levels"))
def dense_qpp_matryoshka(
    query_emb: jnp.ndarray,   # [B, D]
    doc_embs: jnp.ndarray,    # [B, K, D]
    k: int = 10,
    n_levels: int = 4,
) -> jnp.ndarray:
    """-> [B] log-weighted mean of dense_qpp over nested dimension prefixes
    D, D/2, D/4, ... (DenseVecMatryoskaSpecificity's shape: coarse prefixes
    carry the dominant semantic directions; weight halves per level)."""
    D = query_emb.shape[-1]
    total, weight_sum = 0.0, 0.0
    dim = D
    for level in range(n_levels):
        w = 1.0 / (level + 1.0)
        total = total + w * dense_qpp(query_emb[:, :dim], doc_embs[:, :, :dim], k=k)
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
    (pad rows replicate the query itself — distance 0 contribution) and
    compute both predictors."""
    import numpy as np

    q = jnp.asarray(np.asarray(query_emb, dtype=np.float32))
    ids = jnp.asarray(np.asarray(doc_ids[:, :k], dtype=np.int64))
    emb = jnp.asarray(np.asarray(index_embeddings, dtype=np.float32))
    safe = jnp.maximum(ids, 0)
    docs = emb[safe]                                           # [B, k, D]
    docs = jnp.where((ids >= 0)[..., None], docs, q[:, None, :])
    fn = dense_qpp_matryoshka if matryoshka else dense_qpp
    return fn(q, docs, k=k)
