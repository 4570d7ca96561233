"""Variant / co-relevance QPP: smooth predictors over KNN query neighbors.

Re-expresses the reference's variant QPP family (reference
qpp/VariantSpecificity.java:1-40 and qpp/CoRelSpecificity.java — a base
predictor evaluated on a query's KNN variants from a query index
(retrieval/KNNRelModel.java) and combined with the original with weight λ;
retrieval/Constants.java λ=0.9). The query index here is a dense matrix of
query embeddings searched with the shared dense top-k kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

LAMBDA = 0.9  # original-query weight (retrieval/Constants.java)


def query_knn(
    query_emb: np.ndarray,    # [Q, D] (L2-normalized for cosine)
    k: int = 5,
    exact: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """All-pairs query KNN (excluding self) -> (sims [Q, k], idx [Q, k])."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops.dense import dense_topk

    q = np.asarray(query_emb, np.float32)
    vals, ids = dense_topk(jnp.asarray(q), jnp.asarray(q), k=k + 1,
                           chunk=min(8192, len(q)), exact=exact)
    vals, ids = np.asarray(vals), np.asarray(ids)
    out_s = np.zeros((len(q), k), np.float32)
    out_i = np.full((len(q), k), -1, np.int64)   # -1 = missing neighbor
    for i in range(len(q)):
        row = [(s, j) for s, j in zip(vals[i], ids[i]) if j != i and j >= 0][:k]
        for c, (s, j) in enumerate(row):
            out_s[i, c] = s
            out_i[i, c] = j
    return out_s, out_i


def variant_qpp(
    base_qpp: np.ndarray,      # [Q] base predictor per query
    neighbor_idx: np.ndarray,  # [Q, k] KNN query indices
    neighbor_sim: Optional[np.ndarray] = None,   # [Q, k] similarity weights
    lam: float = LAMBDA,
) -> np.ndarray:
    """λ·base(q) + (1−λ)·sim-weighted mean of base over q's variants.

    Indices < 0 mark missing neighbors (query_knn padding) and get zero
    weight; a query with no valid neighbors keeps its base value."""
    base = np.asarray(base_qpp, np.float64)
    idx = np.asarray(neighbor_idx)
    valid = idx >= 0
    nb = base[np.maximum(idx, 0)]                 # [Q, k]
    if neighbor_sim is None:
        w = valid.astype(np.float64)
    else:
        w = np.maximum(np.asarray(neighbor_sim, np.float64), 0.0) * valid
    denom = w.sum(axis=1)
    smoothed = np.where(
        denom > 0, (w * nb).sum(axis=1) / np.maximum(denom, 1e-12), base
    )
    return (lam * base + (1 - lam) * smoothed).astype(np.float32)


def corel_qpp(
    base_qpp: np.ndarray,
    query_emb: np.ndarray,
    k: int = 5,
    lam: float = LAMBDA,
) -> np.ndarray:
    """One-call co-relevance QPP: KNN over query embeddings + smoothing
    (CoRelSpecificity shape)."""
    sims, idx = query_knn(query_emb, k=k)
    return variant_qpp(base_qpp, idx, sims, lam=lam)
