"""Device-side rank fusion as one segmented-aggregation kernel.

The reference fuses run lists with per-query Python dict accumulation plus the
numba-backed ranx library (reference src/fusion.py:170-380). Here every fusion
family — CombSUM / CombMNZ / RRF and their QPP-weighted / learned-weight
variants — is a single jitted tensor program over padded run tensors:

    ids     : int32   [R, Q, K]  doc ids (PAD = -1), rank-ordered
    scores  : float32 [R, Q, K]  scores (-inf padding)
    weights : float32 [R, Q]     per-(retriever, query) weight
                                 (ones for unweighted methods)

Per query (vmapped over Q):
  1. transform each retriever row into contributions
       sum/mnz : w * s        (optionally per-row min-max normalized — the
                               ranx fuse() default norm="min-max")
       rrf     : w / (k0 + rank)
  2. flatten to [R*K], sort by doc id, reduce duplicate docs with a
     prefix-scan segmented sum (+ count for MNZ),
  3. lax.top_k over the reduced table -> fused (ids, scores) [K_out].

No data-dependent shapes: padding flows through as +sentinel ids / -inf
scores and is masked at every step.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qpp_fusion_rag_tpu.ops.segment import SENTINEL, segmented_topk

# method codes (static)
COMBSUM, COMBMNZ, RRF = 0, 1, 2


def _row_minmax(scores: jnp.ndarray, valid: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Per-row min-max over valid entries; equal-score rows map to 0.
    Invalid entries become `fill` (0 for fusion contributions, -inf for the
    .norm.res score contract used by the pipeline engine)."""
    s = jnp.where(valid, scores, jnp.inf)
    mn = jnp.min(s, axis=-1, keepdims=True)
    s2 = jnp.where(valid, scores, -jnp.inf)
    mx = jnp.max(s2, axis=-1, keepdims=True)
    rng = jnp.where(mx > mn, mx - mn, 1.0)
    out = (scores - jnp.where(jnp.isfinite(mn), mn, 0.0)) / rng
    return jnp.where(valid, out, fill)


def _fuse_one_query(
    ids: jnp.ndarray,      # [R, K] int32
    scores: jnp.ndarray,   # [R, K] f32
    weights: jnp.ndarray,  # [R] f32
    method: int,
    rrf_k: float,
    minmax_norm: bool,
    k_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    R, K = ids.shape
    M = R * K
    valid = ids >= 0

    if method == RRF:
        ranks = jnp.arange(1, K + 1, dtype=jnp.float32)[None, :]
        contrib = weights[:, None] / (rrf_k + ranks)
    else:
        s = _row_minmax(scores, valid) if minmax_norm else jnp.where(valid, scores, 0.0)
        contrib = weights[:, None] * s
    contrib = jnp.where(valid, contrib, 0.0)

    flat_ids = jnp.where(valid, ids, SENTINEL).reshape(M)
    flat_vals = contrib.reshape(M)
    top_ids, top_vals, _counts = segmented_topk(
        flat_ids, flat_vals, min(k_out, M),
        count_bonus=(method == COMBMNZ), exact_topk=True,
    )
    return top_ids, top_vals


@partial(jax.jit, static_argnames=("method", "minmax_norm", "k_out"))
def fuse_kernel(
    ids: jnp.ndarray,       # [R, Q, K]
    scores: jnp.ndarray,    # [R, Q, K]
    weights: jnp.ndarray,   # [R, Q]
    method: int = COMBSUM,
    rrf_k: float = 60.0,
    minmax_norm: bool = True,
    k_out: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse R run tensors -> (fused_ids [Q, k_out], fused_scores [Q, k_out])."""
    fn = lambda i, s, w: _fuse_one_query(i, s, w, method, rrf_k, minmax_norm, k_out)
    # vmap over the query axis (axis 1 of ids/scores, axis 1 of weights)
    return jax.vmap(fn, in_axes=(1, 1, 1), out_axes=0)(ids, scores, weights)


def fuse(
    ids,
    scores,
    weights=None,
    method: str = "combsum",
    rrf_k: float = 60.0,
    minmax_norm: Optional[bool] = None,
    k_out: int = 100,
):
    """String-dispatch wrapper. `weights=None` -> uniform 1.0 (unweighted).

    minmax_norm defaults to True for sum/mnz (ranx fuse() default) and is
    ignored for rrf. Weighted variants (weights given) skip re-normalization,
    matching reference weighted_* semantics (src/fusion.py:237-380) which
    consume `.norm.res` scores directly.
    """
    method = method.lower()
    code = {"combsum": COMBSUM, "sum": COMBSUM, "combmnz": COMBMNZ, "mnz": COMBMNZ, "rrf": RRF}[method]
    if weights is None:
        weights = jnp.ones(ids.shape[:2], dtype=jnp.float32)
        if minmax_norm is None:
            minmax_norm = True
    else:
        weights = jnp.asarray(weights, dtype=jnp.float32)
        if minmax_norm is None:
            minmax_norm = False
    return fuse_kernel(
        jnp.asarray(ids), jnp.asarray(scores), weights,
        method=code, rrf_k=float(rrf_k), minmax_norm=bool(minmax_norm), k_out=int(k_out),
    )
