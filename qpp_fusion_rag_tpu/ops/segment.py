"""Shared segmented-aggregation primitive (scatter-free).

Sum contributions per unique id and take the top-k — the core reduction
behind both rank fusion (ops.fusion) and sparse scoring (ops.sparse).
See segmented_topk for the formulation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# plain Python int, NOT jnp.int32(...): a module-level jnp scalar
# initializes the XLA backend at import time, which breaks
# jax.distributed.initialize ordering on multi-host (multihost.py)
SENTINEL = 2**31 - 1


def segmented_topk(
    ids: jnp.ndarray,    # [M] int32 doc ids (SENTINEL = invalid)
    vals: jnp.ndarray,   # [M] f32 contributions (0 for invalid)
    k: int,
    count_bonus: bool = False,
    exact_topk: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sum contributions per unique id -> top-k (ids, sums, counts).

    The shared segmented-aggregation primitive behind both fusion
    (ops.fusion) and sparse scoring. Scatter-free formulation: sort by id
    (values as payload), then each run's total = cumsum difference between
    its last position and the previous run's last position — prefix ops
    only, no `segment_sum`/`.at[].set` scatters (XLA scatters are the
    dominant cost of the naive form on TPU). Run totals land AT the run's
    last position, so ids need no scatter either.

    Precision: run sums are differences of one full-array f32 cumsum, so
    absolute error grows with the total array magnitude — measured ~3e-4
    relative on the top scores at M=32k (BM25-scale values) and ~1e-6 at
    the fusion kernel's M<=512. Exact-parity scoring at M in the millions
    should chunk p_cap or use float64 on CPU.
    """
    sids, svals = jax.lax.sort((ids, vals), dimension=-1, num_keys=1)
    return segmented_topk_presorted(
        sids, svals, k, count_bonus=count_bonus, exact_topk=exact_topk)


def segmented_sums_presorted(
    sids: jnp.ndarray,   # [M] int32 ids, ASCENDING (SENTINEL = invalid)
    svals: jnp.ndarray,  # [M] f32 contributions, NON-NEGATIVE
) -> jnp.ndarray:
    """Per-run sums placed at each run's LAST position, -inf elsewhere.

    The scan half of segmented_topk_presorted without the top-k tail, for
    callers that need the full per-run score row (e.g. the certified
    sparse kernel's outside-pool maximum). Values must be >= 0 (no
    negativity shift); integer-valued f32 inputs stay exact as long as
    the row total < 2^24."""
    svalid = sids != SENTINEL
    last = jnp.concatenate([sids[1:] != sids[:-1], jnp.ones((1,), bool)])
    c = jnp.cumsum(jnp.where(svalid, svals, 0.0))
    marked = jnp.where(last, c, -jnp.inf)
    shifted = jnp.concatenate([jnp.full((1,), -jnp.inf, c.dtype), marked[:-1]])
    prev = jax.lax.cummax(shifted)
    sums = c - jnp.where(jnp.isneginf(prev), 0.0, prev)
    return jnp.where(last & svalid, sums, -jnp.inf)


def segmented_sums_presorted_i32(
    sids: jnp.ndarray,   # [M] int32 ids, ASCENDING (SENTINEL = invalid)
    ivals: jnp.ndarray,  # [M] int32 contributions, NON-NEGATIVE
) -> jnp.ndarray:
    """Integer-exact segmented_sums_presorted: per-run int32 sums at each
    run's LAST position, -1 elsewhere. No f32 cumsum-difference error at
    any magnitude — the q8 scorers' CPU/odd-shape fallback matches the
    Pallas kernel's exact integer semantics, and the certified scorer's
    bound sums stay sound without a row-mass cutoff. Row totals must
    stay < 2^31 (posting windows hit memory limits far earlier)."""
    svalid = sids != SENTINEL
    last = jnp.concatenate([sids[1:] != sids[:-1], jnp.ones((1,), bool)])
    c = jnp.cumsum(jnp.where(svalid, ivals, 0).astype(jnp.int32))
    marked = jnp.where(last, c, jnp.int32(-1))
    shifted = jnp.concatenate([jnp.full((1,), -1, jnp.int32), marked[:-1]])
    prev = jax.lax.cummax(shifted)   # values >= 0 monotone: max = last mark
    sums = c - jnp.maximum(prev, 0)
    return jnp.where(last & svalid, sums, jnp.int32(-1))


def segmented_topk_presorted(
    sids: jnp.ndarray,   # [M] int32 doc ids, ASCENDING (SENTINEL = invalid)
    svals: jnp.ndarray,  # [M] f32 contributions aligned with sids
    k: int,
    count_bonus: bool = False,
    exact_topk: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """segmented_topk for inputs already sorted by id — the scan + top-k
    tail without the pair sort. Lets callers sort a cheaper key (e.g. one
    packed int32, ops.sparse quantized-sort path) and reuse the reduce."""
    M = sids.shape[0]
    svalid = sids != SENTINEL
    last = jnp.concatenate([sids[1:] != sids[:-1], jnp.ones((1,), bool)])

    # shift values non-negative so the per-run cumsums are monotone and the
    # "previous run's last cumsum" reduces to a masked running maximum
    vmin = jnp.minimum(jnp.min(svals), 0.0)
    sv = jnp.where(svalid, svals - vmin, 0.0)
    c = jnp.cumsum(sv)
    cnt = jnp.cumsum(svalid.astype(jnp.float32))

    def prev_last(x):
        marked = jnp.where(last, x, -jnp.inf)
        shifted = jnp.concatenate([jnp.full((1,), -jnp.inf, x.dtype), marked[:-1]])
        run = jax.lax.cummax(shifted)
        return jnp.where(jnp.isneginf(run), 0.0, run)

    counts = cnt - prev_last(cnt)
    sums = (c - prev_last(c)) + vmin * counts   # undo the non-negativity shift

    scores = sums * counts if count_bonus else sums
    scores = jnp.where(last & svalid, scores, -jnp.inf)
    k = min(k, M)
    if exact_topk or M <= max(4 * k, 256):
        top_vals, top_idx = jax.lax.top_k(scores, k)
    else:
        # approx final selection (exact lax.top_k costs tens of ms on wide
        # rows); -inf non-last positions never win over real candidates
        top_vals, top_idx = jax.lax.approx_max_k(scores, k, recall_target=0.95)
    top_ids = sids[top_idx]
    ok = jnp.isfinite(top_vals)
    return (
        jnp.where(ok, top_ids, -1),
        jnp.where(ok, top_vals, -jnp.inf),
        jnp.where(ok, counts[top_idx], 0.0),  # pad slots: count 0, like ids/vals
    )
