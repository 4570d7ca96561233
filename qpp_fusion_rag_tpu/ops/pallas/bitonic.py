"""Pallas row-wise bitonic sort for int32 keys.

`jax.lax.sort` on [1024, 32768] int32 measures 40.2 ms on v5e — it is
the dominant cost of the quantized-sort sparse scorer
(ops.sparse.sparse_score_topk_q8) after the DMA gather fix. A bitonic
network sorts each row entirely in VMEM with only static-shift
lane/sublane rotates:

- element index i = sublane*128 + lane; the stage-j partner is i XOR j,
  materialized as a select between roll(x, -j) and roll(x, +j) along
  the lane axis (j < 128) or the sublane axis (j >= 128) — every shift
  is a compile-time constant, the pattern Mosaic vectorizes best.
- compare-exchange keeps min where (bit_j(i) == bit_k(i)) in the
  standard bitonic direction scheme; the final k = M round has
  bit_k = 0 everywhere, yielding a fully ascending row.

M must be a power of two (callers pad with INT32_MAX, which sorts
last — the sparse scorers' sentinel). ~log2(M)*(log2(M)+1)/2 stages,
each ~6 vector ops/element, all VMEM-resident: the arithmetic bound at
M = 32768, B = 1024 is single-digit milliseconds vs 40 for the general
XLA sort.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROW_TILE = 8  # query rows sorted per grid step


def _bitonic_network(x, lane, subl, S, L, *, start_block=2,
                     stop_block=None):
    """The full compare-exchange network over [TB, S, L] int32 keys in
    flattened row order (shared by the plain-sort and the fused
    sort+segsum kernels — one copy, so a direction/roll/start_block fix
    can never apply to only one of them). See bitonic_sort_rows for the
    start_block skip-rounds contract.

    stop_block=K < M stops after outer stage K: every K-block is then
    sorted, ascending for even block index / descending for odd — the
    tournament top-P kernel's entry state."""
    TB = x.shape[0]
    M = S * L
    k = start_block
    while k <= (stop_block or M):
        j = k // 2
        while j >= 1:
            bit_j, px = _partner(x, lane, subl, S, L, j)
            if k < L:
                bit_k = (lane & k) != 0
            elif k < M:
                bit_k = (subl & (k // L)) != 0
            else:
                bit_k = jnp.zeros((TB, S, L), bool)
            take_min = bit_j == bit_k
            x = jnp.where(take_min, jnp.minimum(x, px), jnp.maximum(x, px))
            j //= 2
        k *= 2
    return x


def _partner(x, lane, subl, S, L, j):
    """Stage-j partner values x[i XOR j] in flattened row order, plus the
    bit_j mask — static-shift rotates only (the shared primitive of the
    sort, segsum, and tournament kernels)."""
    if j < L:
        bit_j = (lane & j) != 0
        plus = pltpu.roll(x, shift=L - j, axis=2)       # [l] = x[l + j]
        minus = pltpu.roll(x, shift=j, axis=2)          # [l] = x[l - j]
        return bit_j, jnp.where(bit_j, minus, plus)
    js = j // L
    bit_j = (subl & js) != 0
    plus = pltpu.roll(x, shift=S - js, axis=1)
    minus = pltpu.roll(x, shift=js, axis=1)
    return bit_j, jnp.where(bit_j, minus, plus)


def _bitonic_kernel(x_ref, o_ref, *, start_block=2):
    TB, S, L = x_ref.shape
    x = x_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, S, L), 2)
    subl = jax.lax.broadcasted_iota(jnp.int32, (TB, S, L), 1)
    o_ref[:] = _bitonic_network(x, lane, subl, S, L, start_block=start_block)


@partial(jax.jit, static_argnames=("start_block",))
def bitonic_sort_rows(x: jnp.ndarray, start_block: int = 2) -> jnp.ndarray:
    """Sort each row of [B, M] int32 ascending. M must be a power of two
    and a multiple of 1024; B a multiple of ROW_TILE.

    start_block > 2 skips the first log2(start_block) - 1 rounds: the
    input must then consist of aligned blocks of start_block/2 already
    sorted ALTERNATELY ascending (even block index) / descending (odd) —
    the state the full network would have produced at that round. Used
    by the presorted-postings sparse layout (ops.sparse
    pack_postings_presorted), cutting e.g. 120 -> 54 stages at M=32768
    with 2048-sorted windows."""
    B, M = x.shape
    if M & (M - 1) or M % (8 * LANES):
        raise ValueError(f"M={M} must be a power of two >= 1024")
    if B % ROW_TILE:
        raise ValueError(f"B={B} must be a multiple of {ROW_TILE}")
    if start_block & (start_block - 1) or not 2 <= start_block <= M:
        raise ValueError(f"start_block={start_block} must be a power of "
                         f"two in [2, {M}]")
    S = M // LANES
    x3 = x.reshape(B, S, LANES)
    out = pl.pallas_call(
        partial(_bitonic_kernel, start_block=start_block),
        out_shape=jax.ShapeDtypeStruct((B, S, LANES), x.dtype),
        grid=(B // ROW_TILE,),
        in_specs=[pl.BlockSpec((ROW_TILE, S, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROW_TILE, S, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x3)
    return out.reshape(B, M)


def _bitonic_topp_kernel(x_ref, o_ref, *, bs, start_block=2):
    """Tournament top-`bs` selection: sort bs-blocks (alternating
    asc/desc — the network's natural state after outer stage bs), then
    repeatedly (a) keep the elementwise max of adjacent block pairs
    (asc-vs-desc pairs: exactly the top-bs of their union, as a bitonic
    sequence) and (b) bitonic-merge the surviving blocks back to the
    alternating sorted state. Exact: any element of the row's true
    top-bs is within the top-bs of every pair it meets, so it survives
    every round. Work ~ M*(log2(bs)^2/2 + 2*log2(bs)) compare-exchanges
    vs the full sort's M*log2(M)^2/2 — 1.4x (M=16k) to 1.6x (M=32k)
    fewer at bs=1024. Output: the final bs-block sorted ASCENDING."""
    TB, S, L = x_ref.shape
    x = x_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, S, L), 2)
    subl = jax.lax.broadcasted_iota(jnp.int32, (TB, S, L), 1)
    x = _bitonic_network(x, lane, subl, S, L, start_block=start_block,
                         stop_block=bs)
    sblk = bs // L                       # sublanes per block
    while S > sblk:
        nb2 = S // (2 * sblk)
        xp = x.reshape(TB, nb2, 2, sblk, L)
        x = jnp.maximum(xp[:, :, 0], xp[:, :, 1]).reshape(TB, S // 2, L)
        S //= 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (TB, S, L), 2)
        subl = jax.lax.broadcasted_iota(jnp.int32, (TB, S, L), 1)
        # merge each bs-block; direction alternates by block parity
        # ((i & bs) != 0 — identical to the full network's bit_k at
        # k = bs), so the final round (one even block) sorts ascending
        bit_k = (subl & sblk) != 0
        j = bs // 2
        while j >= 1:
            bit_j, px = _partner(x, lane, subl, S, L, j)
            take_min = bit_j == bit_k
            x = jnp.where(take_min, jnp.minimum(x, px), jnp.maximum(x, px))
            j //= 2
    o_ref[:] = x


@partial(jax.jit, static_argnames=("bs", "start_block"))
def bitonic_topp_rows(x: jnp.ndarray, bs: int = 1024,
                      start_block: int = 2) -> jnp.ndarray:
    """EXACT top-`bs` values of each row of [B, M] int32, returned as a
    [B, bs] block sorted ascending (callers slice their pool from the
    tail; element [-pool-1] is the true (pool+1)-th value). M must be a
    power of two >= 2*bs; bs a power of two >= 1024 (the pairing
    compaction regroups whole 8-sublane tiles). start_block as in
    bitonic_sort_rows."""
    B, M = x.shape
    if M & (M - 1) or M % (8 * LANES):
        raise ValueError(f"M={M} must be a power of two >= 1024")
    if bs & (bs - 1) or bs < 8 * LANES or bs * 2 > M:
        raise ValueError(f"bs={bs} must be a power of two in "
                         f"[{8 * LANES}, {M // 2}]")
    if B % ROW_TILE:
        raise ValueError(f"B={B} must be a multiple of {ROW_TILE}")
    S = M // LANES
    out = pl.pallas_call(
        partial(_bitonic_topp_kernel, bs=bs, start_block=start_block),
        out_shape=jax.ShapeDtypeStruct((B, bs // LANES, LANES), x.dtype),
        grid=(B // ROW_TILE,),
        in_specs=[pl.BlockSpec((ROW_TILE, S, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROW_TILE, bs // LANES, LANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x.reshape(B, S, LANES))
    return out.reshape(B, bs)


def _shift_down_flat(x, d, lane, subl, S, L):
    """x[i - d] in flattened order (garbage where i < d; callers mask).
    d must be a power of two <= M/2."""
    if d < L:
        a = pltpu.roll(x, shift=d, axis=2)          # [l] = x[l - d]
        b = pltpu.roll(a, shift=1, axis=1)          # previous sublane's tail
        return jnp.where(lane >= d, a, b)
    ds = d // L
    return pltpu.roll(x, shift=ds, axis=1)          # [s] = x[s - ds]


def _shift_up1_flat(x, lane, subl, S, L):
    """x[i + 1] in flattened order (garbage at the final element)."""
    a = pltpu.roll(x, shift=L - 1, axis=2)          # [l] = x[l + 1]
    b = pltpu.roll(a, shift=S - 1, axis=1)          # next sublane's head
    return jnp.where(lane < L - 1, a, b)


def _bitonic_segsum_kernel(x_ref, sums_ref, sids_ref, *, start_block=2,
                           plus_one=False, max_run=None):
    """Sort + segmented run-sum fused: sort int32 keys (doc << 8 | q8),
    then an int32 segmented Hillis-Steele scan sums each doc run's low
    bytes entirely in VMEM. Outputs: sums (run total at each run's LAST
    position, -1 elsewhere) and the sorted doc ids. Integer sums are
    EXACT — no f32 cumsum-difference error (ops.segment precision note).

    plus_one=True sums (q8 + 1) per element, i.e. run total = q8sum +
    run length — the certified scorer's per-doc UPPER-BOUND sum: each
    contribution's combined quantization error (q8 requantization + the
    packed posting's uint8 rounding) is at most one wmax unit, so
    wmax * (q8sum + cnt) soundly upper-bounds the doc's true windowed
    score (ops.sparse.sparse_score_topk_q8_certified).

    start_block: see bitonic_sort_rows. NOTE keys may include the
    negative descending-window sentinel INT32_MIN; its doc id unpacks
    (logical shift) to 0x800000, outside the 23-bit real-id range —
    callers mask sids >= 0x7FFFFF.
    """
    TB, S, L = x_ref.shape
    M = S * L
    x = x_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, S, L), 2)
    subl = jax.lax.broadcasted_iota(jnp.int32, (TB, S, L), 1)
    x = _bitonic_network(x, lane, subl, S, L, start_block=start_block)

    flat = subl * L + lane
    sid = jax.lax.shift_right_logical(x, 8)
    v = x & jnp.int32(0xFF)
    if plus_one:
        v = v + jnp.int32(1)
    sid_prev = _shift_down_flat(sid, 1, lane, subl, S, L)
    # int32 0/1 flags throughout: Mosaic rejects shifted bool vectors
    # (vector<i8> -> i1 trunci) but is happy with int32 select/or chains
    start = jnp.where((sid != sid_prev) | (flat == 0),
                      jnp.int32(1), jnp.int32(0))
    sid_next = _shift_up1_flat(sid, lane, subl, S, L)
    last = (sid != sid_next) | (flat == M - 1)

    # segmented inclusive scan: v[i] = sum of its run through i. The
    # scan only needs to span the LONGEST run — sparse callers pass
    # max_run = Tq (a doc contributes at most one posting per query-term
    # window, so no run exceeds the query-term count), cutting log2(M)
    # ~ 14-15 doubling stages to ceil(log2(Tq)) ~ 3-4
    f = start
    d = 1
    while d < (max_run or M):
        vs = _shift_down_flat(v, d, lane, subl, S, L)
        fs = _shift_down_flat(f, d, lane, subl, S, L)
        valid = flat >= d
        v = jnp.where(valid & (f == 0), v + vs, v)
        f = jnp.where(valid, f | fs, f)
        d *= 2

    sums_ref[:] = jnp.where(last, v, jnp.int32(-1))
    sids_ref[:] = sid


@partial(jax.jit, static_argnames=("start_block", "plus_one", "max_run"))
def bitonic_segsum_rows(x: jnp.ndarray, start_block: int = 2,
                        plus_one: bool = False, max_run: int = None):
    """Sort rows of packed (doc << 8 | q8) int32 keys AND sum each doc's
    q8 run in one VMEM-resident kernel.
    -> (sums [B, M] int32: run total at run-last positions, -1 elsewhere;
        sids [B, M] int32: sorted doc ids — logical-shift unpacked, so
        the INT32_MIN sentinel appears as id 0x800000).
    plus_one=True accumulates (q8 + 1) per element (run total = q8sum +
    run length — the certified scorer's sound per-doc upper bound).
    start_block: see bitonic_sort_rows (presorted alternating blocks).
    max_run: an upper bound on any doc run's length (sparse callers:
    the query-term count) — the scan stops once its span covers it."""
    B, M = x.shape
    if M & (M - 1) or M % (8 * LANES):
        raise ValueError(f"M={M} must be a power of two >= 1024")
    if B % ROW_TILE:
        raise ValueError(f"B={B} must be a multiple of {ROW_TILE}")
    if start_block & (start_block - 1) or not 2 <= start_block <= M:
        raise ValueError(f"start_block={start_block} must be a power of "
                         f"two in [2, {M}]")
    S = M // LANES
    spec = pl.BlockSpec((ROW_TILE, S, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    sums, sids = pl.pallas_call(
        partial(_bitonic_segsum_kernel, start_block=start_block,
                plus_one=plus_one, max_run=max_run),
        out_shape=(jax.ShapeDtypeStruct((B, S, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((B, S, LANES), jnp.int32)),
        grid=(B // ROW_TILE,),
        in_specs=[spec],
        out_specs=(spec, spec),
        interpret=jax.default_backend() != "tpu",
    )(x.reshape(B, S, LANES))
    return sums.reshape(B, M), sids.reshape(B, M)
