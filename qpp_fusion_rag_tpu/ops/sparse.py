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
import numpy as np

from qpp_fusion_rag_tpu.ops.pallas.bitonic import ROW_TILE as BITONIC_ROW_TILE
from qpp_fusion_rag_tpu.ops.segment import SENTINEL, segmented_topk


def _gather_windows(flat_docs, flat_weights, starts, lens, cap):
    """Contiguous posting windows via vmapped dynamic_slice.

    An element gather `flat[starts[..., None] + arange(cap)]` lowers to a
    general XLA gather — measured 116 ms for [256, 16, 1024] windows from a
    100M-posting array on v5e, vs 10.5 ms for per-window dynamic slices.
    Window starts clamp at the array end; wanted positions are re-derived
    from absolute indices (candidates are order-free downstream, so the
    clamped window needs masking, not realignment).

    -> (docs [B, Tq, cap] with SENTINEL fill, weights f32, wanted mask)
    """
    P_total = flat_docs.shape[0]
    cap = min(cap, P_total)
    s_clamped = jnp.minimum(starts, max(P_total - cap, 0)).astype(jnp.int32)

    def one(s):
        return (
            jax.lax.dynamic_slice(flat_docs, (s,), (cap,)),
            jax.lax.dynamic_slice(flat_weights, (s,), (cap,)),
        )

    d_win, w_win = jax.vmap(jax.vmap(one))(s_clamped)
    pos = s_clamped[..., None] + jnp.arange(cap, dtype=jnp.int32)
    eff_len = jnp.minimum(lens, cap)
    wanted = (pos >= starts[..., None]) & (pos < (starts + eff_len)[..., None])
    docs = jnp.where(wanted, d_win, SENTINEL)
    weights = jnp.where(wanted, w_win.astype(jnp.float32), 0.0)
    return docs, weights, wanted


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

    docs, w, _wanted = _gather_windows(flat_docs, flat_weights, starts, lens, p_cap)
    vals = w * q_weights[..., None]

    B = q_terms.shape[0]
    docs = docs.reshape(B, -1)
    vals = vals.reshape(B, -1)

    def one(d, v):
        ids, scores, _ = segmented_topk(d, v, k, exact_topk=exact_topk)
        return scores, ids

    return jax.vmap(one)(docs, vals)


def pack_postings(
    flat_docs: np.ndarray,     # [P] doc ids (< 2^23)
    flat_weights: np.ndarray,  # [P] f32 impacts (impact-ordered per term)
    offsets: np.ndarray,       # [T+1]
    scales: np.ndarray = None,  # [T] f32: quantize against these instead
):
    """Pack each posting into ONE int32: (doc_id << 8) | uint8 impact.

    The posting-window gather is HBM-bandwidth-bound (the dominant sparse
    cost at p_cap >= 2048); packing halves the gathered bytes vs separate
    int32 ids + f32 weights. Impacts quantize per-term to 8 bits against
    the term's max impact (first posting — lists are impact-ordered), the
    Anserini quantized-impact scheme; the scale folds into the query
    weight at score time.

    -> (packed int32 [P], term_scales f32 [T]). Doc ids must fit 23 bits
    (8.4M docs) so the packed value stays positive in int32. The packed
    array is tail-padded (zeros = doc 0, impact 0 — masked at score
    time) so the Pallas DMA gather's 1024-aligned fetches stay in
    bounds (ops.pallas.window_gather.pad_for_gather).
    """
    flat_docs, flat_weights, offsets, scales = _pack_inputs(
        flat_docs, flat_weights, offsets, scales)
    counts = np.diff(offsets)
    per_post = np.repeat(scales, counts)
    q = np.clip(np.round(flat_weights / np.maximum(per_post, 1e-12)), 0, 255)
    packed = (flat_docs.astype(np.int64) << 8) | q.astype(np.int64)
    from qpp_fusion_rag_tpu.ops.pallas.window_gather import pad_for_gather

    return pad_for_gather(packed.astype(np.int32), _MAX_DMA_CAP), scales


_MAX_DMA_CAP = 4096  # largest p_cap the DMA gather pads for


def term_scales_from_csr(flat_weights: np.ndarray,
                         offsets: np.ndarray) -> np.ndarray:
    """Anserini-style per-term 8-bit quantization grid: scale = max
    impact / 255, with 1.0 for empty lists. The max is computed over the
    WHOLE run, not assumed to be the first posting: an index imported in
    doc-id order (e.g. a decoded Terrier inverted file) would otherwise
    get an underestimated scale and CLAMP its strongest impacts at 255 —
    measured as a 30% top-1 score loss on the real SciFact index before
    this was order-proofed. For impact-ordered lists the grid is
    unchanged. The ONE derivation — the sharded packer reuses it so
    shard grids match the single-chip grid bit-for-bit."""
    offsets = np.asarray(offsets, dtype=np.int64)
    flat_weights = np.asarray(flat_weights, dtype=np.float32)
    T = len(offsets) - 1
    counts = np.diff(offsets)
    maxima = np.zeros(T, dtype=np.float32)
    nonempty = counts > 0
    if nonempty.any():
        run_max = np.maximum.reduceat(flat_weights,
                                      offsets[:-1][nonempty])
        maxima[nonempty] = run_max
    return np.where(maxima > 0, maxima / 255.0, 1.0).astype(np.float32)


def _pack_inputs(flat_docs, flat_weights, offsets, scales):
    """Shared packer front end: dtype coercion, the strict 2^23 - 1
    doc-id bound (0x7FFFFF is the quantized-sort sentinel), and the
    per-term 8-bit quantization grid — derived from each list's first
    (max, impact-ordered) posting, or taken verbatim when supplied (the
    doc-range-sharded packer passes the GLOBAL scales so every shard
    quantizes identically to the single-chip index)."""
    flat_docs = np.asarray(flat_docs)
    flat_weights = np.asarray(flat_weights, dtype=np.float32)
    offsets = np.asarray(offsets, dtype=np.int64)
    if len(flat_docs) and int(flat_docs.max()) >= (1 << 23) - 1:
        raise ValueError("packed postings need doc ids < 2^23 - 1; shard the corpus")
    if scales is None:
        scales = term_scales_from_csr(flat_weights, offsets)
    else:
        scales = np.asarray(scales, dtype=np.float32)
    return flat_docs, flat_weights, offsets, scales


def validate_presorted_cap(offsets, p_cap: int) -> None:
    """Host-side guard for the dual doc-ordered layout: every dual window
    is 2·min(df, build_cap) long, so a window longer than 2·p_cap proves
    p_cap < build_cap — the case where even/odd slots would silently read
    doc-id-prefix subsets instead of the impact top (p_cap > build_cap is
    merely slower: the skip disables and masks stay correct).

    Validation is cached on the LIVE array object (weakref-checked
    identity, not a buffer pointer — device allocators reuse addresses)
    so repeated serving steps don't re-transfer the offsets."""
    import weakref

    ident = id(offsets)
    hit = _PRESORTED_OK.get(ident)
    if hit is not None and hit[0]() is offsets and int(p_cap) in hit[1]:
        return
    off = np.asarray(offsets)
    max_len = int(np.diff(off.reshape(-1, off.shape[-1])).max()) if off.size > 1 else 0
    if max_len > 2 * p_cap:
        raise ValueError(
            f"presorted layout has a dual window of {max_len} entries, but "
            f"p_cap={p_cap} only covers 2*{p_cap}: the layout was built at "
            f"cap={max_len // 2} — search with p_cap == build cap")
    if hit is not None and hit[0]() is offsets:
        hit[1].add(int(p_cap))
    else:
        try:
            ref = weakref.ref(offsets)
        except TypeError:
            return                       # unweakrefable: just revalidate
        if len(_PRESORTED_OK) > 256:
            dead = [k for k, v in _PRESORTED_OK.items() if v[0]() is None]
            for k in dead:
                del _PRESORTED_OK[k]
        _PRESORTED_OK[ident] = (ref, {int(p_cap)})


_PRESORTED_OK: dict = {}


def pack_postings_presorted(
    flat_docs: np.ndarray,     # [P] doc ids (impact-ordered per term)
    flat_weights: np.ndarray,  # [P] f32 impacts
    offsets: np.ndarray,       # [T+1]
    cap: int,                  # the p_cap this layout is built for
    scales: np.ndarray = None,
):
    """DUAL DOC-ORDERED window layout: per term, the top-min(df, cap)
    postings BY IMPACT (the impact-ordered list's prefix) re-sorted by
    doc id and stored twice — ascending, then the same entries reversed.

    Why: the q8 scorers' row sort is the dominant sparse cost. If every
    gathered window arrives as a doc-sorted run (even query-term slots
    read the ascending copy, odd slots the descending one), the bitonic
    network can skip its first log2(cap) rounds — the state a full sort
    would have reached — cutting 120 -> 54 stages at Tq=16, cap=2048
    (ops.pallas.bitonic start_block). The candidate SET and all scores
    are identical to pack_postings at p_cap == cap; this is purely a
    storage-order change, at 2x window-region HBM (tail postings beyond
    `cap` are dropped — this layout is a candidate generator; pair it
    with pack_doc_vectors for rank-safe rescoring).

    Searches MUST use p_cap == cap (a smaller p_cap would read a
    doc-id-prefix subset, not the impact top — sparse_score_topk_q8
    with presorted=True asserts nothing at trace time; keep the caps
    aligned in config). Quantization matches pack_postings (8-bit vs
    the term's max impact), so term_scales are interchangeable.

    -> (packed int32 [2·Σ min(df, cap)] tail-padded, offsets2 [T+1]
        int64 dual-block starts, term_scales f32 [T])."""
    flat_docs, flat_weights, offsets, scales = _pack_inputs(
        flat_docs, flat_weights, offsets, scales)
    T = len(offsets) - 1
    counts = np.diff(offsets)
    eff = np.minimum(counts, cap)
    total = int(eff.sum())
    cum = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(eff, out=cum[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], eff)
    src = np.repeat(offsets[:-1], eff) + within
    sel_docs = flat_docs[src].astype(np.int64)
    q = np.clip(np.round(flat_weights[src] /
                         np.maximum(np.repeat(scales, eff), 1e-12)),
                0, 255).astype(np.int64)
    vals = (sel_docs << 8) | q
    term_of = np.repeat(np.arange(T, dtype=np.int64), eff)
    order = np.lexsort((vals, term_of))      # per-term doc-ascending
    vals_sorted = vals[order]

    offsets2 = 2 * cum
    out = np.zeros(2 * total, dtype=np.int64)
    dst_asc = np.repeat(offsets2[:-1], eff) + within
    out[dst_asc] = vals_sorted
    eff_rep = np.repeat(eff, eff)
    dst_desc = np.repeat(offsets2[:-1] + eff, eff) + (eff_rep - 1 - within)
    out[dst_desc] = vals_sorted
    from qpp_fusion_rag_tpu.ops.pallas.window_gather import pad_for_gather

    # pad for the LAYOUT's cap, not just the DMA ceiling: if the tail
    # slack were shorter than cap, window clamping near the array end
    # would put pad keys BEFORE a sorted run, breaking the skip-rounds
    # entry condition (aligned monotone blocks)
    return (pad_for_gather(out.astype(np.int32), max(cap, _MAX_DMA_CAP)),
            offsets2, scales)


def _packed_windows(packed, s_clamped, cap, dma_gather):
    """[B, Tq] window starts -> ([B, Tq, cap] packed windows, starts used).

    dma_gather None = auto: the Pallas DMA kernel on TPU when shapes
    allow (ops.pallas.window_gather — 8.7 vs 38.6 ms for 16384x2048
    windows on v5e), else the vmapped dynamic_slice fallback.

    LAYOUT CONTRACT: the DMA path clamps window starts one extra ALIGN
    block earlier than the fallback (the aligned fetch needs cap+ALIGN
    slack), so `packed` MUST carry pad_for_gather's tail slack — always
    true for pack_postings/pack_postings_presorted output. A hand-built
    array that merely happens to be 1024-aligned passes the auto checks
    but would silently lose up to cap+ALIGN tail postings on terms whose
    windows end near the array tail; build through the packers."""
    from qpp_fusion_rag_tpu.ops.pallas import window_gather as WG

    B, Tq = s_clamped.shape
    P = packed.shape[0]
    if dma_gather is None:
        dma_gather = (
            jax.default_backend() == "tpu"
            and (B * Tq) % WG.ROWS == 0
            and cap % WG.ALIGN == 0      # sublane-aligned VMEM realign
            and cap <= _MAX_DMA_CAP
            and P % WG.ALIGN == 0
            and P >= cap + 2 * WG.ALIGN
        )
        if (not dma_gather and jax.default_backend() == "tpu"
                and P % WG.ALIGN != 0 and P >= cap + 2 * WG.ALIGN):
            # the ~4x perf trap that bit round 3: postings not run through
            # pack_postings/pad_for_gather silently fall back to the slow
            # dynamic_slice gather (docs/KERNEL_NOTES.md). Trace-time only.
            import warnings

            warnings.warn(
                f"sparse posting array length {P} is not {WG.ALIGN}-aligned;"
                " the Pallas DMA window gather is DISABLED (~4x slower"
                " dynamic_slice fallback). Build postings with"
                " pack_postings (which tail-pads) or pad_for_gather.",
                stacklevel=3)
    if dma_gather:
        s2 = jnp.minimum(s_clamped, P - cap - WG.ALIGN).astype(jnp.int32)
        win = WG.gather_windows_pallas(packed, s2.reshape(-1), cap)
        return win.reshape(B, Tq, cap), s2
    def one(s):
        return jax.lax.dynamic_slice(packed, (s,), (cap,))
    return jax.vmap(jax.vmap(one))(s_clamped), s_clamped


@partial(jax.jit, static_argnames=("k", "p_cap", "exact_topk", "dma_gather"))
def sparse_score_topk_packed(
    packed: jnp.ndarray,        # [P] int32 (doc << 8 | uint8 impact)
    offsets: jnp.ndarray,       # [T+1] int32
    term_scales: jnp.ndarray,   # [T] f32 per-term dequant scales
    q_terms: jnp.ndarray,       # [B, Tq] int32 (-1 pad)
    q_weights: jnp.ndarray,     # [B, Tq] f32
    k: int = 100,
    p_cap: int = 1024,
    exact_topk: bool = True,
    dma_gather: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed-posting variant of sparse_score_topk: one int32 gather
    instead of int32+f32 (see pack_postings). Same output contract."""
    tq_valid = q_terms >= 0
    terms = jnp.where(tq_valid, q_terms, 0)
    starts = offsets[terms]
    lens = offsets[terms + 1] - starts
    lens = jnp.where(tq_valid, lens, 0)
    qw = q_weights * term_scales[terms]              # fold dequant scale

    P_total = packed.shape[0]
    cap = min(p_cap, P_total)
    s_clamped = jnp.minimum(starts, max(P_total - cap, 0)).astype(jnp.int32)
    win, s_clamped = _packed_windows(packed, s_clamped, cap, dma_gather)
    pos = s_clamped[..., None] + jnp.arange(cap, dtype=jnp.int32)
    eff = jnp.minimum(lens, cap)
    wanted = (pos >= starts[..., None]) & (pos < (starts + eff)[..., None])
    # packed values are positive (< 2^31), so arithmetic >> == logical >>
    docs = jnp.where(wanted, jnp.right_shift(win, 8), SENTINEL)
    imp = (win & jnp.int32(0xFF)).astype(jnp.float32)
    vals = jnp.where(wanted, imp * qw[..., None], 0.0)

    B = q_terms.shape[0]
    docs = docs.reshape(B, -1)
    vals = vals.reshape(B, -1)

    def score(d, v):
        ids, scores, _ = segmented_topk(d, v, k, exact_topk=exact_topk)
        return scores, ids

    return jax.vmap(score)(docs, vals)


@partial(jax.jit, static_argnames=("k", "p_cap", "candidates"))
def sparse_rescore_topk(
    flat_docs: jnp.ndarray,
    flat_weights: jnp.ndarray,
    offsets: jnp.ndarray,
    q_terms: jnp.ndarray,
    q_weights: jnp.ndarray,
    k: int = 100,
    p_cap: int = 1024,
    candidates: int = 4,     # candidate pool = candidates * k
    term_scales: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort-free sparse scoring: select a candidate pool by RAW contribution
    (approx_max_k), then rescore the pool exactly against all contributions.

    Rationale: the per-query id sort dominates sparse_score_topk. With few
    query terms, almost every candidate doc appears in at most a handful of
    postings lists, so the doc with the j-th best fused SUM almost always
    has one contribution inside the top candidates*k raw contributions; the
    rescore step then computes its exact sum. Near-exact in the BM25/SPLADE
    regime (a fused-top doc whose every contribution falls outside the pool
    is the only miss case); ~3-5x faster than the sort path at p_cap=1024.
    """
    P_total = flat_docs.shape[0]
    tq_valid = q_terms >= 0
    terms = jnp.where(tq_valid, q_terms, 0)
    starts = offsets[terms]
    lens = offsets[terms + 1] - starts
    lens = jnp.where(tq_valid, lens, 0)
    if term_scales is not None:
        q_weights = q_weights * term_scales[terms]

    docs, w, _wanted = _gather_windows(flat_docs, flat_weights, starts, lens, p_cap)
    vals = w * q_weights[..., None]

    B = q_terms.shape[0]
    M = docs.shape[1] * docs.shape[2]
    return _rescore_pool(docs.reshape(B, M), vals.reshape(B, M), k, candidates)


def _rescore_pool(
    docs: jnp.ndarray,   # [B, M] int32 (SENTINEL invalid)
    vals: jnp.ndarray,   # [B, M] f32 contributions (any value at invalid)
    k: int,
    candidates: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared pool-select + exact-rescore tail of the sort-free scorers."""
    B, M = docs.shape
    vals = jnp.where(docs == SENTINEL, -jnp.inf, vals)

    pool = min(candidates * k, M)
    if M <= max(4 * pool, 256):
        cv, cidx = jax.lax.top_k(vals, pool)
    else:
        cv, cidx = jax.lax.approx_max_k(vals, pool, recall_target=0.95)
    cand_ids = jnp.take_along_axis(docs, cidx, axis=-1)        # [B, pool]

    # exact rescore: sum every contribution of each pooled doc id
    vals0 = jnp.where(jnp.isfinite(vals), vals, 0.0)
    match = cand_ids[:, :, None] == docs[:, None, :]           # [B, pool, M]
    sums = jnp.einsum("bpm,bm->bp", match.astype(jnp.float32), vals0)
    # dedupe pool entries pointing at the same doc: keep first occurrence
    dup = (cand_ids[:, :, None] == cand_ids[:, None, :]) & (
        jnp.arange(sums.shape[1])[None, :, None] > jnp.arange(sums.shape[1])[None, None, :]
    )
    is_dup = jnp.any(dup, axis=-1)
    sums = jnp.where(is_dup | (cand_ids == SENTINEL), -jnp.inf, sums)

    kk = min(k, sums.shape[-1])
    top_vals, top_idx = jax.lax.top_k(sums, kk)
    top_ids = jnp.take_along_axis(cand_ids, top_idx, axis=-1)
    ok = jnp.isfinite(top_vals)
    return (
        jnp.where(ok, top_vals, -jnp.inf),
        jnp.where(ok, top_ids, -1),
    )

@partial(jax.jit, static_argnames=("k", "p_cap", "candidates", "dma_gather"))
def sparse_rescore_topk_packed(
    packed: jnp.ndarray,        # [P] int32 (doc << 8 | uint8 impact)
    offsets: jnp.ndarray,       # [T+1] int32
    term_scales: jnp.ndarray,   # [T] f32 per-term dequant scales
    q_terms: jnp.ndarray,       # [B, Tq] int32 (-1 pad)
    q_weights: jnp.ndarray,     # [B, Tq] f32
    k: int = 100,
    p_cap: int = 1024,
    candidates: int = 4,
    dma_gather: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed-posting variant of sparse_rescore_topk: the sort-free
    pool-select + exact-rescore formulation over (doc << 8 | impact)
    int32 postings. Combines both measured wins — packed gathers halve
    HBM window traffic, and dropping the per-query id sort removes the
    dominant compute cost of sparse_score_topk_packed. Same output
    contract: (scores [B, k] desc, ids [B, k], -1 padded)."""
    tq_valid = q_terms >= 0
    terms = jnp.where(tq_valid, q_terms, 0)
    starts = offsets[terms]
    lens = offsets[terms + 1] - starts
    lens = jnp.where(tq_valid, lens, 0)
    qw = q_weights * term_scales[terms]

    P_total = packed.shape[0]
    cap = min(p_cap, P_total)
    s_clamped = jnp.minimum(starts, max(P_total - cap, 0)).astype(jnp.int32)
    win, s_clamped = _packed_windows(packed, s_clamped, cap, dma_gather)
    pos = s_clamped[..., None] + jnp.arange(cap, dtype=jnp.int32)
    eff = jnp.minimum(lens, cap)
    wanted = (pos >= starts[..., None]) & (pos < (starts + eff)[..., None])
    docs = jnp.where(wanted, jnp.right_shift(win, 8), SENTINEL)
    imp = (win & jnp.int32(0xFF)).astype(jnp.float32)
    vals = jnp.where(wanted, imp * qw[..., None], 0.0)

    B = q_terms.shape[0]
    return _rescore_pool(docs.reshape(B, -1), vals.reshape(B, -1), k, candidates)

def doc_vector_imp_bits(n_terms: int, max_bits: int = 14) -> int:
    """Widest impact field that still fits (term_id | sentinel) in int31:
    term ids (incl. the all-ones sentinel) take ceil(log2(T+1)) bits, the
    rest go to impact precision. 100k vocab -> 14 bits (quantization step
    max_w/16383 — rank flips measured nil at 12 already; the extra 2 bits
    quarter the certified mode's rescore slack eps_r, its binding term,
    at zero HBM cost); >= 8 always fits for vocabs below 2^23 - 1."""
    need = max(int(np.ceil(np.log2(max(n_terms + 1, 2)))), 1)
    return max(8, min(max_bits, 31 - need))


def pack_doc_vectors(
    offsets: np.ndarray,       # [T+1] CSR term offsets
    flat_docs: np.ndarray,     # [P] doc ids
    flat_weights: np.ndarray,  # [P] f32 impacts
    n_docs: int,
    doc_cap: int = 0,          # 0 = fit the longest doc (exact)
    imp_bits: int = 8,         # impact precision (doc_vector_imp_bits)
    return_tail: bool = False,
):
    """Invert term-major CSR postings to PACKED doc-major vectors for the
    exact-rescore kernel: row d holds doc d's (term << imp_bits | q-impact)
    entries, padded with the all-ones term sentinel (matches no query).

    Impacts quantize per-DOC against the doc's max weight (scale =
    max_w/(2^imp_bits - 1)); a rescored sum's error is bounded by
    ~n_matched/2 quantization steps. At the default 8 bits that error
    flips ~0.8% of top-10 ranks on tight BM25 score gaps
    (docs/quality_rescore.json); pass doc_vector_imp_bits(T) (12 for a
    100k vocab) to make it negligible at zero extra HBM traffic.

    doc_cap > 0 truncates docs to their `doc_cap` HIGHEST-weight terms
    (rescoring then lower-bounds the true score); 0 sizes rows to the
    longest doc — exact, the default. doc_cap=128 makes every row
    exactly one (8, 128) int32 tile, which roughly halves XLA's
    row-gather cost at serving shapes vs the ragged Td (measured 17->8
    ms per view at B=1024, C=256 on v5e). Returns
    (doc_packed int32 [N, Td], doc_scale f32 [N], Td).

    return_tail=True appends tail_max f32 [N]: each doc's largest
    DROPPED raw weight (0.0 where nothing was dropped). The certified
    scorer turns this into a sound per-candidate upper-bound correction
    (a dropped term can contribute at most qw_t * tail_max[d]), so
    doc_cap keeps the rank-exactness certificate valid — docs longer
    than the cap simply become harder to certify instead of silently
    mis-scored.

    Reference behavior this supports: exhaustive Lucene/Terrier scoring is
    rank-exact by construction (reference src/retrievers/splade.py:75-80,
    src/retrievers/bm25.py:43-52); window-capped candidate generation +
    this full-contribution rescore restores rank safety at TPU speed.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    flat_docs = np.asarray(flat_docs)
    flat_weights = np.asarray(flat_weights, dtype=np.float32)
    T = len(offsets) - 1
    sentinel_term = (1 << (31 - imp_bits)) - 1
    # term ids are 0..T-1, so the sentinel collides only when T - 1
    # reaches it (T == sentinel is fine: max real id is sentinel - 1)
    if T > sentinel_term:
        raise ValueError(
            f"doc-vector packing with imp_bits={imp_bits} needs term ids "
            f"< 2^{31 - imp_bits} - 1; lower imp_bits (doc_vector_imp_bits)")
    qmax = (1 << imp_bits) - 1
    term_of = np.repeat(np.arange(T, dtype=np.int64), np.diff(offsets))
    # group postings by doc; stable keeps per-term impact order (unused)
    order = np.argsort(flat_docs, kind="stable")
    d_sorted = flat_docs[order]
    t_sorted = term_of[order]
    w_sorted = flat_weights[order]
    bounds = np.searchsorted(d_sorted, np.arange(n_docs + 1))
    counts = np.diff(bounds)
    td_full = int(counts.max()) if n_docs else 1
    td = td_full if doc_cap <= 0 else min(doc_cap, td_full)
    td = max(td, 1)

    # per-doc max weight -> uint8 quantization scale (reduceat over the
    # doc-sorted order: ufunc.at is ~50x slower at 10^8 postings)
    doc_scale = np.ones(n_docs, dtype=np.float32)
    nz = counts > 0
    if nz.any():
        maxw = np.maximum.reduceat(w_sorted, bounds[:-1][nz])
        doc_scale[nz] = np.where(maxw > 0, maxw / qmax, 1.0)

    tail_max = np.zeros(n_docs, dtype=np.float32)
    if td < td_full:
        # keep each doc's heaviest `td` terms: rank entries per doc by -w
        rank = np.zeros(len(d_sorted), dtype=np.int64)
        sub = np.lexsort((-w_sorted, d_sorted))
        pos_in_doc = np.arange(len(d_sorted)) - np.repeat(bounds[:-1], counts)
        rank[sub] = pos_in_doc
        # the largest dropped weight is exactly the rank-td entry
        edge = rank == td
        tail_max[d_sorted[edge]] = w_sorted[edge]
        keep = rank < td
        d_sorted, t_sorted, w_sorted = (
            d_sorted[keep], t_sorted[keep], w_sorted[keep])
        bounds = np.searchsorted(d_sorted, np.arange(n_docs + 1))
        counts = np.diff(bounds)

    q = np.clip(np.round(w_sorted / np.maximum(
        np.repeat(doc_scale, counts), 1e-12)), 0, qmax).astype(np.int64)
    packed_flat = (t_sorted << imp_bits) | q
    doc_packed = np.full((n_docs, td), np.int64(sentinel_term) << imp_bits,
                         dtype=np.int64)
    col = np.arange(len(d_sorted)) - np.repeat(bounds[:-1], counts)
    doc_packed[d_sorted, col] = packed_flat
    if return_tail:
        return doc_packed.astype(np.int32), doc_scale, td, tail_max
    return doc_packed.astype(np.int32), doc_scale, td


def pack_doc_vectors_exact(
    offsets: np.ndarray,       # [T+1] CSR term offsets
    flat_docs: np.ndarray,     # [P] doc ids
    flat_weights: np.ndarray,  # [P] f32 impacts
    n_docs: int,
):
    """Invert term-major CSR postings to UNQUANTIZED doc-major vectors:
    (doc_terms int32 [N, Td] with -1 pad — matches no query term —
    doc_w f32 [N, Td], Td). The certified scorer's f32 rescore path:
    per-candidate scores carry only f32 rounding, so the certificate's
    boundary check resolves k/k+1 gaps down to the tie-tolerance band
    instead of the imp_bits quantization epsilon (measured on real
    SciFact: 81/298 queries sit below the imp14 epsilon but only 7 are
    exact ties — scripts_dev/diag_ties_real.py). Costs 2x the packed
    layout's HBM and gather traffic; certified serving only."""
    offsets = np.asarray(offsets, dtype=np.int64)
    flat_docs = np.asarray(flat_docs)
    flat_weights = np.asarray(flat_weights, dtype=np.float32)
    T = len(offsets) - 1
    term_of = np.repeat(np.arange(T, dtype=np.int64), np.diff(offsets))
    order = np.argsort(flat_docs, kind="stable")
    d_sorted = flat_docs[order]
    t_sorted = term_of[order]
    w_sorted = flat_weights[order]
    bounds = np.searchsorted(d_sorted, np.arange(n_docs + 1))
    counts = np.diff(bounds)
    td = max(int(counts.max()) if n_docs else 1, 1)
    doc_terms = np.full((n_docs, td), -1, dtype=np.int32)
    doc_w = np.zeros((n_docs, td), dtype=np.float32)
    col = np.arange(len(d_sorted)) - np.repeat(bounds[:-1], counts)
    doc_terms[d_sorted, col] = t_sorted.astype(np.int32)
    doc_w[d_sorted, col] = w_sorted
    return doc_terms, doc_w, td


def _exact_rescore_scores_f32(
    cand_ids: jnp.ndarray,     # [B, C] int32 (-1 pad)
    doc_terms: jnp.ndarray,    # [N, Td] int32 (-1 pad)
    doc_w: jnp.ndarray,        # [N, Td] f32
    q_terms: jnp.ndarray,      # [B, Tq] int32 (-1 pad)
    q_weights: jnp.ndarray,    # [B, Tq] f32
) -> jnp.ndarray:
    """f32-exact sibling of _exact_rescore_scores: gather the candidate
    rows' term ids AND raw f32 weights, match-accumulate. -> scores
    [B, C] (-inf at invalid). Query/doc pads are -1/-1 but padded query
    weights are zeroed, so pad-pad matches contribute nothing."""
    B, C = cand_ids.shape
    qw = jnp.where(q_terms >= 0, q_weights, 0.0)
    safe = jnp.maximum(cand_ids, 0)
    t = jnp.take(doc_terms, safe.reshape(-1), axis=0).reshape(B, C, -1)
    w = jnp.take(doc_w, safe.reshape(-1), axis=0).reshape(B, C, -1)
    matched = jnp.zeros_like(w)
    Tq = q_terms.shape[1]
    for j in range(Tq):                                  # unrolled: Tq <= 16
        matched = matched + jnp.where(
            t == q_terms[:, j, None, None], qw[:, j, None, None], 0.0)
    scores = jnp.sum(matched * w, axis=-1)
    return jnp.where(cand_ids >= 0, scores, -jnp.inf)


def _exact_rescore_scores(
    cand_ids: jnp.ndarray,     # [B, C] int32 candidate doc ids (-1 pad)
    doc_packed: jnp.ndarray,   # [N, Td] int32 (term << imp_bits | q-impact)
    doc_scale: jnp.ndarray,    # [N] f32
    q_terms: jnp.ndarray,      # [B, Tq] int32 (-1 pad)
    q_weights: jnp.ndarray,    # [B, Tq] f32
    term_scales: jnp.ndarray = None,
    imp_bits: int = 8,
    sort_ids: bool = False,
    return_unmatched: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared rescoring core: every candidate scored against its FULL
    doc-major term vector. -> (cand_ids [B, C] (re-sorted when sort_ids),
    scores [B, C] f32, -inf at invalid). The certified scorer consumes
    the full per-candidate row (per-doc quantization bounds need every
    pooled doc, not just the top-k); sparse_exact_rescore adds the top-k
    tail for the serving path.

    return_unmatched=True appends unmatched_qw [B, C] f32: for each
    candidate, the sum of query weights whose term found NO entry in the
    stored row — the multiplier for pack_doc_vectors' tail_max upper
    bound under doc_cap truncation (a missing term either isn't in the
    doc or was dropped with weight <= tail_max). Costs one extra [B, C]
    reduction, not a per-term pass: doc rows hold each term at most
    once, so sum_p matched_p == sum_j qw_j * hit_j and the unmatched
    mass is just sum(qw) - that."""
    B, C = cand_ids.shape
    if sort_ids:
        cand_ids = jax.lax.sort(cand_ids, dimension=-1)
    qw = jnp.where(q_terms >= 0, q_weights, 0.0)
    if term_scales is not None:
        qw = qw * term_scales[jnp.maximum(q_terms, 0)]
    safe = jnp.maximum(cand_ids, 0)
    rows = jnp.take(doc_packed, safe.reshape(-1), axis=0).reshape(B, C, -1)
    t = jax.lax.shift_right_logical(rows, imp_bits)     # [B, C, Td]
    imp = (rows & jnp.int32((1 << imp_bits) - 1)).astype(jnp.float32)
    # single fused pass over [B, C, Td]: accumulate the matched query
    # weight per element (an elementwise where-chain XLA fuses into one
    # HBM sweep), then ONE reduction — ~3x faster than per-term reduces
    matched = jnp.zeros_like(imp)
    Tq = q_terms.shape[1]
    for j in range(Tq):                                  # unrolled: Tq <= 16
        matched = matched + jnp.where(
            t == q_terms[:, j, None, None], qw[:, j, None, None], 0.0)
    scores = jnp.sum(matched * imp, axis=-1) * doc_scale[safe]
    scores = jnp.where(cand_ids >= 0, scores, -jnp.inf)
    if return_unmatched:
        unmatched = jnp.maximum(
            jnp.sum(qw, axis=1)[:, None] - jnp.sum(matched, axis=-1), 0.0)
        return cand_ids, scores, unmatched
    return cand_ids, scores


@partial(jax.jit, static_argnames=("k", "imp_bits", "sort_ids"))
def sparse_exact_rescore(
    cand_scores: jnp.ndarray,  # [B, C] f32 candidate-gen scores (unused order)
    cand_ids: jnp.ndarray,     # [B, C] int32 candidate doc ids (-1 pad)
    doc_packed: jnp.ndarray,   # [N, Td] int32 (term << imp_bits | q-impact)
    doc_scale: jnp.ndarray,    # [N] f32
    q_terms: jnp.ndarray,      # [B, Tq] int32 (-1 pad)
    q_weights: jnp.ndarray,    # [B, Tq] f32
    term_scales: jnp.ndarray = None,  # [T] f32 (query-side dequant fold-in)
    k: int = 100,
    imp_bits: int = 8,         # must match pack_doc_vectors
    sort_ids: bool = False,    # ascending-address gather (HBM locality)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-rescore candidates against their FULL term contributions.
    -> (scores [B, k] desc, ids [B, k], -1 pad).

    score(d) = doc_scale[d] · Σ_j imp8[d, j] · qw[term[d, j]] — every term
    of the doc participates, so window/p_cap truncation error vanishes for
    any doc that reaches the candidate pool. The [B, C, Td] gather is the
    HBM cost; the Tq-way term match is an unrolled VPU compare-accumulate
    (Tq ≤ 16 after encode_queries' power-of-two trim).

    sort_ids=True pre-sorts candidates by doc id so the row gather walks
    HBM in ascending address order (candidate order is irrelevant — the
    final top_k re-ranks; -1 pads sort first and stay masked).

    PRECONDITION: cand_ids contains each doc at most once per row (the
    q8/q8r pools guarantee this — one run-last per doc). Duplicates are
    rescored identically and would occupy multiple top-k slots; callers
    merging pools from several generators must dedupe first (as
    _rescore_pool does)."""
    B, C = cand_ids.shape
    cand_ids, scores = _exact_rescore_scores(
        cand_ids, doc_packed, doc_scale, q_terms, q_weights,
        term_scales=term_scales, imp_bits=imp_bits, sort_ids=sort_ids)
    kk = min(k, C)
    top_vals, top_idx = jax.lax.top_k(scores, kk)
    top_ids = jnp.take_along_axis(cand_ids, top_idx, axis=-1)
    ok = jnp.isfinite(top_vals)
    top_vals = jnp.where(ok, top_vals, -jnp.inf)
    top_ids = jnp.where(ok, top_ids, -1)
    if kk < k:
        # honor the [B, k] contract when the pool is smaller than k
        top_vals = jnp.pad(top_vals, ((0, 0), (0, k - kk)),
                           constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, k - kk)),
                          constant_values=-1)
    return top_vals, top_ids


def _presorted_geometry(offsets, terms, tq_valid, q_terms):
    """Window starts/lens for the DUAL doc-ordered layout
    (pack_postings_presorted): each term's region is [asc copy | desc
    copy], each of length eff = (offsets[t+1] - offsets[t]) / 2. Even
    query-term slots read the ascending copy, odd slots the descending
    one, so the flattened row arrives as alternating-direction sorted
    blocks — the bitonic network's state after its first log2(cap)
    rounds. -> (starts, lens, parity [1, Tq] int32)."""
    base = offsets[terms]
    eff_st = jax.lax.shift_right_logical(offsets[terms + 1] - base, 1)
    parity = (jnp.arange(q_terms.shape[1], dtype=jnp.int32) & 1)[None, :]
    starts = base + parity.astype(base.dtype) * eff_st
    lens = jnp.where(tq_valid, eff_st, 0)
    return starts, lens, parity


def _q8_row_sums(packed, offsets, term_scales, q_terms, q_weights,
                 p_cap, dma_gather, bitonic, presorted=False,
                 plus_one=False, return_win_min=False):
    """Shared windowed-q8 core: gather posting windows, requantize
    contributions to 8 bits, sort by packed (doc<<8|q8) key, segment-sum
    per doc. -> (sums_i32 [B, M] per-run totals at run-LAST positions
    (-1 elsewhere/invalid), sids [B, M] doc ids (>= 0x7FFFFF sentinel),
    wmax_col [B, 1] f32 dequant scale, bitonic_used).

    plus_one=True accumulates (q8 + 1) per contribution, so each run
    total is q8sum + run length: a SOUND per-doc upper-bound sum for the
    certified scorer — every contribution's combined quantization error
    (q8 requantization <= 0.5 + packed uint8 rounding <= 0.5 * qw/wmax)
    is under one wmax unit, so wmax * (q8sum + cnt) >= the doc's true
    windowed score against the stored f32 weights.

    presorted=True reads the dual doc-ordered layout
    (pack_postings_presorted; p_cap MUST equal the layout's build cap)
    and, on the Pallas path, skips the bitonic network's first
    log2(p_cap) rounds — tail pads become INT32_MIN on descending
    (odd-slot) windows so every block stays monotone. Requantizing the
    low byte preserves block order: round(imp * ratio) is non-decreasing
    in imp and doc bits dominate the key.

    return_win_min=True appends win_min [B, Tq] int32 — the MINIMUM
    stored uint8 impact over each window's valid positions (255 for
    empty windows). For an impact-ordered layout this is the window-edge
    impact; for the presorted dual layout it is the cap-th-largest
    impact of the term — in both cases the exact supremum of any
    truncated-tail posting's impact, which the certified scorer's
    hidden-mass bound needs (the presorted window is doc-ordered, so
    reading the LAST position would not bound the tail).

    Integer-exact in both branches (Pallas in-kernel int32 scan, or
    segmented_sums_presorted_i32 — exact at any row mass)."""
    from qpp_fusion_rag_tpu.ops.segment import segmented_sums_presorted_i32

    tq_valid = q_terms >= 0
    terms = jnp.where(tq_valid, q_terms, 0)
    if presorted:
        starts, lens, parity = _presorted_geometry(
            offsets, terms, tq_valid, q_terms)
    else:
        starts = offsets[terms]
        lens = jnp.where(tq_valid, offsets[terms + 1] - starts, 0)
    qw = q_weights * term_scales[terms]
    qw = jnp.where(tq_valid, jnp.maximum(qw, 0.0), 0.0)
    wmax_col = jnp.maximum(jnp.max(qw, axis=1, keepdims=True), 1e-30)
    ratio = qw / wmax_col

    P_total = packed.shape[0]
    cap = min(p_cap, P_total)
    s_clamped = jnp.minimum(starts, max(P_total - cap, 0)).astype(jnp.int32)
    win, s_clamped = _packed_windows(packed, s_clamped, cap, dma_gather)
    pos = s_clamped[..., None] + jnp.arange(cap, dtype=jnp.int32)
    eff = jnp.minimum(lens, cap)
    wanted = (pos >= starts[..., None]) & (pos < (starts + eff)[..., None])
    imp = (win & jnp.int32(0xFF)).astype(jnp.float32)
    win_min = None
    if return_win_min:
        win_min = jnp.min(jnp.where(wanted, win & jnp.int32(0xFF),
                                    jnp.int32(255)), axis=-1)
    q8 = jnp.round(imp * ratio[..., None]).astype(jnp.int32)
    if presorted:
        # descending (odd-slot) windows pad with INT32_MIN so the block
        # stays monotone for the skip-rounds entry condition; pads unpack
        # (logical shift) to doc id 0x800000, masked below
        padkey = jnp.where(parity[..., None] == 1,
                           jnp.int32(-(2**31)), jnp.int32(2**31 - 1))
    else:
        padkey = jnp.int32(2**31 - 1)
    keys = jnp.where(wanted, (win & jnp.int32(~0xFF)) | q8, padkey)

    B = q_terms.shape[0]
    keys = keys.reshape(B, -1)
    M = keys.shape[1]
    if bitonic is None:
        bitonic = (jax.default_backend() == "tpu"
                   and M & (M - 1) == 0 and M % 1024 == 0
                   and M <= 65536
                   and B % BITONIC_ROW_TILE == 0)
    if bitonic:
        from qpp_fusion_rag_tpu.ops.pallas.bitonic import bitonic_segsum_rows

        start_block = 2
        if (presorted and cap == p_cap and cap & (cap - 1) == 0
                and 2 * cap <= M):
            start_block = 2 * cap
        sums, sids = bitonic_segsum_rows(keys, start_block=start_block,
                                         plus_one=plus_one,
                                         max_run=q_terms.shape[1])
        sums = jnp.where(sids >= jnp.int32(0x7FFFFF), -1, sums)
    else:
        if presorted:
            # no skip benefit for lax.sort: fold the descending-window
            # sentinel back into the sorts-last invalid key
            keys = jnp.where(keys == jnp.int32(-(2**31)),
                             jnp.int32(2**31 - 1), keys)
        skeys = jax.lax.sort(keys, dimension=-1)
        sids = jnp.right_shift(skeys, 8)
        q8v = skeys & jnp.int32(0xFF)
        if plus_one:
            q8v = q8v + jnp.int32(1)
        q8v = jnp.where(sids == jnp.int32(0x7FFFFF), 0, q8v)
        sid_m = jnp.where(sids == jnp.int32(0x7FFFFF), SENTINEL, sids)
        sums = jax.vmap(segmented_sums_presorted_i32)(sid_m, q8v)
    if return_win_min:
        return sums, sids, wmax_col, bitonic, win_min
    return sums, sids, wmax_col, bitonic


def _can_bitonic_pool(bit_used, M, tq):
    """All of _bitonic_pool's requirements (its docstring): keys pack as
    (sum << 16 | position), so positions need M <= 2^16 and row sums
    < 2^15 (tq terms x 256 per contribution — 256 covers the certified
    scorer's plus_one bound sums, 255 the plain q8 path). bit_used only
    implies the M bound on the AUTO bitonic path — an explicit
    bitonic=True accepts any power-of-two M, so the M check must be
    repeated here."""
    return bool(bit_used) and M <= (1 << 16) and tq * 256 < (1 << 15)


def _bitonic_pool(sums, sids, pool, wmax_col):
    """EXACT top-`pool` selection from per-run q8 sums via a second
    Pallas bitonic pass over (sum << 16 | position) keys — replaces
    `approx_max_k`, whose recall>=0.97 regime falls off a perf cliff on
    TPU (docs/KERNEL_NOTES.md). Requires M <= 65536 (16-bit positions)
    and row sums < 2^15 (Tq <= 128 at 8-bit contributions) — both hold
    for every production shape.
    -> (cand_scores [B, pool] f32 desc, cand_ids [B, pool] (-1 pad),
        outside_max [B] f32: the true (pool+1)-th value, -inf if none)."""
    from qpp_fusion_rag_tpu.ops.pallas.bitonic import (
        bitonic_sort_rows,
        bitonic_topp_rows,
    )

    B, M = sums.shape
    posi = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    key = jnp.where(sums >= 0, jnp.left_shift(sums, 16) | posi, -1)
    # tournament top-block selection when the pool is a small fraction
    # of the row: exact top-bs (so the (pool+1)-th value stays the true
    # outside maximum) at ~1.4-1.6x fewer compare-exchanges than the
    # full sort (bitonic_topp_rows)
    bs = 1024
    while bs <= pool:
        bs *= 2
    if 2 * bs <= M:
        blk = bitonic_topp_rows(key, bs=bs)             # [B, bs] ascending
        top = blk[:, bs - pool:][:, ::-1]               # descending pool
        nxt = blk[:, bs - pool - 1]
    else:
        skey = bitonic_sort_rows(key)                   # ascending
        top = skey[:, M - pool:][:, ::-1]
        nxt = (skey[:, M - pool - 1] if M > pool
               else jnp.full((B,), -1, jnp.int32))
    cidx = jnp.where(top >= 0, top & jnp.int32(0xFFFF), 0)
    cv = jnp.where(top >= 0,
                   jnp.right_shift(top, 16).astype(jnp.float32) * wmax_col,
                   -jnp.inf)
    ci = jnp.where(top >= 0,
                   jnp.take_along_axis(sids, cidx, axis=-1), -1)
    outside_max = jnp.where(
        nxt >= 0, jnp.right_shift(nxt, 16).astype(jnp.float32) * wmax_col[:, 0],
        -jnp.inf)
    return cv, ci, outside_max


@partial(jax.jit, static_argnames=("k", "p_cap", "candidates", "dma_gather",
                                   "bitonic", "imp_bits", "pool_recall",
                                   "presorted", "sort_ids"))
def sparse_score_topk_q8_rescored(
    packed: jnp.ndarray,        # [P] int32 (doc << 8 | uint8 impact)
    offsets: jnp.ndarray,       # [T+1] int32
    term_scales: jnp.ndarray,   # [T] f32
    doc_packed: jnp.ndarray,    # [N, Td] int32 doc-major (pack_doc_vectors)
    doc_scale: jnp.ndarray,     # [N] f32
    q_terms: jnp.ndarray,       # [B, Tq] int32 (-1 pad)
    q_weights: jnp.ndarray,     # [B, Tq] f32
    k: int = 100,
    p_cap: int = 1024,
    candidates: int = 512,
    dma_gather: bool = None,
    bitonic: bool = None,
    imp_bits: int = 8,          # must match pack_doc_vectors
    pool_recall: float = 0.999,
    presorted: bool = False,    # dual doc-ordered layout (pack_postings_presorted)
    sort_ids: bool = False,     # ascending-address rescore gather
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RANK-SAFE production sparse scoring: q8 window kernel generates a
    top-`candidates` pool (approx_max_k at `pool_recall` — 0.95 loses
    ~0.5% of true top-10 through pool-selection alone), then every pooled
    doc is exactly rescored against its full term vector
    (sparse_exact_rescore) and re-ranked.

    Closes the p_cap truncation hole (recall@10 0.88 at q8/p_cap=2048,
    docs/quality_q8.json): window coverage of true top-10 docs is 100% at
    p_cap=2048 (every miss mode is pool ranking, not coverage), so recall
    climbs with the pool. Measured vs full-depth exact at p_cap=2048,
    imp_bits=12 (docs/quality_rescore.json): cand=1024 -> recall@10
    0.980 / nDCG@10 retention 0.9995 at 2.5x plain-q8 latency; cand=2048
    -> 0.990 / retention 1.0000 at 3.5x. The reference's exhaustive
    Lucene scoring is rank-exact at unbounded postings-traversal cost;
    this buys back rank safety at a bounded, documented multiple of the
    approximate kernel.

    Pool selection: on TPU the pool comes from a second Pallas bitonic
    pass over (sum << 16 | position) keys (_bitonic_pool) — EXACT pool
    top-k with no approx_max_k recall loss, and ~an order of magnitude
    faster than approx_max_k at the >= 0.97 recall regime where XLA's
    kernel falls off a cliff (docs/KERNEL_NOTES.md). Off-TPU (or at
    non-power-of-two shapes) approx_max_k at `pool_recall` remains."""
    sums, sids, wmax_col, bit_used = _q8_row_sums(
        packed, offsets, term_scales, q_terms, q_weights,
        p_cap, dma_gather, bitonic, presorted=presorted)
    M = sums.shape[1]
    pool = min(candidates, M)
    if pool < M and _can_bitonic_pool(bit_used, M, q_terms.shape[1]):
        cs, ci, _ = _bitonic_pool(sums, sids, pool, wmax_col)
    else:
        scores = jnp.where(sums >= 0,
                           sums.astype(jnp.float32) * wmax_col, -jnp.inf)
        if M <= max(4 * pool, 256):
            cs, cidx = jax.lax.top_k(scores, pool)
        else:
            cs, cidx = jax.lax.approx_max_k(scores, pool,
                                            recall_target=pool_recall)
        ci = jnp.where(jnp.isfinite(cs),
                       jnp.take_along_axis(sids, cidx, axis=-1), -1)
    return sparse_exact_rescore(
        cs, ci, doc_packed, doc_scale, q_terms, q_weights, k=k,
        imp_bits=imp_bits, sort_ids=sort_ids)


@partial(jax.jit, static_argnames=("k", "p_cap", "candidates", "dma_gather",
                                   "bitonic", "imp_bits", "pool_recall",
                                   "tie_rel_eps", "presorted"))
def sparse_score_topk_q8_certified(
    packed: jnp.ndarray,        # [P] int32 (doc << 8 | uint8 impact)
    offsets: jnp.ndarray,       # [T+1] int32
    term_scales: jnp.ndarray,   # [T] f32
    doc_packed: jnp.ndarray,    # [N, Td] int32 doc-major (pack_doc_vectors)
    doc_scale: jnp.ndarray,     # [N] f32
    q_terms: jnp.ndarray,       # [B, Tq] int32 (-1 pad)
    q_weights: jnp.ndarray,     # [B, Tq] f32 (>= 0)
    k: int = 100,
    p_cap: int = 1024,
    candidates: int = 1024,
    dma_gather: bool = None,
    bitonic: bool = None,
    imp_bits: int = 8,
    pool_recall: float = 0.95,
    doc_terms: jnp.ndarray = None,   # [N, Td] int32 (pack_doc_vectors_exact)
    doc_w: jnp.ndarray = None,       # [N, Td] f32
    tie_rel_eps: float = 1e-5,
    presorted: bool = False,  # dual doc-ordered layout (pack_postings_presorted)
    tail_max: jnp.ndarray = None,    # [N] f32 (pack_doc_vectors return_tail;
                                     # REQUIRED when doc_packed was built
                                     # with doc_cap < the longest doc)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CERTIFIED rank-exact sparse scoring: the q8r pipeline plus a sound
    per-query exactness certificate.
    -> (scores [B, k] desc, ids [B, k], certified [B] bool, slack [B] f32).

    The reference's Lucene/Terrier scoring is rank-exact by exhaustive
    postings traversal (reference src/retrievers/splade.py:75-80,
    src/retrievers/bm25.py:43-52). Here the windowed kernel is a candidate
    generator, and a MaxScore-style upper bound PROVES per query whether
    the returned top-k is the true top-k of the stored index.

    The bound is PER-DOC, not per-query worst case: the segsum kernel
    runs in plus_one mode, so each doc's run total is q8sum + cnt, and

        true_windowed(d) <= wmax * (q8sum(d) + cnt(d))

    because each contribution's combined quantization error (<= 0.5 q8
    requantization + <= 0.5 * qw/wmax packed-uint8 rounding) is under one
    wmax unit. The pool selects the top `candidates` BOUND values, so the
    (pool+1)-th bound value IS the exact maximum possible true windowed
    score of any non-pooled doc — no eps_q8/eps_u8 slack terms at all
    (the round-4 formulation charged ~(0.5*Tq + 2 + 0.5*sum qw/wmax) *
    wmax per query, which certified 0/300 real SciFact queries; the
    per-doc bound charges each outside doc only its own cnt <= Tq
    matches, typically 1-2). On top of that,

        bound = max(outside_ub, 0) + U_hidden,
        U_hidden = sum_t qw_t * (edge_impact_t + 0.5) * [df_t > p_cap]

    bounds the mass hidden behind truncated windows (impact-ordered
    lists: a tail posting never beats the window edge). Every pooled doc
    is exactly rescored against its FULL doc vector, so the query is
    certified when the k-th rescored score (minus the imp_bits
    doc-vector slack, with a k/k+1 gap check for within-pool stability)
    clears `bound` — then the returned k ids ARE the true top-k set of
    the index.

    TIE TOLERANCE: the certificate proves the returned set is a true
    top-k up to swaps among docs whose true scores differ by at most
    tie_rel_eps * scale (scale = |ret_lb| + bound) — the equivalence
    class under which any two f32 engines agree (the exact engine's own
    summation order perturbs scores at ~1e-7; measured on real SciFact,
    7/298 queries have EXACT k/k+1 ties that no arithmetic could order).
    Within that band the claim is set equality, not order.

    RESCORE PRECISION: by default pooled docs rescore against quantized
    doc vectors (pack_doc_vectors, imp_bits), whose per-doc epsilon
    0.5 * doc_scale * sum(qw) dominates tight k/k+1 gaps (~1e-3
    relative at imp_bits=14). Passing doc_terms/doc_w
    (pack_doc_vectors_exact) switches the pool rescore to raw f32
    weights: the epsilon collapses to the tie band, certifying every
    query whose boundary gap is real (2x rescore gather traffic).

    Certificates are conservative (sound, not tight): an uncertified
    query's result may still be exact. SparseIndex.search_certified
    escalates uncertified queries to exact scoring, making the whole
    batch provably rank-exact at adaptive cost.

    presorted=True reads the dual doc-ordered layout (p_cap MUST equal
    the build cap, as in the plain scorers); the hidden-mass bound then
    takes each window's MINIMUM stored impact (= the term's cap-th
    largest, the exact tail supremum) from the segsum sweep instead of
    the window-edge position — the doc-ordered window has no meaningful
    edge."""
    sums, sids, wmax_col, bit_used, win_min = _q8_row_sums(
        packed, offsets, term_scales, q_terms, q_weights,
        p_cap, dma_gather, bitonic, plus_one=True, presorted=presorted,
        return_win_min=True)
    B, M = sums.shape

    # ---- candidate pool + EXACT maximum bound over non-pooled docs.
    # sums are bound sums (q8sum + cnt), so pooling by them keeps the
    # docs with the highest POSSIBLE true scores, and the (pool+1)-th
    # value upper-bounds every doc left outside ----
    pool = min(candidates, M)
    if pool < M and _can_bitonic_pool(bit_used, M, q_terms.shape[1]):
        cv, ci, outside_ub = _bitonic_pool(sums, sids, pool, wmax_col)
    else:
        row_bounds = jnp.where(sums >= 0,
                               sums.astype(jnp.float32) * wmax_col, -jnp.inf)
        if M <= max(4 * pool, 256):
            cv, cidx = jax.lax.top_k(row_bounds, pool)
        else:
            cv, cidx = jax.lax.approx_max_k(row_bounds, pool,
                                            recall_target=pool_recall)
        ci = jnp.where(jnp.isfinite(cv),
                       jnp.take_along_axis(sids, cidx, axis=-1), -1)
        # sound with an approximate pool: the max over positions NOT
        # selected covers whatever approx_max_k failed to pool
        masked = row_bounds.at[jnp.arange(B)[:, None], cidx].set(-jnp.inf)
        outside_ub = jnp.max(masked, axis=1)          # [B]; -inf = none left

    # ---- per-term window stats for the hidden-mass bound ----
    tq_valid = q_terms >= 0
    terms = jnp.where(tq_valid, q_terms, 0)
    region = offsets[terms + 1] - offsets[terms]
    if presorted:
        # dual layout: each term's region is [asc | desc], true df is half
        region = jax.lax.shift_right_logical(region, 1)
    lens = jnp.where(tq_valid, region, 0)
    qw_raw = jnp.where(tq_valid, jnp.maximum(q_weights, 0.0), 0.0)
    qw = qw_raw * term_scales[terms]                  # folded, per impact unit
    qw = jnp.where(tq_valid, jnp.maximum(qw, 0.0), 0.0)
    P_total = packed.shape[0]
    cap = min(p_cap, P_total)

    # rescore the ENTIRE pool (full per-candidate rows, not just top-k):
    # the within-pool check needs each pooled doc's own quantization
    # bound, which a pool-max epsilon over the (k+1)-th value can't give
    tail_ub = None
    if doc_terms is not None:
        pool_scores = _exact_rescore_scores_f32(
            ci, doc_terms, doc_w, q_terms, q_weights)
    elif tail_max is not None:
        # doc_cap-truncated vectors: a query term with no stored entry
        # may be a dropped term of the doc, worth at most tail_max[d]
        ci, pool_scores, unmatched = _exact_rescore_scores(
            ci, doc_packed, doc_scale, q_terms, q_weights,
            imp_bits=imp_bits, return_unmatched=True)
        tail_ub = unmatched * tail_max[jnp.maximum(ci, 0)]
    else:
        ci, pool_scores = _exact_rescore_scores(
            ci, doc_packed, doc_scale, q_terms, q_weights,
            imp_bits=imp_bits)
    C = pool_scores.shape[1]
    kk = min(k, C)
    top_vals, top_idx = jax.lax.top_k(pool_scores, kk)
    ids = jnp.take_along_axis(ci, top_idx, axis=-1)
    okf = jnp.isfinite(top_vals)
    scores = jnp.where(okf, top_vals, -jnp.inf)
    ids = jnp.where(okf, ids, -1)
    if kk < k:
        scores = jnp.pad(scores, ((0, 0), (0, k - kk)),
                         constant_values=-jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)

    # ---- certificate ----
    if presorted:
        # the dual layout stores only the top-cap postings, so a stored
        # length of exactly cap means the term MAY have a dropped tail
        # (true df is not recoverable from the dual offsets); charging
        # df == cap terms too is conservative but sound
        truncated = tq_valid & (lens >= cap)
    else:
        truncated = tq_valid & (lens > cap)
    # hidden mass: every truncated-tail impact <= the window's minimum
    # stored impact (impact-ordered: the edge; presorted dual: the
    # cap-th largest) + 0.5 uint8 rounding
    edge_q = win_min.astype(jnp.float32)
    u_hidden = jnp.sum(
        jnp.where(truncated, qw * (edge_q + 0.5), 0.0), axis=1)
    # a doc in no window scores >= 0 (qw clamped >= 0), hence the 0 clamp
    vis_bound = jnp.where(jnp.isfinite(outside_ub),
                          jnp.maximum(outside_ub, 0.0), 0.0)
    bound = u_hidden + vis_bound

    # per-candidate rescore-precision slack: imp_bits doc-vector rounding
    # |true - rescored| <= 0.5 * doc_scale * sum qw_raw on the quantized
    # path; zero on the f32 path (its rounding lives in the tie band)
    sum_qw = jnp.sum(qw_raw, axis=1)                  # [B]
    if doc_terms is not None:
        eps_c = jnp.zeros_like(pool_scores)
    else:
        eps_c = 0.5 * doc_scale[jnp.maximum(ci, 0)] * sum_qw[:, None]
    if tail_ub is not None:
        # the tail correction is one-sided: stored scores only ever
        # UNDER-count a truncated doc, so it widens each candidate's
        # upper bound but leaves the lower bound (scores - eps_c) valid
        eps_up = eps_c + tail_ub
    else:
        eps_up = eps_c
    eps_ret = jnp.take_along_axis(eps_c, top_idx, axis=-1)[:, :kk]
    ret_lb = jnp.min(jnp.where(ids[:, :kk] >= 0,
                               scores[:, :kk] - eps_ret, jnp.inf), axis=1)
    # every pooled-but-unreturned doc's true score upper bound
    pool_ub = jnp.where(ci >= 0, pool_scores + eps_up, -jnp.inf)
    pool_ub = pool_ub.at[
        jnp.arange(pool_ub.shape[0])[:, None], top_idx].set(-jnp.inf)
    disp_ub = jnp.max(pool_ub, axis=1)                # -inf: pool <= k docs

    kth = scores[:, kk - 1]
    # the tie band: absorbs f32 summation-order noise AND defines the
    # accepted swap radius (docstring TIE TOLERANCE)
    tau = tie_rel_eps * (jnp.abs(ret_lb) + jnp.abs(bound))
    # (a) every returned doc's true score clears any NON-POOL doc
    slack_out = ret_lb - bound
    # (b) within-pool set stability: every returned doc's true lower bound
    # clears every unreturned pooled doc's true upper bound
    # (trivially true when the pool holds <= k docs)
    slack_in = jnp.where(jnp.isfinite(disp_ub), ret_lb - disp_ub, jnp.inf)
    slack = jnp.minimum(slack_out, slack_in)
    # both sum branches are integer-exact at any row mass (Pallas int32
    # scan / segmented_sums_presorted_i32), so no mass-based refusal
    certified = jnp.isfinite(kth) & (slack >= -tau)
    return scores, ids, certified, slack


@partial(jax.jit, static_argnames=("k", "p_cap", "exact_topk", "dma_gather",
                                   "bitonic", "approx_recall", "presorted"))
def sparse_score_topk_q8(
    packed: jnp.ndarray,        # [P] int32 (doc << 8 | uint8 impact)
    offsets: jnp.ndarray,       # [T+1] int32
    term_scales: jnp.ndarray,   # [T] f32 per-term dequant scales
    q_terms: jnp.ndarray,       # [B, Tq] int32 (-1 pad)
    q_weights: jnp.ndarray,     # [B, Tq] f32 (>= 0)
    k: int = 100,
    p_cap: int = 1024,
    exact_topk: bool = False,
    dma_gather: bool = None,
    bitonic: bool = None,
    approx_recall: float = 0.95,
    presorted: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantized-sort sparse scoring: ONE int32 sort key per posting.

    The segmented-sort path's dominant cost is `lax.sort((ids, vals))` —
    an 8-byte key+payload permute per element. Here the CONTRIBUTION
    (impact x dequant x query weight) is requantized to 8 bits against
    the query's max per-term weight and packed back into the low byte of
    the doc key: sort ONE int32, no payload. On TPU the sort is a fused
    VMEM-resident Pallas bitonic + integer segmented run-sum
    (ops.pallas.bitonic — the sort alone is 2.06x lax.sort, 19.7 vs
    40.6 ms at [1024, 32k], and the in-kernel int32 scan replaces the
    XLA f32 cumsum tail: exact sums, no cumsum-difference error).

    presorted=True reads the dual doc-ordered layout
    (pack_postings_presorted, p_cap == build cap) and skips the bitonic
    network's first log2(p_cap) rounds — identical scores, fewer sort
    stages (_q8_row_sums).

    Precision: each contribution rounds to cmax/255 (cmax = the query's
    max possible single contribution), so a k-term sum is off by at most
    k/510 x cmax — measured recall@100 vs the exact pair-sort path
    >= 0.99 on Zipfian BM25/SPLADE queries (tests/test_sparse.py).
    Same output contract as sparse_score_topk_packed."""
    sums, sids, wmax_col, bit_used = _q8_row_sums(
        packed, offsets, term_scales, q_terms, q_weights,
        p_cap, dma_gather, bitonic, presorted=presorted)
    M = sums.shape[1]
    kk = min(k, M)
    if (exact_topk and kk < M
            and _can_bitonic_pool(bit_used, M, q_terms.shape[1])):
        # EXACT selection via a second bitonic pass: lax.top_k is
        # pathologically slow on wide rows (tens of ms at [1024, 32k]);
        # _bitonic_pool gives the same exact top-k from the integer sums
        top_vals, top_ids, _ = _bitonic_pool(sums, sids, kk, wmax_col)
        ok = jnp.isfinite(top_vals)
        return (jnp.where(ok, top_vals, -jnp.inf),
                jnp.where(ok, top_ids, -1))
    scores = jnp.where(sums >= 0,
                       sums.astype(jnp.float32) * wmax_col, -jnp.inf)
    if exact_topk or M <= max(4 * kk, 256):
        top_vals, top_idx = jax.lax.top_k(scores, kk)
    else:
        top_vals, top_idx = jax.lax.approx_max_k(
            scores, kk, recall_target=approx_recall)
    top_ids = jnp.take_along_axis(sids, top_idx, axis=-1)
    ok = jnp.isfinite(top_vals)
    return (jnp.where(ok, top_vals, -jnp.inf),
            jnp.where(ok, top_ids, -1))
