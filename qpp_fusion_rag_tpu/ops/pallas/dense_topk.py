"""Pallas fused matmul + block-max kernel for dense retrieval (TPU).

The XLA path (ops.dense) materializes the per-chunk score tensor
[rows, chunk] f32 in HBM between the matmul and the top-k reduction — at
NQ scale that is ~54 GB of HBM round-trip per 1024-query batch, which caps
throughput at ~92 TF/s on v5e. This kernel fuses the reduction into the
matmul: scores live only in VMEM, and each 128-doc group emits (max,
argmax), shrinking the matmul's output traffic by 128×.

    phase 1 (this kernel): q [M, D] × corpus -> packed group maxima
        [M, N/128] f32 with the winning lane in the low mantissa bits
        (default `packed` path; the unpacked kernel also emits ids)
    phase 2 (XLA): approx/exact top-k over the group maxima; doc ids
        derive arithmetically from (column, lane) — no gather.

Group-max selection is the same reduction `lax.approx_max_k` performs
(one candidate per 128-doc tile), so phase 1 + phase 2 matches the
approx path's recall (~0.98 @ k=100 when corpus rows are order-shuffled —
see DenseIndex) while avoiding the score-tensor HBM traffic entirely.

Tiling: grid (N/TN outer, M/TM inner) so the corpus tile stays
VMEM-resident across query tiles; per step the MXU computes [TM, D] ×
[D, TN] in one shot (D ≤ 1024 fits VMEM), the VPU packs lane bits and
reduces TN to TN/128 maxima. Defaults TM=512 (packed) / 256, TN=2048 —
the only fast Mosaic-compilable point found on v5e (see
docs/KERNEL_NOTES.md for the sweep).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # docs per emitted candidate (VPU lane width)

# Large negative finite sentinel for masked pad docs in the packed path
# (-inf would turn into NaN once lane bits are OR-ed into the mantissa).
NEG_FINITE = -3.0e38  # plain float: jnp scalars become captured consts in kernels


def _pack_lane(v: jnp.ndarray, lane: jnp.ndarray) -> jnp.ndarray:
    """Embed a 7-bit lane index into the low mantissa bits of f32 scores.

    Clearing the low 7 bits costs at most 127 ulp ≈ 2^-16 relative error and
    preserves ordering up to that quantum, so the packed score remains a
    valid sort key AND carries the within-group argmax — eliminating both
    the kernel's ids output and the post-merge id gather (measured 21 ms
    per 1024-query batch on v5e)."""
    bits = jax.lax.bitcast_convert_type(v, jnp.int32)
    packed = (bits & ~jnp.int32(0x7F)) | lane.astype(jnp.int32)
    return jax.lax.bitcast_convert_type(packed, jnp.float32)


def unpack_lane(v: jnp.ndarray):
    """-> (clean f32 score, lane int32)."""
    bits = jax.lax.bitcast_convert_type(v, jnp.int32)
    lane = bits & jnp.int32(0x7F)
    clean = jax.lax.bitcast_convert_type(bits & ~jnp.int32(0x7F), jnp.float32)
    return clean, lane


def _make_kernel(n_real: int, stride: int = 1):
    """Kernel factory.

    n_real > 0 masks zero-vector pad docs to -inf INSIDE the kernel —
    scores are VMEM-resident there, so the mask is free, whereas pad docs
    left at score 0 would displace negative-scoring real docs from their
    group's argmax (losing up to GROUP-1 real candidates per boundary tile).

    stride > 1 adds a second in-kernel reduction level: `stride` 128-doc
    group maxima drawn from strided (non-adjacent) column blocks of the
    tile collapse to one emitted candidate per stride·GROUP docs,
    shrinking both the output traffic and the phase-2 merge input by stride× at a small recall cost (collisions of top-k
    docs within a coarse block).
    """

    def _kernel(q_ref, c_ref, vals_ref, ids_ref):
        # q_ref [TM, D] bf16, c_ref [TN, D] bf16 -> scores [TM, TN] f32 (VMEM)
        scores = jax.lax.dot_general(
            q_ref[:], c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        TM, TN = scores.shape
        j = pl.program_id(0)  # n-tile index (outer grid axis)
        if n_real:
            col = j * TN + jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1)
            scores = jnp.where(col < n_real, scores, -jnp.inf)
        g = TN // GROUP
        s3 = scores.reshape(TM, g, GROUP)
        v1 = jnp.max(s3, axis=-1)                            # [TM, g]
        arg = jnp.argmax(s3, axis=-1).astype(jnp.int32)      # in-group lane
        base = j * TN + jax.lax.broadcasted_iota(jnp.int32, (TM, g), 1) * GROUP
        i1 = base + arg                                      # global doc ids
        if stride == 1:
            vals_ref[0] = v1
            ids_ref[0] = i1
        else:
            # Unrolled elementwise max-select over contiguous column blocks
            # (Mosaic supports neither 3D gather nor [TM, g] -> [TM, g2, s]
            # shape casts; merging ANY disjoint group sets is equally valid
            # since doc ids are tracked exactly).
            g2 = g // stride
            best_v, best_i = v1[:, :g2], i1[:, :g2]
            for t in range(1, stride):
                cv = v1[:, t * g2:(t + 1) * g2]
                ci = i1[:, t * g2:(t + 1) * g2]
                better = cv > best_v
                best_v = jnp.where(better, cv, best_v)
                best_i = jnp.where(better, ci, best_i)
            vals_ref[0] = best_v
            ids_ref[0] = best_i

    return _kernel


def _make_packed_kernel(n_real: int, transposed: bool = False):
    """Packed kernel: emit ONE f32 per 128-doc group with the winning lane
    embedded in the low mantissa bits (see _pack_lane). The lane packs into
    EVERY score before the reduce, so one `max` replaces max+argmax (two
    reduction passes) — measured 189 -> 165 ms retrieval on v5e. Halves the
    kernel's output traffic and removes the phase-2 id gather too.

    transposed=True takes the corpus block as [D, TN] (doc-major matrix
    stored [D, N]) — the contraction then needs no in-kernel transpose,
    measured another ~4% faster on v5e."""

    def _kernel(q_ref, c_ref, vals_ref):
        dims = (((1,), (0,)), ((), ())) if transposed else (((1,), (1,)), ((), ()))
        scores = jax.lax.dot_general(
            q_ref[:], c_ref[:],
            dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        TM, TN = scores.shape
        j = pl.program_id(0)
        if n_real:
            col = j * TN + jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1)
            scores = jnp.where(col < n_real, scores, NEG_FINITE)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1) & jnp.int32(0x7F)
        packed = _pack_lane(scores, lane)
        g = TN // GROUP
        vals_ref[0] = jnp.max(packed.reshape(TM, g, GROUP), axis=-1)

    return _kernel


def _make_packed_kernel_int8(n_real: int):
    """Quantized packed kernel: int8 queries [TM, D] × int8 corpus [D, TN]
    contract on the MXU's int8 mode (2× the bf16 rate on v5e), then the VPU
    rescales by the per-doc quantization scale, packs the lane and reduces.

    Scores are s[m, n] = i32dot(q_int[m], c_int[n]) * d_scale[n]; the
    per-QUERY scale q_scale[m] is deliberately NOT applied here — a positive
    per-row factor never changes that row's ranking, so it is applied to the
    k selected values after the merge (k ≪ N elementwise multiplies)."""

    def _kernel(q_ref, c_ref, s_ref, vals_ref):
        scores_i32 = jax.lax.dot_general(
            q_ref[:], c_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        TM, TN = scores_i32.shape
        scores = scores_i32.astype(jnp.float32) * s_ref[0][None, :]
        j = pl.program_id(0)
        if n_real:
            col = j * TN + jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1)
            scores = jnp.where(col < n_real, scores, NEG_FINITE)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1) & jnp.int32(0x7F)
        packed = _pack_lane(scores, lane)
        g = TN // GROUP
        vals_ref[0] = jnp.max(packed.reshape(TM, g, GROUP), axis=-1)

    return _kernel


@partial(jax.jit, static_argnames=("tm", "tn", "n_real"))
def group_max_packed_int8(
    q_int: jnp.ndarray,      # [M, D] int8 (row-quantized queries)
    corpus_int: jnp.ndarray, # [D, N] int8 (doc-quantized, transposed layout)
    d_scale: jnp.ndarray,    # [1, N] f32 per-doc dequant scale
    tm: int = 512,
    tn: int = 2048,
    n_real: int = 0,
) -> jnp.ndarray:
    """-> packed group maxima [M, N/GROUP] f32 over int8-MXU scores."""
    M, D = q_int.shape
    N = corpus_int.shape[1]
    assert N % tn == 0 and tn % GROUP == 0, (N, tn)
    pad_m = (-M) % tm
    if pad_m:
        q_int = jnp.pad(q_int, ((0, pad_m), (0, 0)))
    Mp = q_int.shape[0]
    grid = (N // tn, Mp // tm)
    g_out = tn // GROUP
    n_tiles = N // tn
    vals = pl.pallas_call(
        _make_packed_kernel_int8(0 if n_real == N else n_real),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, D), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, g_out), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, Mp, g_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * D,
            bytes_accessed=Mp * D + N * D + N * 4 + Mp * (N // GROUP) * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q_int, corpus_int, d_scale)
    return jnp.moveaxis(vals, 0, 1).reshape(Mp, N // GROUP)[:M]


def _make_packed_kernel_int8_global(n_real: int):
    """int8 kernel with a GLOBAL dequant scale: the whole reduction stays
    in int32. The 7-bit lane packs into the low bits of the shifted score
    (score*128 + lane — monotone in score, lane as tie-break), then ONE
    integer max reduces each 128-doc group. VPU cost per element drops
    from convert+mul+iota-and+pack-or+max (f32 path) to shift+or+max.

    Valid when corpus vectors share one scale — the natural case for
    L2-NORMALIZED embeddings (BGE/TCT/e5 all unit-norm), where per-doc
    maxima are within ~2x of each other anyway. |i32 dot| < 768*127^2
    ≈ 1.24e7 < 2^24, so the <<7 shift cannot overflow int32."""

    def _kernel(q_ref, c_ref, vals_ref):
        scores = jax.lax.dot_general(
            q_ref[:], c_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        TM, TN = scores.shape
        j = pl.program_id(0)
        if n_real:
            # pad sentinel -(1<<24): below any real score (|dot| < 1.24e7
            # < 2^24) and shifts to exactly INT_MIN without wrapping.
            col = j * TN + jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1)
            scores = jnp.where(col < n_real, scores, jnp.int32(-(1 << 24)))
        lane = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1) & jnp.int32(0x7F)
        packed = (scores << 7) | lane
        g = TN // GROUP
        vals_ref[0] = jnp.max(packed.reshape(TM, g, GROUP), axis=-1)

    return _kernel


@partial(jax.jit, static_argnames=("tm", "tn", "n_real"))
def group_max_packed_int8_global(
    q_int: jnp.ndarray,      # [M, D] int8
    corpus_int: jnp.ndarray, # [D, N] int8 (ONE global scale)
    tm: int = 512,
    tn: int = 4096,
    n_real: int = 0,
) -> jnp.ndarray:
    """-> packed int32 group maxima [M, N/GROUP]: (i32score << 7) | lane."""
    M, D = q_int.shape
    N = corpus_int.shape[1]
    assert N % tn == 0 and tn % GROUP == 0, (N, tn)
    # the (score << 7) | lane packing needs |i32 dot| < 2^24 so the shift
    # cannot overflow and the -(1<<24) pad sentinel stays below any real
    # score; |dot| <= D * 127^2, so D <= 1040 (768/1024 ok, 1536 is not —
    # use the per-doc-scale kernel group_max_packed_int8 for larger dims)
    assert D * 127 * 127 < (1 << 24), (
        f"int8 global-scale packing requires D*127^2 < 2^24 (D <= 1040); "
        f"got D={D} — use pallas_dense_topk_int8 instead")
    pad_m = (-M) % tm
    if pad_m:
        q_int = jnp.pad(q_int, ((0, pad_m), (0, 0)))
    Mp = q_int.shape[0]
    grid = (N // tn, Mp // tm)
    g_out = tn // GROUP
    n_tiles = N // tn
    vals = pl.pallas_call(
        _make_packed_kernel_int8_global(0 if n_real == N else n_real),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, D), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, g_out), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, Mp, g_out), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * D,
            bytes_accessed=Mp * D + N * D + Mp * (N // GROUP) * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q_int, corpus_int)
    return jnp.moveaxis(vals, 0, 1).reshape(Mp, N // GROUP)[:M]


def quantize_global(x: jnp.ndarray):
    """Symmetric GLOBAL int8 quantization -> (int8 values, f32 scalar scale).
    The right scheme for L2-normalized embedding matrices."""
    amax = jnp.max(jnp.abs(x))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


@partial(jax.jit, static_argnames=("k", "tm", "tn", "exact_merge"))
def pallas_dense_topk_int8_global(
    queries: jnp.ndarray,     # [B, D] f32
    corpus_int: jnp.ndarray,  # [D, N] int8, one global scale
    corpus_scale: jnp.ndarray,  # scalar f32
    k: int = 100,
    tm: int = 512,
    tn: int = 4096,
    exact_merge: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global-scale int8 fused top-k: all-integer kernel reduction, scales
    applied to the k winners only. -> (scores [B, k], ids [B, k])."""
    q_int, q_scale = quantize_rows(queries.astype(jnp.float32))
    D = queries.shape[1]
    assert D * 127 * 127 < (1 << 24), (
        f"int8 global-scale packing requires D*127^2 < 2^24 (D <= 1040); "
        f"got D={D} — use pallas_dense_topk_int8 instead")
    n = corpus_int.shape[1]
    pad_n = (-n) % tn
    if pad_n:
        corpus_int = jnp.pad(corpus_int, ((0, 0), (0, pad_n)))
    vals = group_max_packed_int8_global(q_int, corpus_int, tm=tm, tn=tn,
                                        n_real=n if pad_n else 0)
    kk = min(k, vals.shape[-1])
    if exact_merge or vals.shape[-1] <= max(kk * 4, 256):
        tv, tx = jax.lax.top_k(vals, kk)
    else:
        # approx_max_k needs f32; int32 order is preserved under the
        # approx selection runs on a direct int32->f32 cast. The cast is
        # only order-EXACT below 2^24; packed magnitudes reach 2^31, so
        # up to 256 adjacent packed ints (i.e. 2 distinct score quanta at
        # the extremes) collapse into one f32 and approx_max_k may
        # tie-break to the lower quantum — accepted, it is well inside
        # the 0.95-recall approx budget (exact int32 top_k on wide rows
        # costs tens of ms; the exact_merge path avoids all of this).
        fv = vals.astype(jnp.float32)
        tvf, tx = jax.lax.approx_max_k(fv, kk, recall_target=0.95)
        tv = jnp.take_along_axis(vals, tx, axis=-1)
    score_i = jax.lax.shift_right_arithmetic(tv, 7)
    lane = tv & jnp.int32(0x7F)
    top_ids = tx.astype(jnp.int32) * GROUP + lane
    top_vals = score_i.astype(jnp.float32) * (q_scale * corpus_scale)
    # pad sentinel unpacks to exactly -(1<<24); real scores are bounded
    # below by -D*127^2 > -(1<<24) (asserted above), so this is exact
    valid = score_i > jnp.int32(-(1 << 24))
    top_vals = jnp.where(valid, top_vals, -jnp.inf)
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        top_vals = jnp.pad(top_vals, pad, constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, pad, constant_values=-1)
    top_ids = jnp.where(jnp.isfinite(top_vals), top_ids, -1)
    return top_vals, top_ids


def quantize_rows(x: jnp.ndarray, axis: int = -1):
    """Symmetric per-row int8 quantization -> (int8 values, f32 scales).

    scale = max|x| / 127 along `axis`; zero rows get scale 1 (values all 0).
    """
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


@partial(jax.jit, static_argnames=("tm", "tn", "n_real", "transposed"))
def group_max_packed(
    q: jnp.ndarray,
    corpus: jnp.ndarray,     # [N, D], or [D, N] when transposed=True
    tm: int = 256,
    tn: int = 2048,
    n_real: int = 0,
    transposed: bool = False,
) -> jnp.ndarray:
    """-> packed group maxima [M, N/GROUP] f32 (lane in low mantissa bits)."""
    M, D = q.shape
    N = corpus.shape[1] if transposed else corpus.shape[0]
    assert N % tn == 0 and tn % GROUP == 0, (N, tn)
    pad_m = (-M) % tm
    if pad_m:
        q = jnp.pad(q, ((0, pad_m), (0, 0)))
    Mp = q.shape[0]
    q = q.astype(corpus.dtype)
    grid = (N // tn, Mp // tm)
    g_out = tn // GROUP
    n_tiles = N // tn
    if transposed:
        corpus_spec = pl.BlockSpec((D, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    else:
        corpus_spec = pl.BlockSpec((tn, D), lambda j, i: (j, 0), memory_space=pltpu.VMEM)
    vals = pl.pallas_call(
        _make_packed_kernel(0 if n_real == N else n_real, transposed=transposed),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, D), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            corpus_spec,
        ],
        out_specs=pl.BlockSpec((1, tm, g_out), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, Mp, g_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * D,
            bytes_accessed=Mp * D * 2 + N * D * 2 + Mp * (N // GROUP) * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, corpus)
    return jnp.moveaxis(vals, 0, 1).reshape(Mp, N // GROUP)[:M]


@partial(jax.jit, static_argnames=("tm", "tn", "n_real", "stride"))
def group_max_scores(
    q: jnp.ndarray,        # [M, D] (cast to corpus dtype)
    corpus: jnp.ndarray,   # [N, D], N % tn == 0
    tm: int = 256,         # VMEM-validated on v5e with tn=2048, D=768
    tn: int = 2048,
    n_real: int = 0,       # real corpus length; 0 means "no padding"
    stride: int = 1,       # 2nd-level reduction: one candidate per stride*GROUP docs
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (vals [M, N/(GROUP·stride)] f32, ids ... i32 global doc ids)."""
    M, D = q.shape
    N = corpus.shape[0]
    assert N % tn == 0 and tn % (GROUP * stride) == 0, (N, tn, stride)
    kernel = _make_kernel(0 if n_real == N else n_real, stride)
    pad_m = (-M) % tm
    if pad_m:
        q = jnp.pad(q, ((0, pad_m), (0, 0)))
    Mp = q.shape[0]
    q = q.astype(corpus.dtype)

    # Grid order: n (corpus tile) OUTER, m (query rows) INNER — the corpus
    # block's index map is then constant across the inner axis, so Mosaic
    # keeps it VMEM-resident instead of re-streaming the whole corpus once
    # per query tile (which costs m_tiles × corpus-size of HBM reads).
    grid = (N // tn, Mp // tm)
    g_out = tn // (GROUP * stride)
    n_tiles = N // tn
    # Output is [n_tiles, Mp, g_out] with the n-tile axis leading: TPU block
    # specs need the last dim to be 128-divisible OR the full array dim —
    # g_out (e.g. 16) is small, so it must be the full trailing dim.
    vals, ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, D), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, D), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, g_out), lambda j, i: (j, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, g_out), lambda j, i: (j, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, Mp, g_out), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, Mp, g_out), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * D,
            bytes_accessed=Mp * D * 2 + N * D * 2 + 2 * Mp * (N // GROUP) * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(q, corpus)
    g_total = N // (GROUP * stride)
    vals = jnp.moveaxis(vals, 0, 1).reshape(Mp, g_total)
    ids = jnp.moveaxis(ids, 0, 1).reshape(Mp, g_total)
    return vals[:M], ids[:M]


@partial(jax.jit, static_argnames=("k", "tm", "tn", "exact_merge", "stride", "packed", "transposed"))
def pallas_dense_topk(
    queries: jnp.ndarray,   # [B, D]
    corpus: jnp.ndarray,    # [N, D], or [D, N] when transposed=True
    k: int = 100,
    tm: int = None,         # None = auto (512 packed / 256 unpacked, v5e-validated)
    tn: int = 2048,
    exact_merge: bool = False,
    stride: int = 1,
    packed: bool = True,
    transposed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused dense top-k -> (scores [B, k], ids [B, k]); approx at the same
    one-per-128-group recall as the approx_max_k path (stride > 1 coarsens
    to one candidate per stride·128 docs — drawn from strided column
    blocks, not contiguous spans — for a faster phase-2 merge). The
    phase-2 merge over group maxima uses approx_max_k by default (exact
    top_k costs ~25 ms more per 1024-query batch on v5e). `packed`
    (default) embeds the group argmax lane in the score's low mantissa bits
    — half the kernel output, no id gather, ≤2^-17 relative score error."""
    if packed and stride != 1:
        raise ValueError("packed=True supports stride=1 only; pass packed=False "
                         "for stride coarsening")
    if transposed and not packed:
        raise ValueError("transposed corpus layout is supported on the packed path only")
    n = corpus.shape[1] if transposed else corpus.shape[0]
    pad_n = (-n) % tn
    if pad_n:
        widths = ((0, 0), (0, pad_n)) if transposed else ((0, pad_n), (0, 0))
        corpus = jnp.pad(corpus, widths)

    def merge(vals):
        kk = min(k, vals.shape[-1])
        if exact_merge or vals.shape[-1] <= max(kk * 4, 256):
            return (*jax.lax.top_k(vals, kk), kk)
        tv, tx = jax.lax.approx_max_k(vals, kk, recall_target=0.95)
        return tv, tx, kk

    if packed:
        # Without the ids output buffer the packed kernel fits tm=512 in
        # VMEM, which halves corpus re-streaming (measured slightly faster).
        tm_eff = tm if tm is not None else (512 if queries.shape[0] >= 512 else 256)
        vals = group_max_packed(queries, corpus, tm=tm_eff, tn=tn,
                                n_real=n if pad_n else 0, transposed=transposed)
        tv, tx, kk = merge(vals)
        clean, lane = unpack_lane(tv)
        top_vals = clean
        top_ids = tx.astype(jnp.int32) * GROUP + lane
        top_vals = jnp.where(clean > NEG_FINITE / 2, top_vals, -jnp.inf)
    else:
        vals, ids = group_max_scores(queries, corpus, tm=tm or 256, tn=tn,
                                     n_real=n if pad_n else 0, stride=stride)
        top_vals, top_idx, kk = merge(vals)
        top_ids = jnp.take_along_axis(ids, top_idx, axis=-1)

    if kk < k:
        pad = ((0, 0), (0, k - kk))
        top_vals = jnp.pad(top_vals, pad, constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, pad, constant_values=-1)
    top_ids = jnp.where(jnp.isfinite(top_vals), top_ids, -1)
    return top_vals, top_ids


@partial(jax.jit, static_argnames=("k", "tm", "tn", "exact_merge"))
def pallas_dense_topk_int8(
    queries: jnp.ndarray,     # [B, D] f32/bf16 (quantized per-row in here)
    corpus_int: jnp.ndarray,  # [D, N] int8 (per-doc symmetric quantization)
    d_scale: jnp.ndarray,     # [1, N] f32 per-doc dequant scales
    k: int = 100,
    tm: int = 512,
    tn: int = 4096,           # v5e-validated best tile (82 ms vs 89 at 2048)
    exact_merge: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantized fused dense top-k -> (scores [B, k], ids [B, k]).

    The corpus matmul runs in the MXU's int8 mode — measured 251 TOP/s vs
    155 TF/s for the bf16 packed kernel on v5e (1.6x) — with per-doc scales
    applied in-kernel before the same pack+group-max reduction, so recall
    semantics match the packed path up to int8 rounding. The per-QUERY
    scale multiplies only the k winners after the merge (ranking-invariant
    inside a row). Score error vs f32 exact is ~1e-2 relative (symmetric
    127-level quantization both sides)."""
    q_int, q_scale = quantize_rows(queries.astype(jnp.float32))
    n = corpus_int.shape[1]
    pad_n = (-n) % tn
    if pad_n:
        corpus_int = jnp.pad(corpus_int, ((0, 0), (0, pad_n)))
        d_scale = jnp.pad(d_scale, ((0, 0), (0, pad_n)))
    vals = group_max_packed_int8(q_int, corpus_int, d_scale, tm=tm, tn=tn,
                                 n_real=n if pad_n else 0)
    kk = min(k, vals.shape[-1])
    if exact_merge or vals.shape[-1] <= max(kk * 4, 256):
        tv, tx = jax.lax.top_k(vals, kk)
    else:
        tv, tx = jax.lax.approx_max_k(vals, kk, recall_target=0.95)
    clean, lane = unpack_lane(tv)
    top_ids = tx.astype(jnp.int32) * GROUP + lane
    top_vals = clean * q_scale
    top_vals = jnp.where(clean > NEG_FINITE / 2, top_vals, -jnp.inf)
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        top_vals = jnp.pad(top_vals, pad, constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, pad, constant_values=-1)
    top_ids = jnp.where(jnp.isfinite(top_vals), top_ids, -1)
    return top_vals, top_ids


@partial(jax.jit, static_argnames=("k", "tm", "tn", "exact_merge"))
def pallas_multi_view_topk_int8(
    queries: jnp.ndarray,     # [B, D]
    view_proj: jnp.ndarray,   # [R, D, Dv]
    corpus_int: jnp.ndarray,  # [Dv, N] int8
    d_scale: jnp.ndarray,     # [1, N] f32
    k: int = 100,
    tm: int = 512,
    tn: int = 4096,
    exact_merge: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """R-view quantized dense top-k -> (scores [R, B, k], ids [R, B, k])."""
    qv = jnp.einsum(
        "bd,rdv->rbv", queries.astype(jnp.float32), view_proj.astype(jnp.float32)
    )
    R, B, Dv = qv.shape
    vals, ids = pallas_dense_topk_int8(
        qv.reshape(R * B, Dv), corpus_int, d_scale, k=k, tm=tm, tn=tn,
        exact_merge=exact_merge,
    )
    return vals.reshape(R, B, k), ids.reshape(R, B, k)


@partial(jax.jit, static_argnames=("k", "tm", "tn", "exact_merge", "stride", "transposed"))
def pallas_multi_view_topk(
    queries: jnp.ndarray,    # [B, D]
    view_proj: jnp.ndarray,  # [R, D, Dv]
    corpus: jnp.ndarray,     # [N, Dv], or [Dv, N] when transposed=True
    k: int = 100,
    tm: int = None,
    tn: int = 2048,
    exact_merge: bool = False,
    stride: int = 1,
    transposed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """R-view fused dense top-k -> (scores [R, B, k], ids [R, B, k])."""
    qv = jnp.einsum(
        "bd,rdv->rbv", queries.astype(jnp.float32), view_proj.astype(jnp.float32)
    )
    R, B, Dv = qv.shape
    vals, ids = pallas_dense_topk(
        qv.reshape(R * B, Dv), corpus, k=k, tm=tm, tn=tn,
        exact_merge=exact_merge, stride=stride, transposed=transposed,
    )
    return vals.reshape(R, B, k), ids.reshape(R, B, k)
