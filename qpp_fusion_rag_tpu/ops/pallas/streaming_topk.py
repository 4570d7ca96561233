"""Streaming dense-scoring kernel v2: HBM corpus, manual double-buffered DMA.

The v1 kernel (dense_topk.py) lets the Pallas pipeline fetch a corpus tile
per grid step; with the query-row grid axis the corpus re-streams once per
query tile (m_tiles × 4 GB of HBM reads at NQ scale). This kernel instead:

  * keeps a block of query rows VMEM-resident for the whole pass,
  * streams the corpus once via explicit double-buffered `make_async_copy`
    from HBM (grid = corpus super-tiles, DMA overlaps the matmul),
  * reduces each 128-doc group to (max, argmax) on the VPU,
  * emits a tile-aligned [1, M, 128] output block per super-tile — no
    host-side transpose afterwards.

Per super-tile of 16384 docs: 16 sub-blocks of 1024 docs double-buffer
through VMEM scratch; an inner fori loop walks MSLAB(=512)-row query
slabs.
VMEM budget at M=2560, D=768: q 3.9 MB + 2×1.5 MB corpus slots + 1 MB
scores + 2.6 MB output staging ≈ 10.5 MB.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128
SUB = 1024           # docs per DMA sub-block
SUPER = 16 * SUB     # docs per grid step (output tile: SUPER/GROUP = 128 cols)
MSLAB = 512          # query rows per inner matmul


def _make_kernel(n_real: int):
    """Kernel factory closing over the real corpus length: zero-vector pad
    docs (score 0) must rank as -inf inside the kernel or they displace
    negative-scoring real docs from their group's argmax."""

    def _kernel(q_ref, corpus_ref, vals_ref, ids_ref, c_scratch, sems):
        sup = pl.program_id(0)
        M = q_ref.shape[0]
        base_doc = sup * SUPER

        def dma(slot, sub):
            return pltpu.make_async_copy(
                corpus_ref.at[pl.ds(base_doc + sub * SUB, SUB), :],
                c_scratch.at[slot],
                sems.at[slot],
            )

        dma(0, 0).start()
        n_sub = SUPER // SUB

        for sub in range(n_sub):                  # static unroll (16)
            slot = sub % 2
            if sub + 1 < n_sub:
                dma((sub + 1) % 2, sub + 1).start()
            dma(slot, sub).wait()
            block = c_scratch[slot]               # [SUB, D]

            def m_body(mi, _, sub=sub):
                q = q_ref[pl.ds(mi * MSLAB, MSLAB), :]
                s = jax.lax.dot_general(
                    q, block, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                  # [MSLAB, SUB]
                if n_real:
                    col = (base_doc + sub * SUB
                           + jax.lax.broadcasted_iota(jnp.int32, (MSLAB, SUB), 1))
                    s = jnp.where(col < n_real, s, -jnp.inf)
                g = SUB // GROUP
                s3 = s.reshape(MSLAB, g, GROUP)
                vals_ref[0, pl.ds(mi * MSLAB, MSLAB), pl.ds(sub * g, g)] = jnp.max(s3, -1)
                arg = jnp.argmax(s3, -1).astype(jnp.int32)
                base = (
                    base_doc + sub * SUB
                    + jax.lax.broadcasted_iota(jnp.int32, (MSLAB, g), 1) * GROUP
                )
                ids_ref[0, pl.ds(mi * MSLAB, MSLAB), pl.ds(sub * g, g)] = base + arg
                return 0

            jax.lax.fori_loop(0, M // MSLAB, m_body, 0)

    return _kernel


@partial(jax.jit, static_argnames=("n_real",))
def _streaming_group_max(q: jnp.ndarray, corpus: jnp.ndarray, n_real: int = 0):
    """q [M, D] (M % MSLAB == 0), corpus [N, D] (N % SUPER == 0)
    -> (vals [M, N/128] f32, ids [M, N/128] i32)."""
    M, D = q.shape
    N = corpus.shape[0]
    n_super = N // SUPER
    vals, ids = pl.pallas_call(
        _make_kernel(0 if n_real == N else n_real),
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((M, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),      # corpus stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, M, SUPER // GROUP), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, SUPER // GROUP), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_super, M, SUPER // GROUP), jnp.float32),
            jax.ShapeDtypeStruct((n_super, M, SUPER // GROUP), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, SUB, D), corpus.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * D,
            bytes_accessed=M * D * 2 + N * D * 2 + 2 * M * (N // GROUP) * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, corpus)
    vals = jnp.moveaxis(vals, 0, 1).reshape(M, N // GROUP)
    ids = jnp.moveaxis(ids, 0, 1).reshape(M, N // GROUP)
    return vals, ids


@partial(jax.jit, static_argnames=("k", "row_block"))
def streaming_dense_topk(
    queries: jnp.ndarray,   # [B, D]
    corpus: jnp.ndarray,    # [N, D]
    k: int = 100,
    row_block: int = 2560,  # query rows per kernel launch (VMEM residency)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused dense top-k via the streaming kernel -> (scores, ids) [B, k]."""
    B, D = queries.shape
    n = corpus.shape[0]
    pad_n = (-n) % SUPER
    if pad_n:
        corpus = jnp.pad(corpus, ((0, pad_n), (0, 0)))
    q = queries.astype(corpus.dtype)
    # round row_block DOWN to a slab multiple: rounding up would exceed
    # the caller's per-launch VMEM residency bound
    rb = max(MSLAB, min(row_block, -(-B // MSLAB) * MSLAB) // MSLAB * MSLAB)
    pad_b = (-B) % rb
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0)))

    outs_v, outs_i = [], []
    for start in range(0, q.shape[0], rb):
        v, i = _streaming_group_max(
            jax.lax.dynamic_slice_in_dim(q, start, rb, 0), corpus,
            n_real=n if pad_n else 0,
        )
        outs_v.append(v)
        outs_i.append(i)
    vals = jnp.concatenate(outs_v, axis=0)[:B]
    ids = jnp.concatenate(outs_i, axis=0)[:B]
    kk = min(k, vals.shape[-1])
    tv, tx = jax.lax.approx_max_k(vals, kk, recall_target=0.95)
    ti = jnp.take_along_axis(ids, tx, axis=-1)
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        tv = jnp.pad(tv, pad, constant_values=-jnp.inf)
        ti = jnp.pad(ti, pad, constant_values=-1)
    ti = jnp.where(jnp.isfinite(tv), ti, -1)
    return tv, ti
