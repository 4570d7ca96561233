"""Pallas posting-window gather: HBM → VMEM via explicit async DMA.

The sparse scorers read a contiguous `cap`-wide window of the packed
postings array per (query, term). XLA lowers the vmapped `dynamic_slice`
formulation to one sequential slice per window — measured ~3.5 GB/s
effective (38.6 ms for 16×2048-wide windows × B=1024 from a 49M-posting
array on v5e), pure per-slice overhead. This kernel instead issues ROWS
async DMA copies per grid step and overlaps them — the TPU idiom for
data-dependent contiguous gathers (scalar-prefetched offsets +
`make_async_copy`, pallas_guide §PrefetchScalarGridSpec/§Async DMA) —
and double-buffers across grid steps: step i+1's ROWS copies are issued
BEFORE step i's VMEM realign, so the rotate/select compute rides under
the next step's DMA latency instead of serializing with it.

Constraints shape the design:
- int32 HBM DMA slices must start on the (8, 128) tile boundary
  (Mosaic: "tile index … divisible by the tiling"), so the kernel
  fetches the 1024-aligned window [start - start % 1024, + cap + 1024)
  and realigns in VMEM. Callers pad the source array with
  `pad_for_gather` so aligned fetches stay in bounds.
- `tpu.dynamic_rotate` rejects 1-D vectors, so the flat window lives as
  [rows, 128] and the realignment is a two-stage rotate: sublane roll by
  off // 128, then lane roll by off % 128 with a boundary select between
  the row and its successor (the flattened-roll decomposition).

Replaces the JVM postings traversal of the reference's Terrier/Lucene
retrievers (reference src/retrievers/bm25.py:29-52, splade.py:75-80) at
the memory-system level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 32      # windows DMA'd concurrently per grid step
ALIGN = 1024   # int32 HBM tile granularity (8 sublanes x 128 lanes)
LANES = 128


def pad_for_gather(flat: np.ndarray, cap: int) -> np.ndarray:
    """Pad a flat postings array so any aligned fetch window stays in
    bounds: final length is a multiple of ALIGN with >= cap + ALIGN slack."""
    need = len(flat) + cap + ALIGN
    total = ((need + ALIGN - 1) // ALIGN) * ALIGN
    return np.pad(flat, (0, total - len(flat)))


def _gather_kernel(starts_ref, src_ref, out_ref, scratch, sems):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    c_rows = out_ref.shape[1]          # cap // LANES
    f_rows = scratch.shape[2]          # (cap + ALIGN) // LANES

    def copy(step, slot, j):
        s = starts_ref[step * ROWS + j]
        row0 = pl.multiple_of((s // ALIGN) * (ALIGN // LANES), ALIGN // LANES)
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(row0, f_rows)],
            scratch.at[slot, j],
            sems.at[slot, j],
        )

    # Double-buffered pipeline: step i's realign overlaps step i+1's DMAs
    # (scratch/sems persist across grid steps; slot parity alternates).
    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _prologue():
        for j in range(ROWS):
            copy(i, slot, j).start()

    @pl.when(i + 1 < n)
    def _prefetch_next():
        nxt = jax.lax.rem(i + 1, 2)
        for j in range(ROWS):
            copy(i + 1, nxt, j).start()

    for j in range(ROWS):
        copy(i, slot, j).wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (f_rows, LANES), 1)
    for j in range(ROWS):
        s = starts_ref[i * ROWS + j]
        off = s % ALIGN
        r = off // LANES
        c = off % LANES
        x = scratch[slot, j]                             # [f_rows, 128]
        y = pltpu.roll(x, shift=(f_rows - r) % f_rows, axis=0)
        a = pltpu.roll(y, shift=(LANES - c) % LANES, axis=1)
        b = pltpu.roll(a, shift=f_rows - 1, axis=0)      # rows shifted by +1
        res = jnp.where(lane < LANES - c, a, b)
        out_ref[j] = res[:c_rows]


@partial(jax.jit, static_argnames=("cap",))
def gather_windows_pallas(
    src: jnp.ndarray,     # [P] int32, P % ALIGN == 0, padded via pad_for_gather
    starts: jnp.ndarray,  # [G] int32 window starts, 0 <= s <= P - cap - ALIGN
    cap: int,
) -> jnp.ndarray:
    """-> [G, cap] windows. G must be a multiple of ROWS, cap of ALIGN
    (1024 — the VMEM realign rotates whole 8-sublane tiles, see below)."""
    G = starts.shape[0]
    if G % ROWS:
        raise ValueError(f"G={G} must be a multiple of {ROWS}")
    if cap % ALIGN:
        # the VMEM realign rolls whole [f_rows, 128] tiles; tpu.dynamic_rotate
        # needs f_rows = (cap + ALIGN)/128 to be a multiple of 8 sublanes,
        # i.e. cap % 1024 == 0 (cap=256 compiled to a 10-row rotate and was
        # rejected by Mosaic as an unaligned shape)
        raise ValueError(f"cap={cap} must be a multiple of {ALIGN}")
    if src.shape[0] % ALIGN:
        raise ValueError("src must be padded to ALIGN (pad_for_gather)")
    fetch = cap + ALIGN
    src2d = src.reshape(-1, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G // ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (ROWS, cap // LANES, LANES),
            lambda i, starts: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, fetch // LANES, LANES), src.dtype),
            pltpu.SemaphoreType.DMA((2, ROWS)),
        ],
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((G, cap // LANES, LANES), src.dtype),
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(starts, src2d)
    return out.reshape(G, cap)
