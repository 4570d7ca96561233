"""Pallas TPU kernels.

  dense_topk      — fused matmul + packed group-max (the flagship scoring
                    kernel; lane index in score mantissa low bits)
  bitonic         — VMEM-resident bitonic row sort + fused integer
                    segmented run-sum (the q8 sparse scorers' sort;
                    start_block skips rounds for the presorted layout)
  window_gather   — async-DMA posting-window gather (32 concurrent
                    aligned fetches per grid step, realigned in VMEM)
  streaming_topk  — manual double-buffered DMA variant (slower on v5e;
                    kept as the DMA-pattern reference, see
                    docs/KERNEL_NOTES.md)
"""

from qpp_fusion_rag_tpu.ops.pallas.bitonic import (
    bitonic_segsum_rows,
    bitonic_sort_rows,
)
from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
    GROUP,
    group_max_packed,
    group_max_scores,
    pallas_dense_topk,
    pallas_multi_view_topk,
    unpack_lane,
)
from qpp_fusion_rag_tpu.ops.pallas.streaming_topk import streaming_dense_topk
from qpp_fusion_rag_tpu.ops.pallas.window_gather import (
    gather_windows_pallas,
    pad_for_gather,
)

__all__ = [
    "GROUP", "group_max_packed", "group_max_scores",
    "pallas_dense_topk", "pallas_multi_view_topk", "unpack_lane",
    "streaming_dense_topk",
    "bitonic_segsum_rows", "bitonic_sort_rows",
    "gather_windows_pallas", "pad_for_gather",
]
