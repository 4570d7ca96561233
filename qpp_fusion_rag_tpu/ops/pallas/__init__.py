"""Pallas TPU kernels.

  dense_topk      — fused matmul + packed group-max (the flagship scoring
                    kernel; lane index in score mantissa low bits)
  streaming_topk  — manual double-buffered DMA variant (slower on v5e;
                    kept as the DMA-pattern reference, see
                    docs/KERNEL_NOTES.md)
"""

from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
    GROUP,
    group_max_packed,
    group_max_scores,
    pallas_dense_topk,
    pallas_multi_view_topk,
    unpack_lane,
)
from qpp_fusion_rag_tpu.ops.pallas.streaming_topk import streaming_dense_topk

__all__ = [
    "GROUP", "group_max_packed", "group_max_scores",
    "pallas_dense_topk", "pallas_multi_view_topk", "unpack_lane",
    "streaming_dense_topk",
]
