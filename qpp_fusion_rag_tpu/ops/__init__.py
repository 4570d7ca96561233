"""Device kernels (JAX/XLA + Pallas).

  dense    — streaming matmul top-k (exact / approx), multi-view variant
  sparse   — CSR impact-list scoring (windowed reads + segmented top-k)
  segment  — shared scatter-free segmented aggregation primitive
  fusion   — CombSUM/CombMNZ/RRF (+weighted) segmented-aggregation kernel
  qpp      — the 13 QPP statistics as one fused reduction
  metrics  — vectorized IR metrics (nDCG/RR/R/P/AP)
  trees    — GBDT ensembles as node-array gather traversal
  pallas/  — fused matmul+group-max kernels (packed lane encoding)
"""

from qpp_fusion_rag_tpu.ops.dense import dense_topk, merge_topk, multi_view_topk
from qpp_fusion_rag_tpu.ops.fusion import fuse, fuse_kernel
from qpp_fusion_rag_tpu.ops.metrics import (
    aggregate_measures,
    align_relevance,
    compute_measures,
)
from qpp_fusion_rag_tpu.ops.qpp import normalize_qpp, qpp_kernel, text_features_batch
from qpp_fusion_rag_tpu.ops.segment import segmented_topk
from qpp_fusion_rag_tpu.ops.sparse import sparse_rescore_topk, sparse_score_topk
from qpp_fusion_rag_tpu.ops.trees import TreeEnsemble, predict_ensemble, stack_trees

__all__ = [
    "dense_topk", "multi_view_topk", "merge_topk",
    "fuse", "fuse_kernel",
    "align_relevance", "compute_measures", "aggregate_measures",
    "qpp_kernel", "normalize_qpp", "text_features_batch",
    "segmented_topk", "sparse_score_topk", "sparse_rescore_topk",
    "TreeEnsemble", "predict_ensemble", "stack_trees",
]
