"""qpp_fusion_rag_tpu — a TPU-native QPP-guided multi-retriever fusion framework.

A from-scratch re-architecture of the capabilities of PoisedDok/QPP-Fusion-RAG
(reference: /root/reference) for TPU hardware:

- Retrieval (dense brute-force, sparse impact, two-stage rerank) runs as
  mesh-sharded JAX matmul/top-k programs (reference: FAISS/hnswlib/Lucene,
  src/retrievers/*).
- The 13 query-performance-prediction statistics run as one fused, vmapped
  reduction over retrieved-score tensors (reference: JVM subprocess
  src/qpp/java/qpp/QPPBridge.java).
- All 9+ fusion strategies run as a single vectorized segmented-aggregation
  kernel over padded run-list tensors (reference: ranx + per-query dict loops,
  src/fusion.py).
- IR metrics (nDCG/RR/R/P/AP) are vectorized device kernels (reference:
  ir_measures, src/evaluation/ir_evaluator.py).
- Learned fusion = native GBDT (histogram trainer + JAX node-array inference)
  and a pure-JAX MLP (reference: LightGBM / torch, src/models/*).

Data flows through `RunTensor` (scores[R, Q, K] / doc_ids[R, Q, K]) instead of
TREC files; TREC files remain an import/export format for interop.
"""

__version__ = "0.1.0"

from qpp_fusion_rag_tpu.config import config, Config  # noqa: F401
