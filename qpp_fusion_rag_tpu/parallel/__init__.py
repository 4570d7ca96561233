"""Device meshes + corpus-parallel retrieval."""

from qpp_fusion_rag_tpu.parallel.mesh import (
    CORPUS_AXIS,
    DATA_AXIS,
    build_mesh,
    batch_sharding,
    corpus_sharding,
)
from qpp_fusion_rag_tpu.parallel.multihost import (
    host_local_corpus_slice,
    init_distributed,
)
from qpp_fusion_rag_tpu.parallel.sharded import (
    sharded_dense_topk,
    sharded_multi_view_topk,
)

__all__ = [
    "DATA_AXIS", "CORPUS_AXIS", "build_mesh",
    "batch_sharding", "corpus_sharding",
    "init_distributed", "host_local_corpus_slice",
    "sharded_dense_topk", "sharded_multi_view_topk",
]
