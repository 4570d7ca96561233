"""Index layer: native sparse builder bindings + index formats."""

from qpp_fusion_rag_tpu.index.native import NativeIndexBuilder
from qpp_fusion_rag_tpu.index.sparse import SparseIndex

__all__ = ["NativeIndexBuilder", "SparseIndex"]
