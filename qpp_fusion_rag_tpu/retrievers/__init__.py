"""Retriever registry (reference src/retrievers/__init__.py:28-43).

Registry entries construct lazily from an index directory so the CLI can
select retrievers by name. Dense/two-stage retrievers register here as they
land; the reference set is bm25 / bge / splade / tct_colbert / bm25_tct /
bm25_monot5.
"""

from __future__ import annotations

from pathlib import Path

from qpp_fusion_rag_tpu.retrievers.base import (
    BaseRetriever,
    RetrieverResult,
    normalize_scores,
    write_results_trec,
)


def _bm25(index_dir, **kw):
    from qpp_fusion_rag_tpu.retrievers.bm25 import BM25Retriever

    return BM25Retriever.from_index_dir(index_dir, **kw)


def _dense(index_dir, **kw):
    from qpp_fusion_rag_tpu.retrievers.dense import DenseRetriever

    return DenseRetriever.from_index_dir(index_dir, **kw)


RETRIEVER_REGISTRY = {
    "bm25": _bm25,
    "bge": _dense,
    "tct_colbert": _dense,
}


def get_retriever(name: str, index_dir=None, **kw) -> BaseRetriever:
    if name not in RETRIEVER_REGISTRY:
        raise KeyError(f"Unknown retriever {name!r}; known: {sorted(RETRIEVER_REGISTRY)}")
    return RETRIEVER_REGISTRY[name](index_dir=index_dir, **kw)


__all__ = [
    "BaseRetriever", "RetrieverResult", "normalize_scores",
    "write_results_trec", "RETRIEVER_REGISTRY", "get_retriever",
]
