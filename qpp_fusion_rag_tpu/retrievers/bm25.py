"""BM25 retriever over the native sparse index + device scoring kernel.

Replaces the reference's PyTerrier/Terrier BM25 (reference
src/retrievers/bm25.py:29-134: BatchRetrieve with BEIR params k1=0.9 b=0.4,
alnum-only query sanitization, grouped batch). Query sanitization here is
the native tokenizer's alnum split; scoring runs batched on device.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

from qpp_fusion_rag_tpu.config import config
from qpp_fusion_rag_tpu.index.sparse import SparseIndex
from qpp_fusion_rag_tpu.retrievers.base import BaseRetriever, RetrieverResult, rows_to_results


class BM25Retriever(BaseRetriever):
    name = "bm25"

    def __init__(self, index: SparseIndex, p_cap: Optional[int] = None,
                 engine: str = "exact", presorted: bool = False,
                 candidates: int = 2048):
        # engine: "exact" | "q8" (throughput) | "q8r" (rank-safe rescore)
        # — SparseIndex.search semantics; presorted reads the dual
        # doc-ordered layout (q8/q8r only, fewer bitonic sort stages);
        # candidates = the q8r rescore pool (pipeline.autotune picks
        # p_cap/candidates for a recall target)
        self.index = index
        self.p_cap = p_cap
        self.engine = engine
        self.presorted = presorted
        self.candidates = candidates

    @classmethod
    def from_corpus(cls, corpus: Iterable[Tuple[str, str]], **kw) -> "BM25Retriever":
        return cls(SparseIndex.build_bm25(corpus), **kw)

    @classmethod
    def from_index_dir(cls, path, **kw) -> "BM25Retriever":
        return cls(SparseIndex.load(path), **kw)

    @classmethod
    def from_terrier(cls, path, k1: float = 1.2, b: float = 0.75,
                     **kw) -> "BM25Retriever":
        """Serve an existing on-disk Terrier index (the reference's
        PyTerrier build, reference scripts/01_index.py:36-72) through the
        standard retriever API with EXACT Terrier scoring — the import
        installs the verified Terrier query model as the index's query
        encoder, so every engine (exact/q8/q8r/certified) and the
        autotuner score Terrier-identically (index/terrier.py)."""
        from qpp_fusion_rag_tpu.index.terrier import TerrierIndex

        return cls(TerrierIndex.load(path).to_sparse_index(k1=k1, b=b),
                   **kw)

    def retrieve(self, query: str, qid: str, top_k: int = 100) -> RetrieverResult:
        out, ms = self._timed(lambda: self.index.search(
            [query], k=top_k, p_cap=self.p_cap, engine=self.engine,
            presorted=self.presorted, candidates=self.candidates))
        scores, rows = out
        results = rows_to_results(scores[0], rows[0], self.index.docno)
        return RetrieverResult(qid, results, latency_ms=ms)

    def retrieve_batch(
        self, queries: Dict[str, str], top_k: int = 100, batch_size: Optional[int] = None
    ) -> Dict[str, RetrieverResult]:
        batch_size = batch_size or int(config.processing.batch_sizes.retrieval)
        return self._batched_retrieve(
            queries, batch_size,
            lambda texts: self.index.search(texts, k=top_k,
                                            p_cap=self.p_cap,
                                            engine=self.engine,
                                            presorted=self.presorted,
                                            candidates=self.candidates),
            self.index.docno,
        )
