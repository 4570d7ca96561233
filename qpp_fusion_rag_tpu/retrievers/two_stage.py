"""Two-stage retrieval: first-stage candidates -> neural rerank on device.

Covers the reference's BM25→TCT-ColBERT (reference src/retrievers/
bm25_tct.py:35-183: BM25 top-100 → lazy doc-text load → TCT text scorer)
and BM25→MonoT5/cross-encoder (bm25_monot5.py:37-192) shapes with two
reranker backends:

  * CrossEncoderReranker — joint (query, doc) scoring via the
    classification head,
  * DenseReranker — embed query + candidate docs, dot-product rescoring
    (the TCT `text_scorer` shape).

Doc texts come from any mapping docno -> text (dict or LazyCorpus — the
byte-offset on-demand loader, data/loaders.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Sequence

import numpy as np

from qpp_fusion_rag_tpu.config import config
from qpp_fusion_rag_tpu.retrievers.base import BaseRetriever, RetrieverResult


class DenseReranker:
    """Rescore candidates with embedding dot products (TCT-style)."""

    def __init__(self, encoder):
        self.encoder = encoder  # DenseEncoder (with tokenizer)

    def score(self, query: str, doc_texts: Sequence[str]) -> np.ndarray:
        q = self.encoder([query])[0]
        d = self.encoder(list(doc_texts))
        return d @ q


class CrossEncoderReranker:
    """Rescore candidates with joint (query, doc) classification scores."""

    def __init__(self, scorer, batch_size: Optional[int] = None):
        self.scorer = scorer    # CrossEncoderScorer (with tokenizer)
        self.batch_size = batch_size or int(config.processing.batch_sizes.rerank)

    def score(self, query: str, doc_texts: Sequence[str]) -> np.ndarray:
        out = []
        for i in range(0, len(doc_texts), self.batch_size):
            pairs = [(query, d) for d in doc_texts[i : i + self.batch_size]]
            out.append(self.scorer.score_pairs(pairs))
        return np.concatenate(out) if out else np.zeros(0, np.float32)


class TwoStageRetriever(BaseRetriever):
    name = "two_stage"

    def __init__(
        self,
        first_stage: BaseRetriever,
        reranker,
        corpus: Mapping[str, str],
        first_stage_k: Optional[int] = None,
        name: Optional[str] = None,
    ):
        self.first_stage = first_stage
        self.reranker = reranker
        self.corpus = corpus
        self.first_stage_k = first_stage_k or int(config.processing.retrieval.first_stage_k)
        if name:
            self.name = name

    def _doc_text(self, docno: str) -> str:
        from qpp_fusion_rag_tpu.data.loaders import doc_text

        return doc_text(self.corpus, docno)

    def retrieve(self, query: str, qid: str, top_k: int = 100) -> RetrieverResult:
        def run():
            first = self.first_stage.retrieve(query, qid, top_k=self.first_stage_k)
            docnos = [d for d, _s, _r in first.results]
            if not docnos:
                return []
            texts = [self._doc_text(d) for d in docnos]
            scores = self.reranker.score(query, texts)
            order = np.argsort(-scores)[:top_k]
            return [
                (docnos[int(i)], float(scores[int(i)]), rank + 1)
                for rank, i in enumerate(order)
            ]

        results, ms = self._timed(run)
        return RetrieverResult(qid, results, latency_ms=ms)

    def retrieve_batch(self, queries: Dict[str, str], top_k: int = 100,
                       **kw) -> Dict[str, RetrieverResult]:
        # first stage batches on device; rerank loops queries (each rerank
        # call is itself a batched device scoring of first_stage_k docs)
        firsts = self.first_stage.retrieve_batch(queries, top_k=self.first_stage_k)
        out: Dict[str, RetrieverResult] = {}
        for qid, text in queries.items():
            first = firsts[qid]
            docnos = [d for d, _s, _r in first.results]
            if not docnos:
                out[qid] = RetrieverResult(qid, [], latency_ms=first.latency_ms)
                continue
            texts = [self._doc_text(d) for d in docnos]
            (scores,), ms = self._timed(lambda t=texts, q=text: (self.reranker.score(q, t),))
            order = np.argsort(-scores)[:top_k]
            results = [
                (docnos[int(i)], float(scores[int(i)]), rank + 1)
                for rank, i in enumerate(order)
            ]
            out[qid] = RetrieverResult(qid, results, latency_ms=first.latency_ms + ms)
        return out
