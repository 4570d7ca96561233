"""SPLADE learned-sparse retriever: encoder impacts -> CSR -> device scoring.

Replaces the reference's Pyserini LuceneImpactSearcher over a pre-built
impact index (reference src/retrievers/splade.py:25-80, :96-123). Here the
corpus side runs the SPLADE encoder (JAX) and assembles impact-ordered CSR
postings over the wordpiece-vocabulary term space directly in numpy; query
impacts come from the same encoder and score through the shared
sparse_score_topk kernel.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from qpp_fusion_rag_tpu.config import config
from qpp_fusion_rag_tpu.index.engines import PackedEngineMixin
from qpp_fusion_rag_tpu.retrievers.base import BaseRetriever, RetrieverResult, rows_to_results


class SpladeIndex(PackedEngineMixin):
    """CSR impact lists over the encoder's term (wordpiece) space."""

    def __init__(self, offsets, docs, weights, docnos: List[str], vocab_size: int):
        # offsets stay int64: past ~2.15B postings an int32 cast would
        # silently wrap and corrupt every posting window (ADVICE r1).
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.docs = np.asarray(docs, dtype=np.int32)
        self.weights = np.asarray(weights, dtype=np.float32)
        self.docnos = list(docnos)
        self.vocab_size = int(vocab_size)
        self._device = None

    @property
    def num_docs(self) -> int:
        return len(self.docnos)

    @property
    def max_df(self) -> int:
        d = np.diff(self.offsets)
        return int(d.max()) if len(d) else 0

    @classmethod
    def from_impacts(
        cls,
        term_ids: np.ndarray,   # [N, k] int32 per-doc top impact terms
        weights: np.ndarray,    # [N, k] f32 impacts (0 = unused slot)
        docnos: List[str],
        vocab_size: int,
    ) -> "SpladeIndex":
        """Assemble impact-ordered CSR from per-doc encoder outputs."""
        N, k = term_ids.shape
        docs = np.repeat(np.arange(N, dtype=np.int32), k)
        terms = term_ids.reshape(-1).astype(np.int64)
        w = weights.reshape(-1).astype(np.float32)
        keep = w > 0
        docs, terms, w = docs[keep], terms[keep], w[keep]
        # sort by (term asc, weight desc) -> impact-ordered runs per term
        order = np.lexsort((-w, terms))
        docs, terms, w = docs[order], terms[order], w[order]
        counts = np.bincount(terms, minlength=vocab_size)
        offsets = np.zeros(vocab_size + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return cls(offsets, docs, w, docnos, vocab_size)

    def save(self, path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path / "splade.npz",
            offsets=self.offsets, docs=self.docs, weights=self.weights,
            vocab_size=np.int64(self.vocab_size),
        )
        (path / "docnos.txt").write_text("\n".join(self.docnos) + "\n")

    @classmethod
    def load(cls, path) -> "SpladeIndex":
        path = Path(path)
        a = np.load(path / "splade.npz")
        return cls(a["offsets"], a["docs"], a["weights"],
                   (path / "docnos.txt").read_text().splitlines(),
                   int(a["vocab_size"]))

    def _device_arrays(self):
        import jax.numpy as jnp

        if self._device is None:
            if len(self.offsets) and int(self.offsets[-1]) >= 2**31:
                raise ValueError(
                    f"{int(self.offsets[-1])} postings exceed the int32 "
                    "device-index range; shard the corpus before indexing"
                )
            self._device = (
                jnp.asarray(self.docs),
                jnp.asarray(self.weights),
                jnp.asarray(self.offsets.astype(np.int32)),
            )
        return self._device

    def _packed_source(self):
        """PackedEngineMixin provider (weights are stored f32)."""
        return self.docs, self.weights, self.offsets, None

    def _doc_vector_terms(self) -> int:
        return self.vocab_size

    def search_impacts(
        self,
        q_terms: np.ndarray,     # [B, Tq] int32 (-1 pad)
        q_weights: np.ndarray,   # [B, Tq] f32
        k: int = 100,
        p_cap: Optional[int] = None,
        exact_topk: bool = True,
        engine: str = "exact",
        candidates: int = 2048,
        presorted: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """engine: "exact" (Lucene-parity pair-sort), "q8" (quantized
        single-key sort serving kernel), or "q8r" (rank-safe: q8 pool +
        exact doc-vector rescore) — the same engines as
        index.sparse.SparseIndex.search; presorted (q8/q8r) reads the
        dual doc-ordered layout built at this p_cap."""
        from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk

        q_terms = q_terms.astype(np.int32)
        q_weights = q_weights.astype(np.float32)
        p_cap = max(min(p_cap or min(self.max_df, 8192), self.max_df), 1)
        if presorted and engine not in ("q8", "q8r"):
            raise ValueError("presorted layout needs engine 'q8' or 'q8r'")
        if engine in ("q8", "q8r"):
            return self._engine_topk(
                q_terms, q_weights, k=k, p_cap=p_cap, engine=engine,
                candidates=candidates, presorted=presorted,
                exact_topk=exact_topk)
        if engine != "exact":
            raise ValueError(f"unknown engine {engine!r}")
        flat_docs, flat_weights, offsets = self._device_arrays()
        scores, ids = sparse_score_topk(
            flat_docs, flat_weights, offsets,
            q_terms, q_weights,
            k=k, p_cap=p_cap, exact_topk=exact_topk,
        )
        return np.asarray(scores), np.asarray(ids)


class SpladeRetriever(BaseRetriever):
    name = "splade"

    def __init__(self, index: SpladeIndex, encoder=None,
                 query_top_terms: Optional[int] = None, p_cap: Optional[int] = None,
                 engine: str = "exact", presorted: bool = False,
                 candidates: int = 2048):
        # engine/presorted: SpladeIndex.search_impacts semantics (exact
        # pair-sort | q8 throughput | q8r rank-safe rescore); candidates
        # = the q8r rescore pool
        self.index = index
        self.encoder = encoder          # SpladeEncoder (with tokenizer) or None
        self.query_top_terms = query_top_terms or int(config.tpu.sparse.max_query_terms)
        self.p_cap = p_cap
        self.engine = engine
        self.presorted = presorted
        self.candidates = candidates

    @classmethod
    def build(cls, encoder, corpus: Sequence[Tuple[str, str]],
              doc_top_terms: int = 256, batch_size: Optional[int] = None,
              **kw) -> "SpladeRetriever":
        """Encode the corpus and assemble the impact index."""
        from qpp_fusion_rag_tpu.encoders.heads import pad_sequences

        batch_size = batch_size or int(config.processing.batch_sizes.encoding)
        docnos = [d for d, _ in corpus]
        texts = [t for _, t in corpus]
        all_ids, all_w = [], []
        for i in range(0, len(texts), batch_size):
            chunk = texts[i : i + batch_size]
            seqs = [encoder.tokenizer(t) for t in chunk]
            ids, mask = pad_sequences(seqs, encoder.max_len, encoder.cfg.pad_token_id)
            tid, tw = encoder.top_impacts(ids, mask, k=doc_top_terms)
            all_ids.append(tid)
            all_w.append(tw)
        index = SpladeIndex.from_impacts(
            np.concatenate(all_ids), np.concatenate(all_w),
            docnos, encoder.cfg.vocab_size,
        )
        return cls(index, encoder=encoder, **kw)

    def _encode_queries(self, texts: Sequence[str]):
        from qpp_fusion_rag_tpu.encoders.heads import pad_sequences

        if self.encoder is None:
            raise RuntimeError(
                "SpladeRetriever has no query encoder; pass encoder= or use "
                "index.search_impacts() with precomputed query impacts"
            )
        seqs = [self.encoder.tokenizer(t) for t in texts]
        ids, mask = pad_sequences(seqs, self.encoder.max_len,
                                        self.encoder.cfg.pad_token_id)
        tid, tw = self.encoder.top_impacts(ids, mask, k=self.query_top_terms)
        tid = np.where(tw > 0, tid, -1)
        return tid.astype(np.int32), tw

    def retrieve(self, query: str, qid: str, top_k: int = 100) -> RetrieverResult:
        def run():
            q_terms, q_weights = self._encode_queries([query])
            return self.index.search_impacts(
                q_terms, q_weights, k=top_k, p_cap=self.p_cap,
                engine=self.engine, presorted=self.presorted,
                candidates=self.candidates)

        (scores, rows), ms = self._timed(run)
        results = rows_to_results(scores[0], rows[0], self.index.docnos.__getitem__)
        return RetrieverResult(qid, results, latency_ms=ms)

    def retrieve_batch(self, queries: Dict[str, str], top_k: int = 100,
                       batch_size: Optional[int] = None) -> Dict[str, RetrieverResult]:
        batch_size = batch_size or int(config.processing.batch_sizes.retrieval)

        def search_chunk(texts):
            q_terms, q_weights = self._encode_queries(texts)
            return self.index.search_impacts(
                q_terms, q_weights, k=top_k, p_cap=self.p_cap,
                engine=self.engine, presorted=self.presorted,
                candidates=self.candidates)

        return self._batched_retrieve(
            queries, batch_size, search_chunk, self.index.docnos.__getitem__
        )
