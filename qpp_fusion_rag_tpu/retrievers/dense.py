"""Dense retriever: brute-force device top-k over an embedding matrix.

Replaces the reference's BGE / TCT-ColBERT retrievers (reference
src/retrievers/bge.py:122-362 — FAISS flat or segmented-HNSW search over
Pyserini-prebuilt embeddings; src/retrievers/tct_colbert.py:33-208 —
self-encoded corpus + FAISS IndexFlatIP). Here the corpus matrix lives on
device (bf16) and search is the streaming matmul top-k (ops.dense); on a
mesh the corpus shards over chips (parallel.sharded).

Index directory layout: embeddings.npy [N, D] + docnos.txt. The query
encoder is pluggable: any callable texts -> [B, D]; precomputed query
embeddings are also accepted directly.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from qpp_fusion_rag_tpu.config import config
from qpp_fusion_rag_tpu.retrievers.base import BaseRetriever, RetrieverResult, rows_to_results


class DenseIndex:
    """Embedding matrix + docno mapping, device-resident for search.

    Rows are SHUFFLED (fixed seed) at construction by default: the
    group-max/approx top-k reductions keep one candidate per 128-doc block,
    so a corpus ordered by topic/source (near-duplicates adjacent) would
    collapse recall — measured 0.01 recall@100 on an adjacency-clustered
    corpus vs 0.70 shuffled. The docno list permutes consistently, so the
    row<->docno mapping stays transparent to every caller.
    """

    def __init__(self, embeddings: np.ndarray, docnos: List[str],
                 normalize: bool = False, shuffle: bool = True, seed: int = 0):
        emb = np.asarray(embeddings)
        docnos = list(docnos)
        if shuffle and len(docnos) > 1:
            perm = np.random.default_rng(seed).permutation(len(docnos))
            emb = emb[perm]
            docnos = [docnos[i] for i in perm]
        if normalize:
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            emb = emb / np.maximum(norms, 1e-12)
        self.embeddings = emb
        self.docnos = docnos
        self._device = None

    @property
    def num_docs(self) -> int:
        return len(self.docnos)

    @property
    def dim(self) -> int:
        return self.embeddings.shape[1]

    def save(self, path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.save(path / "embeddings.npy", self.embeddings)
        (path / "docnos.txt").write_text("\n".join(self.docnos) + "\n")

    @classmethod
    def load(cls, path) -> "DenseIndex":
        path = Path(path)
        return cls(
            np.load(path / "embeddings.npy"),
            (path / "docnos.txt").read_text().splitlines(),
            shuffle=False,  # saved indexes are already shuffled
        )

    def device_matrix(self):
        import jax.numpy as jnp

        if self._device is None:
            dtype = getattr(jnp, str(config.tpu.dense.corpus_dtype))
            self._device = jnp.asarray(self.embeddings, dtype=dtype)
        return self._device

    def _device_int8(self):
        """int8 production layout: quantized [D, N] for the MXU group-max
        kernel + [N, D] row copy for the rank-safe pool rescore (the
        ensemble's dense view layouts, pipeline.ensemble)."""
        import jax
        import jax.numpy as jnp

        if getattr(self, "_device_i8", None) is None:
            from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows

            emb = jnp.asarray(self.embeddings, jnp.float32)
            c_int, d_scale = jax.jit(
                lambda c: quantize_rows(jnp.transpose(c), axis=0))(emb)
            self._device_i8 = (c_int, d_scale.reshape(1, -1),
                               jnp.transpose(c_int))
        return self._device_i8

    def search(
        self,
        query_embeddings: np.ndarray,
        k: int = 100,
        exact: bool = False,
        mesh=None,
        engine: str = "stream",
        rescore_pool: int = 512,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (scores [B, k], row ids [B, k], -1 pad).

        engine: "stream" (default — chunked matmul at the configured
        corpus dtype, `exact=True` for full top-k), "int8" (the
        production MXU kernel: symmetric per-doc int8 + fused group-max,
        recall@100 0.968 vs f32 exact, docs/quality_int8.json), or
        "int8r" (RANK-SAFE: int8 kernel pools top-`rescore_pool`
        candidates, rescored at row precision — the ensemble's
        dense_view_rescored). int8 engines are single-device; pass
        mesh=None with them."""
        import jax.numpy as jnp

        from qpp_fusion_rag_tpu.ops.dense import dense_topk

        q = jnp.asarray(np.asarray(query_embeddings, dtype=np.float32))
        if engine in ("int8", "int8r"):
            if mesh is not None:
                raise ValueError("int8 engines are single-device; use the "
                                 "sharded ensemble for mesh execution")
            from qpp_fusion_rag_tpu.pipeline.ensemble import (
                dense_view_rescored,
                dense_view_topk,
            )

            c_int, d_scale, rows = self._device_int8()
            if engine == "int8r":
                vals, ids = dense_view_rescored(
                    q, c_int, d_scale, rows, k, max(rescore_pool, k))
            else:
                vals, ids = dense_view_topk(q, c_int, d_scale, k)
            return np.asarray(vals), np.asarray(ids)
        if engine != "stream":
            raise ValueError(f"unknown engine {engine!r}")
        chunk = min(int(config.tpu.dense.chunk_docs), self.num_docs)
        if mesh is not None:
            from qpp_fusion_rag_tpu.parallel.sharded import sharded_dense_topk

            vals, ids = sharded_dense_topk(
                q, self.device_matrix(), mesh, k=k, chunk=chunk, exact=exact
            )
        else:
            vals, ids = dense_topk(q, self.device_matrix(), k=k, chunk=chunk, exact=exact)
        return np.asarray(vals), np.asarray(ids)


class DenseRetriever(BaseRetriever):
    name = "dense"

    def __init__(
        self,
        index: DenseIndex,
        encoder: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
        mesh=None,
        exact: bool = False,
        engine: str = "stream",      # DenseIndex.search semantics
        rescore_pool: int = 512,     # int8r pool size
    ):
        self.index = index
        self.encoder = encoder
        self.mesh = mesh
        self.exact = exact
        self.engine = engine
        self.rescore_pool = rescore_pool

    @classmethod
    def from_index_dir(cls, index_dir, encoder=None, **kw) -> "DenseRetriever":
        return cls(DenseIndex.load(index_dir), encoder=encoder, **kw)

    # -- embedding-level API -------------------------------------------
    def search_embeddings(
        self, query_embeddings: np.ndarray, k: int = 100
    ) -> Tuple[np.ndarray, np.ndarray]:
        return self.index.search(query_embeddings, k=k, exact=self.exact,
                                 mesh=self.mesh, engine=self.engine,
                                 rescore_pool=self.rescore_pool)

    # -- text-level API ------------------------------------------------
    def _encode(self, texts: Sequence[str]) -> np.ndarray:
        if self.encoder is None:
            raise RuntimeError(
                "DenseRetriever has no query encoder; pass encoder= or use "
                "search_embeddings() with precomputed embeddings"
            )
        return np.asarray(self.encoder(list(texts)))

    def retrieve(self, query: str, qid: str, top_k: int = 100) -> RetrieverResult:
        out, ms = self._timed(lambda: self.search_embeddings(self._encode([query]), k=top_k))
        scores, rows = out
        results = rows_to_results(scores[0], rows[0], self.index.docnos.__getitem__)
        return RetrieverResult(qid, results, latency_ms=ms)

    def retrieve_batch(
        self, queries: Dict[str, str], top_k: int = 100, batch_size: Optional[int] = None
    ) -> Dict[str, RetrieverResult]:
        batch_size = batch_size or int(config.processing.batch_sizes.retrieval)
        return self._batched_retrieve(
            queries, batch_size,
            lambda texts: self.search_embeddings(self._encode(texts), k=top_k),
            self.index.docnos.__getitem__,
        )
