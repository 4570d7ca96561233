"""Shared sparse production-engine dispatch for CSR impact indexes.

SparseIndex (BM25, index/sparse.py) and SpladeIndex (learned impacts,
retrievers/splade.py) expose the same three scoring engines — "exact"
pair-sort, "q8" quantized single-key sort, "q8r" rank-safe rescore —
over the same device layouts (packed postings, optional presorted dual
layout, doc-major vectors). This mixin holds the ONE implementation of
the device-array caching and the engine dispatch, so a fix to e.g. the
candidates clamp or the int32-offset overflow guard can never apply to
only one of the two index families.

Host classes provide:
  _packed_source() -> (docs i32 [P], weights f32 [P], offsets int64
      [T+1], scales f32 [T] | None)  — dequantized CSR postings plus an
      optional fixed quantization grid;
  num_docs, and _doc_vector_terms() -> int (term-id space size for
      doc_vector_imp_bits).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class PackedEngineMixin:
    def _packed_source(self):
        raise NotImplementedError

    def _doc_vector_terms(self) -> int:
        raise NotImplementedError

    def _device_packed(self, presorted_cap: int = 0):
        """(packed, offsets_i32, term_scales) device arrays for the
        q8/q8r engines; presorted_cap > 0 builds the dual doc-ordered
        layout at that cap (ops.sparse.pack_postings_presorted). Cached
        per layout (plain = key 0)."""
        import jax.numpy as jnp

        from qpp_fusion_rag_tpu.ops.sparse import (
            pack_postings,
            pack_postings_presorted,
        )

        cache = getattr(self, "_engine_cache", None)
        if cache is None:
            cache = self._engine_cache = {}
        if presorted_cap not in cache:
            docs, weights, offsets, scales = self._packed_source()
            if presorted_cap > 0:
                packed, off2, sc = pack_postings_presorted(
                    docs, weights, offsets, cap=presorted_cap, scales=scales)
                if int(off2[-1]) >= 2**31:
                    raise OverflowError(
                        "presorted dual layout exceeds the int32 device-"
                        "index range; shard the corpus")
                offs = jnp.asarray(off2.astype(np.int32))
            else:
                packed, sc = pack_postings(docs, weights, offsets,
                                           scales=scales)
                if int(offsets[-1]) >= 2**31:
                    raise OverflowError(
                        "postings exceed the int32 device-index range; "
                        "shard the corpus")
                offs = jnp.asarray(offsets.astype(np.int32))
            cache[presorted_cap] = (jnp.asarray(packed), offs,
                                    jnp.asarray(sc))
        return cache[presorted_cap]

    def _device_doc_vectors(self):
        """Packed doc-major vectors + per-doc scales for the rank-safe
        rescore (ops.sparse.pack_doc_vectors; impact precision auto-sized
        to the term space via doc_vector_imp_bits)."""
        import jax.numpy as jnp

        from qpp_fusion_rag_tpu.ops.sparse import (
            doc_vector_imp_bits,
            pack_doc_vectors,
        )

        if getattr(self, "_device_docvec", None) is None:
            docs, weights, offsets, _ = self._packed_source()
            bits = doc_vector_imp_bits(self._doc_vector_terms())
            dp, ds, _ = pack_doc_vectors(
                offsets, docs, weights, self.num_docs, imp_bits=bits)
            self._device_docvec = (jnp.asarray(dp), jnp.asarray(ds), bits)
        return self._device_docvec

    def _device_doc_vectors_exact(self):
        """Unquantized doc-major vectors (term ids + raw f32 weights) for
        the certified engine's exact rescore path
        (ops.sparse.pack_doc_vectors_exact): the per-candidate rescore
        epsilon collapses from the imp_bits quantization step to the
        f32 tie band, certifying every query whose k/k+1 gap is real.
        2x the packed layout's HBM; built lazily, certified-only."""
        import jax.numpy as jnp

        from qpp_fusion_rag_tpu.ops.sparse import pack_doc_vectors_exact

        if getattr(self, "_device_docvec_exact", None) is None:
            docs, weights, offsets, scales = self._packed_source()
            dt, dw, _ = pack_doc_vectors_exact(
                offsets, docs, weights, self.num_docs)
            self._device_docvec_exact = (jnp.asarray(dt), jnp.asarray(dw))
        return self._device_docvec_exact

    def _engine_topk(
        self,
        q_terms: np.ndarray,
        q_weights: np.ndarray,
        k: int,
        p_cap: int,
        engine: str,
        candidates: int = 2048,
        presorted: bool = False,
        exact_topk: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """q8/q8r dispatch shared by SparseIndex.search and
        SpladeIndex.search_impacts. `engine` must be "q8" or "q8r"
        (callers handle "exact" with their own pair-sort path)."""
        from qpp_fusion_rag_tpu.ops.sparse import (
            sparse_score_topk_q8,
            sparse_score_topk_q8_rescored,
        )

        packed, offs, pscales = self._device_packed(p_cap if presorted else 0)
        if engine == "q8r":
            dp, ds, bits = self._device_doc_vectors()
            scores, ids = sparse_score_topk_q8_rescored(
                packed, offs, pscales, dp, ds, q_terms, q_weights,
                k=k, p_cap=p_cap,
                candidates=min(max(candidates, k), max(self.num_docs, 1)),
                imp_bits=bits, presorted=presorted)
        elif engine == "q8":
            scores, ids = sparse_score_topk_q8(
                packed, offs, pscales, q_terms, q_weights,
                k=k, p_cap=p_cap, exact_topk=exact_topk,
                presorted=presorted)
        else:
            raise ValueError(f"unknown engine {engine!r}")
        return np.asarray(scores), np.asarray(ids)
