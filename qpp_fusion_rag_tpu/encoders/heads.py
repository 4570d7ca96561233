"""Task heads over the BERT core: dense, SPLADE-impact, cross-encoder.

Each head is a thin jitted wrapper holding (params, config, tokenizer?) and
exposing numpy-in/numpy-out encode/score APIs that retrievers consume.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qpp_fusion_rag_tpu.encoders import bert as B


def pad_sequences(seqs: Sequence[Sequence[int]], max_len: int, pad_id: int = 0,
                  bucket: bool = True):
    """Host-side padding of pre-tokenized id sequences -> (ids, mask) i32.

    With bucket=True the width rounds up to a power of two (capped at
    max_len), so the jitted BERT forward compiles for O(log max_len) shapes
    instead of once per distinct batch max length."""
    L = min(max((len(s) for s in seqs), default=1), max_len) or 1
    if bucket:
        b = 16
        while b < L:
            b *= 2
        L = min(b, max_len)
    ids = np.full((len(seqs), L), pad_id, dtype=np.int32)
    mask = np.zeros((len(seqs), L), dtype=np.int32)
    for i, s in enumerate(seqs):
        n = min(len(s), L)
        ids[i, :n] = s[:n]
        mask[i, :n] = 1
    return ids, mask


class DenseEncoder:
    """texts/ids -> [B, H] embeddings (CLS or mean pooling, optional L2).

    BGE = pooling="cls", normalize=True (reference bge.py:160-170);
    TCT-ColBERT = pooling="mean" (tct_colbert.py:104-151).
    """

    def __init__(self, params, cfg: B.BertConfig, pooling: str = "cls",
                 normalize: bool = True, tokenizer: Optional[Callable] = None,
                 max_len: int = 256, compute_dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.pooling = pooling
        self.normalize = normalize
        self.tokenizer = tokenizer
        self.max_len = max_len
        if pooling not in ("cls", "mean"):
            raise ValueError(f"unknown pooling {pooling!r} (use 'cls' or 'mean')")
        pool = B.pool_cls if pooling == "cls" else B.pool_mean

        @jax.jit
        def _encode(params, ids, mask):
            hidden = B.bert_encode(params, cfg, ids, mask, compute_dtype=compute_dtype)
            out = pool(hidden, mask)
            return B.l2_normalize(out) if normalize else out

        self._encode = _encode

    def encode_ids(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        return np.asarray(self._encode(self.params, jnp.asarray(ids), jnp.asarray(mask)))

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        if self.tokenizer is None:
            raise RuntimeError("DenseEncoder needs a tokenizer for text input")
        seqs = [self.tokenizer(t) for t in texts]
        ids, mask = pad_sequences(seqs, self.max_len, self.cfg.pad_token_id)
        return self.encode_ids(ids, mask)


class SpladeEncoder:
    """texts/ids -> sparse impact vectors: max_L log(1 + relu(MLM logits)).

    The SPLADE formulation behind the reference's LuceneImpactSearcher
    (reference splade.py:25-80); `top_impacts` yields (term_id, weight)
    pairs for index construction / query scoring.
    """

    def __init__(self, params, cfg: B.BertConfig, tokenizer: Optional[Callable] = None,
                 max_len: int = 256, compute_dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_len = max_len

        @jax.jit
        def _impacts(params, ids, mask):
            hidden = B.bert_encode(params, cfg, ids, mask, compute_dtype=compute_dtype)
            logits = B.mlm_logits(params, cfg, hidden, compute_dtype=compute_dtype)
            acts = jnp.log1p(jax.nn.relu(logits))            # [B, L, V]
            acts = jnp.where(mask[..., None] > 0, acts, 0.0)
            return jnp.max(acts, axis=1)                     # [B, V]

        self._impacts = _impacts

    def impacts_ids(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        return np.asarray(self._impacts(self.params, jnp.asarray(ids), jnp.asarray(mask)))

    def top_impacts(self, ids: np.ndarray, mask: np.ndarray, k: int = 256):
        """-> per row: (term_ids [k], weights [k]) strongest activations."""
        v = self.impacts_ids(ids, mask)
        top = np.argsort(-v, axis=1)[:, :k]
        w = np.take_along_axis(v, top, axis=1)
        return top.astype(np.int32), w.astype(np.float32)


class CrossEncoderScorer:
    """(query, doc) pairs -> relevance score (reranker head).

    The reference's ms-marco-MiniLM CrossEncoder (bm25_monot5.py:64-109);
    input is the standard [CLS] q [SEP] d [SEP] pair encoding.
    """

    def __init__(self, params, cfg: B.BertConfig, tokenizer: Optional[Callable] = None,
                 max_len: int = 256, compute_dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_len = max_len

        @jax.jit
        def _score(params, ids, mask, type_ids):
            hidden = B.bert_encode(params, cfg, ids, mask, token_type_ids=type_ids,
                                   compute_dtype=compute_dtype)
            return B.classifier_logits(params, hidden, compute_dtype=compute_dtype)[:, 0]

        self._score = _score

    def score_ids(self, ids: np.ndarray, mask: np.ndarray,
                  type_ids: Optional[np.ndarray] = None) -> np.ndarray:
        if type_ids is None:
            type_ids = np.zeros_like(ids)
        return np.asarray(self._score(
            self.params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(type_ids)
        ))

    @staticmethod
    def _strip_specials(ids, cls_id: int, sep_id: int):
        """Remove the [CLS]/[SEP] a HF tokenizer adds to a single sequence —
        score_pairs wraps the pair itself, and double specials plus shifted
        token_type_ids silently corrupt every rerank score."""
        ids = list(ids)
        if ids and ids[0] == cls_id:
            ids = ids[1:]
        if ids and ids[-1] == sep_id:
            ids = ids[:-1]
        return ids

    def score_pairs(self, pairs: Sequence[Tuple[str, str]],
                    cls_id: Optional[int] = None,
                    sep_id: Optional[int] = None) -> np.ndarray:
        if self.tokenizer is None:
            raise RuntimeError("CrossEncoderScorer needs a tokenizer for text input")
        seqs, types = [], []
        for q, d in pairs:
            if cls_id is None:
                cls_id = getattr(self.tokenizer, "cls_id", 101)
            if sep_id is None:
                sep_id = getattr(self.tokenizer, "sep_id", 102)
            qi = self._strip_specials(self.tokenizer(q), cls_id, sep_id)
            di = self._strip_specials(self.tokenizer(d), cls_id, sep_id)
            qi = qi[: self.max_len // 2 - 2]
            di = di[: self.max_len - len(qi) - 3]
            seq = [cls_id] + qi + [sep_id] + di + [sep_id]
            seqs.append(seq)
            types.append([0] * (len(qi) + 2) + [1] * (len(di) + 1))
        ids, mask = pad_sequences(seqs, self.max_len, self.cfg.pad_token_id)
        type_ids = np.zeros_like(ids)
        for i, t in enumerate(types):
            n = min(len(t), ids.shape[1])
            type_ids[i, :n] = t[:n]
        return self.score_ids(ids, mask, type_ids)
