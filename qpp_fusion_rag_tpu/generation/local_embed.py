"""On-device embedding transport for stage-08 semantic similarity.

The reference computes answer-vs-gold semantic similarity through LM
Studio's HTTP ``/v1/embeddings`` endpoint (reference
scripts/08_compute_qa_metrics.py:138-172); this module provides the same
``embed(texts) -> List[List[float]]`` interface backed by the repo's own
JAX BERT forward (encoders/bert.py + encoders/heads.DenseEncoder), so
``pipeline.qa_metrics --semantic`` runs fully offline with the
embeddings computed on the accelerator — the "one JAX program" thesis
applied to the last HTTP-only stage.

Backends:
- ``LocalEmbeddingOperation.from_pretrained(path)`` — a real BERT-family
  checkpoint directory (weights + tokenizer), CLS or mean pooled,
  L2-normalized.
- ``LocalEmbeddingOperation.from_random(...)`` — random-init encoder
  with a trivial hash tokenizer. Deterministic and interface-complete
  but semantically meaningless: for pipeline tests and offline smoke
  runs in environments without checkpoints (this one — see
  scripts_dev/fetch_weights.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class LocalEmbeddingOperation:
    """EmbeddingOperation-compatible transport over a local DenseEncoder."""

    def __init__(self, encoder, batch_size: int = 32):
        self.encoder = encoder
        self.batch_size = batch_size

    @classmethod
    def from_pretrained(cls, model_name_or_path: str,
                        pooling: str = "cls", max_len: int = 256,
                        batch_size: int = 32) -> "LocalEmbeddingOperation":
        from qpp_fusion_rag_tpu.encoders.bert import (
            load_hf_bert, load_tokenizer)
        from qpp_fusion_rag_tpu.encoders.heads import DenseEncoder

        params, cfg = load_hf_bert(model_name_or_path)
        tok = load_tokenizer(model_name_or_path, max_length=max_len)
        enc = DenseEncoder(params, cfg, pooling=pooling, normalize=True,
                           tokenizer=tok, max_len=max_len)
        return cls(enc, batch_size=batch_size)

    @classmethod
    def from_random(cls, seed: int = 0, hidden: int = 64, layers: int = 2,
                    vocab: int = 4096, max_len: int = 64,
                    batch_size: int = 32) -> "LocalEmbeddingOperation":
        import jax

        from qpp_fusion_rag_tpu.encoders.bert import (
            BertConfig, init_bert_params)
        from qpp_fusion_rag_tpu.encoders.heads import DenseEncoder

        cfg = BertConfig(
            vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
            num_attention_heads=max(1, hidden // 16),
            intermediate_size=2 * hidden, max_position_embeddings=max_len)
        params = init_bert_params(jax.random.PRNGKey(seed), cfg)

        def hash_tokenizer(text: str) -> List[int]:
            # [CLS]=1-analog then stable per-word buckets; never 0 (pad)
            toks = [2]
            for wtok in text.lower().split()[: max_len - 1]:
                toks.append(3 + (hash(wtok) & 0x7FFFFFFF) % (vocab - 3))
            return toks

        enc = DenseEncoder(params, cfg, pooling="mean", normalize=True,
                           tokenizer=hash_tokenizer, max_len=max_len)
        return cls(enc, batch_size=batch_size)

    def embed(self, texts: Sequence[str]) -> List[List[float]]:
        out: List[List[float]] = []
        texts = list(texts)
        for i in range(0, len(texts), self.batch_size):
            vecs = self.encoder(texts[i:i + self.batch_size])
            out.extend(np.asarray(vecs, np.float32).tolist())
        return out


def make_embedding_op(backend: str = "http",
                      model: Optional[str] = None,
                      **kw):
    """Factory for stage 08: 'http' -> generation.client.EmbeddingOperation
    (reference transport), 'local' -> checkpoint-backed on-device encoder,
    'local-random' -> offline random-init encoder (tests/smoke only)."""
    if backend == "http":
        from qpp_fusion_rag_tpu.generation.client import EmbeddingOperation

        return EmbeddingOperation(model=model, **kw)
    if backend == "local":
        if not model:
            raise ValueError("backend='local' needs an embedding "
                             "checkpoint path (--embed-model)")
        return LocalEmbeddingOperation.from_pretrained(model, **kw)
    if backend == "local-random":
        return LocalEmbeddingOperation.from_random(**kw)
    raise ValueError(f"unknown embedding backend {backend!r}")
