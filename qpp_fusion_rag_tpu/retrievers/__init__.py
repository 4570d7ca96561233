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


def _dense(index_dir, model_name=None, pooling="cls", **kw):
    from qpp_fusion_rag_tpu.retrievers.dense import DenseRetriever

    encoder = kw.pop("encoder", None)
    if encoder is None and model_name is not None:
        from qpp_fusion_rag_tpu.encoders import (
            DenseEncoder,
            load_hf_bert,
            load_tokenizer,
        )

        params, cfg = load_hf_bert(model_name)
        encoder = DenseEncoder(params, cfg, pooling=pooling,
                               normalize=(pooling == "cls"),
                               tokenizer=load_tokenizer(model_name))
    return DenseRetriever.from_index_dir(index_dir, encoder=encoder, **kw)


def _bge(index_dir, **kw):
    from qpp_fusion_rag_tpu.config import config

    kw.setdefault("model_name", config.models.bge.name)
    return _dense(index_dir, pooling="cls", **kw)


def _tct(index_dir, **kw):
    from qpp_fusion_rag_tpu.config import config

    kw.setdefault("model_name", config.models.tct_colbert.name)
    return _dense(index_dir, pooling="mean", **kw)


def _splade(index_dir, encoder=None, **kw):
    from qpp_fusion_rag_tpu.retrievers.splade import SpladeIndex, SpladeRetriever

    if encoder is None:
        from qpp_fusion_rag_tpu.config import config
        from qpp_fusion_rag_tpu.encoders import (
            SpladeEncoder,
            load_hf_bert,
            load_tokenizer,
        )

        name = config.models.splade.name
        params, cfg = load_hf_bert(name, with_mlm=True)
        encoder = SpladeEncoder(params, cfg, tokenizer=load_tokenizer(name))
    return SpladeRetriever(SpladeIndex.load(index_dir), encoder=encoder, **kw)


def _two_stage(index_dir, corpus=None, reranker=None, kind="cross", **kw):
    """BM25 first stage from `index_dir`/../bm25 + a neural reranker."""
    from qpp_fusion_rag_tpu.retrievers.two_stage import TwoStageRetriever

    first = _bm25(Path(index_dir).parent / "bm25")
    if corpus is None:
        raise ValueError("two-stage retrievers need corpus= (dict or LazyCorpus)")
    if reranker is None:
        from qpp_fusion_rag_tpu.config import config
        from qpp_fusion_rag_tpu.encoders import (
            CrossEncoderScorer,
            DenseEncoder,
            load_hf_bert,
        )
        from qpp_fusion_rag_tpu.retrievers.two_stage import (
            CrossEncoderReranker,
            DenseReranker,
        )

        from qpp_fusion_rag_tpu.encoders import load_tokenizer

        if kind == "cross":
            name = config.models.cross_encoder.name
            params, cfg = load_hf_bert(name, with_classifier=True)
            reranker = CrossEncoderReranker(
                CrossEncoderScorer(params, cfg, tokenizer=load_tokenizer(name))
            )
        else:
            name = config.models.tct_colbert.name
            params, cfg = load_hf_bert(name)
            reranker = DenseReranker(
                DenseEncoder(params, cfg, pooling="mean",
                             tokenizer=load_tokenizer(name))
            )
    return TwoStageRetriever(first, reranker, corpus, **kw)


RETRIEVER_REGISTRY = {
    "bm25": _bm25,
    "bge": _bge,
    "tct_colbert": _tct,
    "splade": _splade,
    "bm25_tct": lambda index_dir, **kw: _two_stage(index_dir, kind="dense", name="bm25_tct", **kw),
    "bm25_monot5": lambda index_dir, **kw: _two_stage(index_dir, kind="cross", name="bm25_monot5", **kw),
}


def get_retriever(name: str, index_dir=None, **kw) -> BaseRetriever:
    if name not in RETRIEVER_REGISTRY:
        raise KeyError(f"Unknown retriever {name!r}; known: {sorted(RETRIEVER_REGISTRY)}")
    return RETRIEVER_REGISTRY[name](index_dir=index_dir, **kw)


__all__ = [
    "BaseRetriever", "RetrieverResult", "normalize_scores",
    "write_results_trec", "RETRIEVER_REGISTRY", "get_retriever",
]
