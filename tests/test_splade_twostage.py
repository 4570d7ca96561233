"""SPLADE retrieval + two-stage rerankers with tiny random encoders."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from qpp_fusion_rag_tpu.encoders import (

    BertConfig,
    CrossEncoderScorer,
    DenseEncoder,
    SpladeEncoder,
    params_from_hf_state_dict,
)

TINY = dict(
    vocab_size=128, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=64, type_vocab_size=2,
)


def char_tokenizer(t):
    return [ord(c) % 120 + 1 for c in t.lower()][:30]


DOCS = [
    ("d0", "quick brown fox"),
    ("d1", "lazy dog sleeps"),
    ("d2", "neural ranking model"),
    ("d3", "sparse retrieval index"),
    ("d4", "dense embedding search"),
]


@pytest.fixture(scope="module")
def splade_encoder():
    torch.manual_seed(0)
    model = transformers.BertForMaskedLM(transformers.BertConfig(**TINY)).eval()
    cfg = BertConfig.from_hf(model.config)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    return SpladeEncoder(params, cfg, tokenizer=char_tokenizer, max_len=32)


def test_splade_index_and_search(splade_encoder):
    from qpp_fusion_rag_tpu.retrievers.splade import SpladeRetriever

    r = SpladeRetriever.build(splade_encoder, DOCS, doc_top_terms=32)
    assert r.index.num_docs == 5
    # identical text must retrieve its own doc first (identical impacts)
    res = r.retrieve("quick brown fox", "q0", top_k=5)
    assert res.results[0][0] == "d0"
    batch = r.retrieve_batch({"a": "lazy dog sleeps", "b": "dense embedding search"}, top_k=3)
    assert batch["a"].results[0][0] == "d1"
    assert batch["b"].results[0][0] == "d4"


def test_splade_index_roundtrip(tmp_path, splade_encoder):
    from qpp_fusion_rag_tpu.retrievers.splade import SpladeIndex, SpladeRetriever

    r = SpladeRetriever.build(splade_encoder, DOCS, doc_top_terms=16)
    r.index.save(tmp_path / "splade")
    loaded = SpladeIndex.load(tmp_path / "splade")
    q_terms, q_weights = r._encode_queries(["neural ranking model"])
    s1, i1 = r.index.search_impacts(q_terms, q_weights, k=3)
    s2, i2 = loaded.search_impacts(q_terms, q_weights, k=3)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    np.testing.assert_array_equal(i1, i2)


def test_two_stage_cross_encoder():
    from qpp_fusion_rag_tpu.index.sparse import SparseIndex
    from qpp_fusion_rag_tpu.retrievers.bm25 import BM25Retriever
    from qpp_fusion_rag_tpu.retrievers.two_stage import (
        CrossEncoderReranker,
        TwoStageRetriever,
    )

    torch.manual_seed(1)
    model = transformers.BertForSequenceClassification(
        transformers.BertConfig(**TINY, num_labels=1)
    ).eval()
    cfg = BertConfig.from_hf(model.config)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    scorer = CrossEncoderScorer(params, cfg, tokenizer=char_tokenizer, max_len=48)

    corpus = dict(DOCS)
    first = BM25Retriever(SparseIndex.build_bm25(DOCS))
    ts = TwoStageRetriever(first, CrossEncoderReranker(scorer), corpus,
                           first_stage_k=5, name="bm25_ce")
    res = ts.retrieve("brown fox ranking", "q1", top_k=3)
    assert len(res.results) >= 2
    assert res.results[0][2] == 1
    scores = [s for _, s, _ in res.results]
    assert scores == sorted(scores, reverse=True)


def test_two_stage_dense_reranker():
    from qpp_fusion_rag_tpu.index.sparse import SparseIndex
    from qpp_fusion_rag_tpu.retrievers.bm25 import BM25Retriever
    from qpp_fusion_rag_tpu.retrievers.two_stage import DenseReranker, TwoStageRetriever

    torch.manual_seed(2)
    model = transformers.BertModel(transformers.BertConfig(**TINY)).eval()
    cfg = BertConfig.from_hf(model.config)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    enc = DenseEncoder(params, cfg, pooling="mean", normalize=True,
                       tokenizer=char_tokenizer, max_len=32)

    first = BM25Retriever(SparseIndex.build_bm25(DOCS))
    ts = TwoStageRetriever(first, DenseReranker(enc), dict(DOCS),
                           first_stage_k=5, name="bm25_tct")
    batch = ts.retrieve_batch({"q1": "sparse retrieval index"}, top_k=3)
    # identical text -> identical embedding -> dot product max on itself
    assert batch["q1"].results[0][0] == "d3"
