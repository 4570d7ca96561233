"""RM1/RM3 relevance models + KL rerank."""

import numpy as np

from qpp_fusion_rag_tpu.qpp.feedback import (
    RelevanceModel,
    rm3_rerank_candidates,
)

DOCS = [
    "machine learning models learn from data",
    "deep learning neural networks learn representations",
    "the stock market closed higher today",
    "learning algorithms generalize from training data",
]


def test_rm1_weights_topical_terms():
    rm = RelevanceModel()
    model = rm.rm1("machine learning", DOCS, fb_terms=10)
    assert abs(sum(model.values()) - 1.0) < 1e-9
    assert model.get("learning", 0) > model.get("market", 0)


def test_rm3_keeps_query_mass():
    rm = RelevanceModel()
    model = rm.rm3("machine learning", DOCS, lam=0.9)
    # with lambda=0.9 the original query terms dominate
    assert model["machine"] > 0.3
    assert model["learning"] > 0.3


def test_kl_rerank_prefers_on_topic():
    rm = RelevanceModel()
    model = rm.rm3("machine learning", DOCS[:2], lam=0.5)
    scores = rm.kl_rerank(model, DOCS)
    assert scores[0] > scores[2]           # ML doc beats stock-market doc
    assert scores[1] > scores[2]


def test_rm3_rerank_candidates():
    cands = [(f"d{i}", t) for i, t in enumerate(DOCS)]
    out = rm3_rerank_candidates("learning from data", cands, fb_docs=4)
    assert out[0][0] in ("d0", "d3")
    assert out[-1][0] == "d2"
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)
