"""retrieval/ research extras: SupervisedRLM, QueryRBO_NN, BigramsFinder."""

import math

import numpy as np
import pytest


DOCS = {
    "d1": "apple banana apple cherry",
    "d2": "banana cherry cherry",
    "d3": "apple date",
}
DF = {"apple": 2, "banana": 2, "cherry": 2, "date": 1}


def _rlm():
    from qpp_fusion_rag_tpu.qpp.research_tools import SupervisedRLM

    return SupervisedRLM(
        doc_terms=lambda d: DOCS[d].split(),
        df=lambda t: DF.get(t, 0),
        num_docs=3,
    )


def test_lm_term_wts_closed_form():
    from qpp_fusion_rag_tpu.qpp.research_tools import LAMBDA_ODDS

    rlm = _rlm()
    wts = rlm.make_lm_term_wts("d1")
    # raw wt(t) = log(1 + 9 * tf/sumTf * N/df), then L2-normalized
    raw = {
        "apple": math.log(1 + LAMBDA_ODDS * (2 / 4) * (3 / 2)),
        "banana": math.log(1 + LAMBDA_ODDS * (1 / 4) * (3 / 2)),
        "cherry": math.log(1 + LAMBDA_ODDS * (1 / 4) * (3 / 2)),
    }
    norm = math.sqrt(sum(v * v for v in raw.values()))
    for t, v in raw.items():
        assert wts[t] == pytest.approx(v / norm)
    assert abs(sum(v * v for v in wts.values()) - 1.0) < 1e-9


def test_rlm_fit_save_load_rerank(tmp_path):
    rlm = _rlm()
    rlm.fit({"q1": "apple cherry"}, {"q1": {"d1": 1, "d2": 1}})
    assert "apple" in rlm.term_distributions
    # d1 contains both query terms strongly -> must outrank d3 after rerank
    reranked = rlm.rerank("apple cherry", ["d3", "d1"], [1.0, 1.0])
    assert reranked[0][0] == "d1"

    rlm.save(tmp_path / "rlm.tsv")
    rlm2 = type(rlm).load(tmp_path / "rlm.tsv",
                          doc_terms=lambda d: DOCS[d].split(),
                          df=lambda t: DF.get(t, 0), num_docs=3)
    for q, td in rlm.term_distributions.items():
        got = rlm2.term_distributions[q].cooccur
        for w, v in td.cooccur.items():
            assert got[w] == pytest.approx(v)


def test_query_rbo_nn_orders_by_overlap():
    from qpp_fusion_rag_tpu.qpp.research_tools import query_rbo_nn

    orig = {"q1": ["a", "b", "c", "d"]}
    nns = {"q1": {"v_same": ["a", "b", "c", "d"], "v_diff": ["x", "y", "z", "w"],
                  "v_half": ["a", "b", "x", "y"]}}
    out = query_rbo_nn(orig, nns)
    scores = dict(out["q1"])
    assert scores["v_same"] == pytest.approx(1.0)
    assert scores["v_diff"] == pytest.approx(0.0)
    assert 0.0 < scores["v_half"] < 1.0


def test_bigrams_finder_counts_unordered_pairs():
    from qpp_fusion_rag_tpu.qpp.research_tools import BigramsFinder

    bf = BigramsFinder([["a", "b", "c"], ["a", "b"], ["b", "a"]])
    top = bf.frequent_bigrams(10)
    # "a^b" appears in queries 1 and 2; query 3 contributes "b^a"
    assert top["a^b"] == 2
    assert top["b^a"] == 1
    assert top["a^c"] == 1 and top["b^c"] == 1
