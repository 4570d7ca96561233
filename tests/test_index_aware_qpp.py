"""Index-aware QPP columns vs closed forms on a known toy index."""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def toy_index():
    from qpp_fusion_rag_tpu.index.sparse import SparseIndex

    # 8 docs; "alpha" in all 8, "beta" in 4, "gamma" in 1, "delta" in 0
    docs = []
    for i in range(8):
        text = "alpha common filler"
        if i < 4:
            text += " beta"
        if i == 0:
            text += " gamma"
        docs.append((f"d{i}", text))
    return SparseIndex.build_bm25(docs)


def test_idf_stats_closed_form(toy_index):
    from qpp_fusion_rag_tpu.qpp.index_aware import IndexAwareQPP

    qpp = IndexAwareQPP(toy_index)
    dfs = qpp.query_dfs(["alpha beta gamma", "delta", "beta beta"])
    N = 8.0
    # query 0: dfs {alpha:8, beta:4, gamma:1}
    row = sorted(d for d in dfs[0] if d >= 0)
    assert row == [1, 4, 8]
    # query 1: "delta" is not in the index vocab — the native tokenizer
    # drops unknown terms at query encoding, so (unlike Lucene's parse)
    # the df==0 branch cannot arise; the query simply has no terms.
    assert (dfs[1] == -1).all()
    # query 2: distinct terms only (qtf folded into weights)
    assert sorted(d for d in dfs[2] if d >= 0) == [4]

    from qpp_fusion_rag_tpu.qpp.index_aware import idf_stats_from_dfs

    mean_idf, max_idf, avg_idf, n_terms = idf_stats_from_dfs(dfs, 8)
    # closed forms, reference conventions
    idf = lambda df: math.log(N / df)
    assert np.isclose(mean_idf[0], (idf(8) + idf(4) + idf(1)) / 3)
    assert np.isclose(max_idf[0], idf(1))
    assert np.isclose(avg_idf[0], (idf(8) + idf(4) + idf(1)) / 3)
    # zero known terms -> bridge's avgIDF=1.0 convention; max/avg 0
    assert mean_idf[1] == 1.0
    assert max_idf[1] == 0.0
    assert avg_idf[1] == 0.0
    assert n_terms.tolist() == [3.0, 0.0, 1.0]


def test_index_aware_columns_closed_form(toy_index):
    from qpp_fusion_rag_tpu.qpp.index_aware import COLUMNS, IndexAwareQPP

    rng = np.random.default_rng(3)
    Q, K = 3, 10
    scores = -np.sort(-rng.uniform(1.0, 9.0, size=(Q, K)).astype(np.float32))
    n_valid = np.array([10, 7, 0], dtype=np.int32)
    queries = ["alpha beta gamma", "beta", "alpha"]

    qpp = IndexAwareQPP(toy_index, cutoff=50)
    out = qpp.compute(queries, scores, n_valid)
    assert set(out) == set(COLUMNS)

    N = 8.0
    idf = lambda df: math.log(N / df)
    for qi, (terms_dfs, nq) in enumerate([( [8, 4, 1], 3), ([4], 1)]):
        m = int(n_valid[qi])
        s = scores[qi, :m].astype(np.float64)
        var = ((s - s.mean()) ** 2).mean()
        mean_idf = sum(idf(d) for d in terms_dfs) / len(terms_dfs)
        max_idf = max(idf(d) for d in terms_dfs)
        wig = (s - 1.0 / max_idf).sum() / (nq * m)
        assert np.isclose(out["nqc-idx"][qi], var * mean_idf, rtol=1e-5)
        assert np.isclose(out["wig-idx"][qi], wig, rtol=1e-5)
        assert np.isclose(out["MaxIDF-idx"][qi], max_idf, rtol=1e-6)
        assert np.isclose(out["avgidf-idx"][qi], mean_idf, rtol=1e-6)
    # empty result list -> all columns 0 (bridge edge convention)
    assert all(out[c][2] == 0.0 for c in COLUMNS)


def test_engine_appends_index_aware_columns(toy_index):
    from qpp_fusion_rag_tpu.qpp.engine import compute_qpp

    scores = {"1": [5.0, 4.0, 3.0], "2": [2.0, 1.5]}
    texts = {"1": "alpha beta", "2": "gamma"}
    base = compute_qpp(scores, texts, normalize="none")
    ext = compute_qpp(scores, texts, normalize="none", index=toy_index)
    assert len(base["1"]) == 13 and len(ext["1"]) == 17
    assert ext["1"][:13] == base["1"]
