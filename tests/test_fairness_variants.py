"""AWRF fairness, tie-breakers, variant/co-relevance QPP."""

import numpy as np
import pytest

from qpp_fusion_rag_tpu.evaluation.fairness import (
    NoTieBreaker,
    NoisePerturbationTieBreaker,
    SampledPermAggrTieBreaker,
    awrf,
)
from qpp_fusion_rag_tpu.qpp.variants import corel_qpp, query_knn, variant_qpp


def test_awrf_uniform_vs_skewed():
    balanced = np.array([[0, 1, 0, 1, 0, 1]])
    skewed = np.array([[0, 0, 0, 0, 0, 0]])
    a_bal = awrf(balanced, n_groups=2)
    a_skew = awrf(skewed, n_groups=2)
    assert a_bal[0] > 0.9
    assert a_skew[0] == pytest.approx(0.5)
    # matching a skewed target
    a_match = awrf(skewed, n_groups=2, target=np.array([1.0, 0.0]))
    assert a_match[0] == pytest.approx(1.0)


def test_awrf_padding_ignored():
    g = np.array([[0, 1, -1, -1]])
    # rank-1 discount outweighs rank-2 (1.0 vs 0.63) -> slight imbalance
    assert awrf(g, n_groups=2)[0] == pytest.approx(0.887, abs=0.01)


def _metric(order):
    """Toy metric: reciprocal rank of item 0."""
    pos = int(np.where(order == 0)[0][0])
    return 1.0 / (pos + 1)


def test_tie_breakers():
    scores = np.array([0.9, 0.9, 0.9, 0.1])  # item 0 tied with 1, 2
    nt = NoTieBreaker().evaluate(_metric, scores)
    assert nt["std"] == 0.0 and nt["mean"] == 1.0  # stable sort keeps item 0 first

    pa = SampledPermAggrTieBreaker(n_samples=200, seed=1).evaluate(_metric, scores)
    # expectation over permutations of the tied block: (1 + 1/2 + 1/3)/3
    assert pa["mean"] == pytest.approx((1 + 0.5 + 1 / 3) / 3, abs=0.05)
    assert pa["std"] > 0

    npb = NoisePerturbationTieBreaker(delta=0.05, n_samples=100, seed=2).evaluate(_metric, scores)
    assert 0.3 < npb["mean"] < 1.0 and npb["std"] > 0


def test_query_knn_and_variant_qpp():
    rng = np.random.default_rng(0)
    # two clusters of queries
    emb = np.concatenate([
        rng.normal(0, 0.05, (5, 8)) + np.array([1.0] + [0.0] * 7),
        rng.normal(0, 0.05, (5, 8)) + np.array([0.0, 1.0] + [0.0] * 6),
    ]).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    sims, idx = query_knn(emb, k=3)
    # neighbors stay within the cluster
    assert all(j < 5 for j in idx[0])
    assert all(j >= 5 for j in idx[7])
    assert np.all(sims > 0.5)

    base = np.array([1.0] * 5 + [0.0] * 5)
    sm = variant_qpp(base, idx, sims, lam=0.5)
    assert sm[0] == pytest.approx(1.0, abs=1e-5)   # cluster-consistent
    assert sm[7] == pytest.approx(0.0, abs=1e-5)

    noisy = base.copy()
    noisy[0] = 0.0  # outlier within its cluster gets pulled toward neighbors
    sm2 = corel_qpp(noisy, emb, k=3, lam=0.5)
    assert sm2[0] > 0.4


def test_pre_evaluated_results(tmp_path):
    from qpp_fusion_rag_tpu.evaluation.fairness import PreEvaluatedResults

    p = tmp_path / "perq.tsv"
    p.write_text("qid\tnDCG\tAWRF\tcombined\n"
                 "q1\t0.5\t0.7\t0.35\n"
                 "q2\t0.9\t0.2\t0.18\n")
    pre = PreEvaluatedResults(p)
    assert pre.compute("q1", "ndcg") == 0.5
    assert pre.compute("q2", "awrf") == 0.2
    assert pre.compute("q2", "combined") == 0.18
    assert pre.compute("missing", "ndcg") == -1.0
    assert pre.query_ids() == {"q1", "q2"}


def test_export_doc_vectors(tmp_path):
    import numpy as np

    from qpp_fusion_rag_tpu.index.sparse import SparseIndex

    # 2 terms, 3 docs: t0 -> d0:2.0 d2:1.0 ; t1 -> d1:3.0 d0:0.5
    idx = SparseIndex(
        offsets=np.array([0, 2, 4]),
        docs=np.array([0, 2, 1, 0], np.int32),
        weights=np.array([2.0, 1.0, 3.0, 0.5], np.float32),
        doc_lens=np.array([2, 1, 1], np.int32),
        docnos=["d0", "d1", "d2"],
        vocab_dump="alpha\nbeta",
    )
    out = tmp_path / "vecs.tsv"
    n = idx.export_doc_vectors(out, weighting="bm25")
    assert n == 3
    lines = out.read_text().splitlines()
    assert lines[0] == "d0\talpha:2.0000 beta:0.5000"
    assert lines[1] == "d1\tbeta:3.0000"
    assert lines[2] == "d2\talpha:1.0000"
    # tfidf re-weighting changes the weights
    idx.export_doc_vectors(out, weighting="tfidf")
    assert "alpha:" in out.read_text()
