"""QPP research layer: correlations, evaluator workflow, stochastic, sampled."""

import numpy as np
import pytest

from qpp_fusion_rag_tpu.qpp.correlation import (
    evaluate_correlations,
    kendall,
    pairwise_accuracy,
    pearson,
    quantized_class_accuracy,
    rank_distance,
    rbo,
    rmse,
    sare,
    smare,
    spearman,
)


def test_basic_correlations():
    a = np.array([1, 2, 3, 4, 5], float)
    assert pearson(a, a) == pytest.approx(1.0)
    assert pearson(a, -a) == pytest.approx(-1.0)
    assert spearman(a, a**3) == pytest.approx(1.0)      # monotone
    assert kendall(a, a) == pytest.approx(1.0)
    assert kendall(a, -a) == pytest.approx(-1.0)
    assert rmse(a, a) == 0.0
    assert pairwise_accuracy(a, a) == 1.0
    assert pairwise_accuracy(a, -a) == 0.0
    assert pearson(np.ones(5), a) == 0.0                # degenerate -> 0


def test_kendall_ties():
    a = np.array([1, 1, 2, 3], float)
    b = np.array([1, 2, 2, 3], float)
    v = kendall(a, b)
    assert 0 < v < 1


def test_sare_and_smare():
    true = np.array([0.9, 0.5, 0.1])
    perfect = np.array([3.0, 2.0, 1.0])
    assert smare(perfect, true) == 0.0
    reversed_ = np.array([1.0, 2.0, 3.0])
    assert smare(reversed_, true) > 0.4
    assert sare(perfect, true).shape == (3,)


def test_quantized_accuracy():
    a = np.arange(20, dtype=float)
    assert quantized_class_accuracy(a, a) == 1.0
    assert quantized_class_accuracy(a, -a) < 0.5


def test_rbo_and_rank_distance():
    assert rbo([1, 2, 3], [1, 2, 3]) == pytest.approx(1.0)
    assert rbo([1, 2, 3], [4, 5, 6]) == 0.0
    partial = rbo([1, 2, 3, 4], [1, 2, 4, 3])
    assert 0.8 < partial < 1.0
    assert rank_distance([1, 2, 3], [1, 2, 3]) == 0.0
    assert rank_distance([1, 2, 3], [3, 2, 1]) == pytest.approx(4 / 3)


def test_evaluate_correlations_dispatch():
    out = evaluate_correlations([1, 2, 3], [1, 2, 3], metrics=("pearson", "smare"))
    assert out["pearson"] == pytest.approx(1.0)
    assert out["smare"] == 0.0


# -- evaluator workflow --------------------------------------------------------

def test_qpp_evaluator_finds_informative_method(world_rt):
    from qpp_fusion_rag_tpu.qpp.evaluator import best_predictor, evaluate_qpp_methods

    rt, qrels, qpp = world_rt
    report = evaluate_qpp_methods(rt, qrels, qpp=qpp)
    # column 5 (RSD) was planted to equal true quality -> top predictor
    assert best_predictor(report, "pearson") == "RSD"
    assert report["_mean"]["RSD"]["pearson"] > 0.9


@pytest.fixture(scope="module")
def world_rt():
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor
    from qpp_fusion_rag_tpu.data.vocab import DocVocab
    from qpp_fusion_rag_tpu.evaluation.ir_evaluator import per_query_metric

    rng = np.random.default_rng(0)
    R, Q, K, n_docs = 2, 40, 10, 300
    vocab = DocVocab()
    for d in range(n_docs):
        vocab.add(f"d{d}")
    qids = [str(i) for i in range(Q)]
    qrels = {q: {f"d{int(q)}": 1} for q in qids}
    doc_ids = np.full((R, Q, K), -1, np.int32)
    scores = np.tile(np.linspace(1, 0.1, K, dtype=np.float32), (R, Q, 1))
    for qi, q in enumerate(qids):
        for r in range(R):
            row = list(rng.choice(np.arange(50, n_docs), K, replace=False))
            if rng.uniform() < 0.5:
                row[rng.integers(0, K)] = vocab.id_of(f"d{q}")
            doc_ids[r, qi] = row
    rt = RunTensor(doc_ids, scores, qids, ["r0", "r1"], vocab)
    quality = per_query_metric(rt, qrels)       # [R, Q]
    qpp = rng.uniform(0, 1, (R, Q, 13)).astype(np.float32)
    qpp[:, :, 5] = quality                      # plant a perfect predictor at RSD
    return rt, qrels, qpp


# -- stochastic ---------------------------------------------------------------

def test_perturb_and_swap(world_rt):
    from qpp_fusion_rag_tpu.qpp.stochastic import perturb_scores, swap_rank_pairs

    rt, qrels, _ = world_rt
    noisy = perturb_scores(rt.scores[0], delta=0.01)
    assert noisy.shape == rt.scores[0].shape
    assert np.all(np.diff(noisy, axis=-1) <= 1e-6)  # resorted desc

    rel = np.zeros_like(rt.doc_ids[0], bool)
    rel[:, 0] = True
    swapped, _ = swap_rank_pairs(rt.doc_ids[0], rt.scores[0], rel, swap_frac=1.0)
    assert swapped.shape == rt.doc_ids[0].shape
    # multiset of docs per query unchanged
    for qi in range(swapped.shape[0]):
        assert sorted(swapped[qi]) == sorted(rt.doc_ids[0][qi])


def test_stochastic_qpp_evaluation(world_rt):
    from qpp_fusion_rag_tpu.qpp.stochastic import stochastic_qpp_evaluation

    rt, qrels, _ = world_rt
    out = stochastic_qpp_evaluation(
        rt, qrels, n_samples=3, cutoffs=(10,), delta=0.02,
    )
    stats = out[10]["nqc"]
    assert len(stats["samples"]) == 3
    assert stats["std"] >= 0


# -- sampled variants ----------------------------------------------------------

def test_sampled_rsd_deterministic():
    from qpp_fusion_rag_tpu.qpp.sampled import sampled_rsd

    scores = np.sort(np.random.default_rng(1).uniform(0, 5, 50))[::-1]
    a = sampled_rsd(scores, seed=7)
    b = sampled_rsd(scores, seed=7)
    assert a == b            # fixed key -> reproducible
    assert a >= 0
    assert sampled_rsd(scores[:2]) == 0.0


def test_sampled_uef_stability_signal():
    from qpp_fusion_rag_tpu.qpp.sampled import sampled_uef

    # widely-separated scores -> stable ranking -> higher UEF than flat scores
    spread = np.array([10.0, 8.0, 6.0, 4.0, 2.0, 1.0])
    flat = np.array([1.01, 1.008, 1.006, 1.004, 1.002, 1.0])
    assert sampled_uef(spread, seed=3) > sampled_uef(flat, seed=3)


def test_odds_ratio():
    from qpp_fusion_rag_tpu.qpp.sampled import odds_ratio

    peaked = np.array([10.0, 9.0, 1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3])
    flat = np.full(10, 2.0)
    assert odds_ratio(peaked) > odds_ratio(flat)
    assert odds_ratio(flat) == pytest.approx(1.0)
    assert odds_ratio(np.array([1.0])) == 0.0
