"""QPP research layer: correlations, evaluator workflow, stochastic, sampled."""

import numpy as np
import pytest

from qpp_fusion_rag_tpu.qpp.correlation import (
    RankScore,
    cross_product,
    evaluate_correlations,
    kendall,
    pairwise_accuracy,
    pearson,
    polyfit_predict,
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


def test_polyfit_predict():
    # exact quadratic recovers its coefficients and predictions
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    y = 2.0 + 3.0 * x + 0.5 * x * x
    coeff = polyfit_predict(x, y, degree=2)
    np.testing.assert_allclose(coeff, [2.0, 3.0, 0.5], atol=1e-8)
    np.testing.assert_allclose(polyfit_predict(x, y, 2, at=[5.0]),
                               [2.0 + 15.0 + 12.5], atol=1e-6)
    # the reference main's key-point fit is near-linear (slope ~2,
    # curvature ~0): PolynomialRegression.java:17-54
    c = polyfit_predict([1, 150, 10000, 100000, 1000000],
                        [2, 250, 20000, 200000, 2000000], degree=2)
    assert abs(c[1] - 2.0) < 0.01 and abs(c[2]) < 1e-6


def test_rank_score_ordering():
    rs = sorted([RankScore(1, 1, 0.9), RankScore(2, 2, 0.1),
                 RankScore(3, 3, 0.5)])
    assert [r.id for r in rs] == [2, 3, 1]
    assert "2" in str(rs[0]) and rs[0].rank == 2


def test_cross_product():
    groups = {1.0: [1, 2], 2.0: [3, 4], 3.0: [5, 6]}
    tuples = cross_product(groups)
    assert len(tuples) == 8
    assert [1, 3, 5] in tuples and [2, 4, 6] in tuples
    assert all(len(t) == 3 for t in tuples)
    assert cross_product({}) == [[]]


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


@pytest.mark.slow
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


# -- regression: review findings (qpp/evaluation/parallel) ----------------------

def test_best_predictor_direction():
    """For error metrics (smare/rmse) the best predictor has the LOWEST mean."""
    from qpp_fusion_rag_tpu.qpp.evaluator import best_predictor

    report = {"_mean": {
        "good": {"pearson": 0.9, "smare": 0.1, "rmse": 0.2},
        "bad": {"pearson": 0.1, "smare": 0.9, "rmse": 0.8},
    }}
    assert best_predictor(report, "pearson") == "good"
    assert best_predictor(report, "smare") == "good"
    assert best_predictor(report, "rmse") == "good"


def test_stochastic_actually_perturbs_rankings(world_rt):
    """Rank swaps must change measured quality across samples: with
    swap_frac>0, a perturbed sample's correlation differs from the
    unperturbed baseline (rankings move, quality is re-measured)."""
    from qpp_fusion_rag_tpu.qpp.stochastic import (
        _relevance_mask,
        stochastic_qpp_evaluation,
        swap_rank_pairs,
    )

    rt, qrels, _ = world_rt
    mask = _relevance_mask(rt, qrels)
    assert mask.any(), "fixture must place relevant docs in the runs"
    swapped, _ = swap_rank_pairs(
        rt.doc_ids[0], rt.scores[0], mask[0], swap_frac=1.0,
        rng=np.random.default_rng(1),
    )
    assert (swapped != rt.doc_ids[0]).any()

    out = stochastic_qpp_evaluation(
        rt, qrels, n_samples=3, cutoffs=(10,), swap_frac=1.0, seed=3
    )
    stds = [v["std"] for v in out[10].values()]
    # ranking perturbation + quality re-measurement -> nonzero spread somewhere
    assert any(s > 0 for s in stds)


def test_variant_qpp_ignores_padded_neighbors():
    from qpp_fusion_rag_tpu.qpp.variants import query_knn, variant_qpp

    # 3 queries, k=5 > Q-1: padding is unavoidable
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(3, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    sims, idx = query_knn(emb, k=5)
    assert (idx == -1).any()                      # padded slots marked
    base = np.array([10.0, 20.0, 30.0], np.float32)
    out = variant_qpp(base, idx, sims)
    # each smoothed value must stay inside the range of REAL base values —
    # phantom neighbor 0 leaking in would drag values toward base[0]
    lo, hi = base.min(), base.max()
    assert (out >= lo - 1e-5).all() and (out <= hi + 1e-5).all()
    # no-neighbor degenerate case: all-padding row keeps its base value
    out2 = variant_qpp(base, np.full((3, 2), -1), None)
    np.testing.assert_allclose(out2, base, rtol=1e-6)


def test_compute_qpp_all_empty_lists():
    from qpp_fusion_rag_tpu.qpp.engine import compute_qpp

    out = compute_qpp({"q1": [], "q2": []})
    assert set(out) == {"q1", "q2"}
    assert len(out["q1"]) == 13


def test_parse_verdict_negated_support():
    from qpp_fusion_rag_tpu.evaluation.fact_verification import parse_verdict

    assert parse_verdict("The claim is not supported by the evidence.") == "CONTRADICT"
    assert parse_verdict("This is unsupported.") == "CONTRADICT"
    assert parse_verdict("The evidence does not support the claim") == "CONTRADICT"
    assert parse_verdict("The claim is supported.") == "SUPPORT"
    assert parse_verdict("Verdict: SUPPORT") == "SUPPORT"


def test_containment_empty_normalized_reference():
    from qpp_fusion_rag_tpu.evaluation.qa_evaluator import containment

    assert containment("any prediction", ["the"]) == 0.0   # normalizes to ""
    assert containment("paris is nice", ["Paris", "the"]) == 1.0
    assert containment("no match", ["Paris"]) == 0.0


def test_dense_qpp_padding_excluded():
    """Short result lists must score identically to the same docs without
    padding — pad slots may not shrink the diameter."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.qpp.dense_qpp import dense_qpp, dense_qpp_from_index

    rng = np.random.default_rng(0)
    q = rng.normal(size=(1, 16)).astype(np.float32)
    docs = rng.normal(size=(1, 4, 16)).astype(np.float32)
    full = dense_qpp(jnp.asarray(q), jnp.asarray(docs), k=4)

    emb = np.concatenate([docs[0], rng.normal(size=(10, 16)).astype(np.float32)])
    ids = np.array([[0, 1, 2, 3, -1, -1, -1, -1]])
    padded = dense_qpp_from_index(q, ids, emb, k=8)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(full), rtol=1e-5)


def test_sharded_topk_indivisible_corpus():
    """Corpus sizes not divisible by the corpus-axis shard count must work
    and never return padded (out-of-range) ids."""
    import jax
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.parallel.mesh import build_mesh
    from qpp_fusion_rag_tpu.parallel.sharded import sharded_dense_topk

    mesh = build_mesh(n_data=1, n_corpus=8, devices=jax.devices()[:8])
    rng = np.random.default_rng(0)
    N = 1003                                       # 1003 % 8 != 0
    corpus = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    vals, ids = sharded_dense_topk(queries, corpus, mesh, k=10, exact=True)
    ids = np.asarray(ids)
    assert ids.max() < N and (ids >= 0).all()
    # exact parity vs single-device top-k
    ref = np.asarray(corpus) @ np.asarray(queries).T
    expect = np.sort(ref, axis=0)[::-1][:10].T
    np.testing.assert_allclose(np.sort(np.asarray(vals))[:, ::-1], expect, rtol=1e-4)


def test_init_distributed_raises_on_cluster_env(monkeypatch):
    """A failed initialize with cluster env markers present must surface."""
    import jax

    from qpp_fusion_rag_tpu.parallel import multihost

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")

    def boom(**kw):
        raise RuntimeError("backend already initialized")

    # "already initialized" is benign even on a cluster
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    multihost.init_distributed()

    def fail(**kw):
        raise ValueError("no cluster config detected")

    monkeypatch.setattr(jax.distributed, "initialize", fail)
    with pytest.raises(ValueError):
        multihost.init_distributed()
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    multihost.init_distributed()   # no markers -> benign


def test_attribute_swap_permutations():
    from qpp_fusion_rag_tpu.qpp.stochastic import attribute_swap_permutations

    docs = np.array([10, 11, 12, 13])
    attr = np.array([False, True, False, True])   # group A at ranks 1, 3
    perms = attribute_swap_permutations(docs, attr)
    # identity first
    np.testing.assert_array_equal(perms[0], docs)
    # pairs with A below B: (1>0), (3>0), (3>2) -> 3 swaps
    assert perms.shape == (4, 4)
    as_sets = {tuple(p) for p in perms}
    assert (11, 10, 12, 13) in as_sets
    assert (13, 11, 12, 10) in as_sets
    assert (10, 11, 13, 12) in as_sets
    # unknown-attribute docs are skipped
    known = np.array([True, True, True, False])
    perms2 = attribute_swap_permutations(docs, attr, known_mask=known)
    assert perms2.shape == (2, 4)


def test_quantized_sim_and_strict_and_ndcg_correlation():
    from qpp_fusion_rag_tpu.qpp.correlation import (
        ndcg_correlation,
        quantized_sim,
        quantized_strict_match,
    )

    a = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    assert quantized_sim(a, a) == pytest.approx(1.0)
    assert quantized_strict_match(a, a) == pytest.approx(1.0)
    b = a[::-1].copy()
    # reversed: bins (0..5 after minmax) maximally disagree except center
    assert quantized_sim(a, b) < 0.6
    assert quantized_strict_match(a, b) == pytest.approx(1 / 5)

    # ndcg correlation: perfect ordering -> 1; mild swap -> < 1 but > 0
    true = np.array([3.0, 2.0, 1.0, 0.0])
    assert ndcg_correlation(true, true) == pytest.approx(1.0)
    pred = np.array([2.0, 3.0, 1.0, 0.0])
    v = ndcg_correlation(pred, true)
    assert 0.8 < v < 1.0
    # reference closed form for the swapped case (exp scaling)
    disc = 1.0 / np.log2(np.arange(2, 6))
    gains = 2.0 ** true - 1
    dcg = gains[[1, 0, 2, 3]] @ disc
    assert v == pytest.approx(dcg / (gains @ disc))


def test_prec_heavy_evaluation():
    """Fixed QPP estimates vs noisy metric resamples: a perfect predictor
    keeps tau near 1 with small std; an anti-predictor goes negative."""
    import numpy as np

    from qpp_fusion_rag_tpu.qpp.prec_heavy import (
        prec_heavy_evaluation,
        prec_heavy_report,
    )

    rng = np.random.default_rng(0)
    Q = 40
    metric = rng.uniform(0.1, 0.9, Q)
    good = metric + rng.normal(0, 0.01, Q)     # near-perfect predictor
    bad = -metric

    g = prec_heavy_evaluation(good, metric, n_rankings=50, delta=0.05, seed=1)
    b = prec_heavy_evaluation(bad, metric, n_rankings=50, delta=0.05, seed=1)
    assert g["tau_mean"] > 0.7
    assert b["tau_mean"] < -0.7
    assert g["tau_std"] < 0.1
    assert len(g["samples"]) == 50
    assert len(g["mean_sare"]) == Q
    # SARE of the good predictor is much smaller than the bad one's
    assert np.mean(g["mean_sare"]) < np.mean(b["mean_sare"])


def test_prec_heavy_report_tsv(tmp_path):
    import numpy as np

    from qpp_fusion_rag_tpu.qpp.prec_heavy import prec_heavy_report

    metric = np.linspace(0.1, 0.9, 10)
    out = prec_heavy_report(
        {"nqc": metric.copy(), "smv": metric[::-1].copy()},
        metric, out_path=tmp_path / "ph.tsv", n_rankings=5)
    assert set(out) == {"nqc", "smv"}
    lines = (tmp_path / "ph.tsv").read_text().splitlines()
    assert lines[0] == "method\ttau\tndcg"
    assert len(lines) == 1 + 2 * 5
