"""Gen-variants QPP workflow + retrieval/ utility residue
(TRECDLQPPEvaluatorWithGenVariants, TermWtUtil, FdbkTermStats,
MsMarcoNNQueriesWriter equivalents)."""

import numpy as np
import pytest


def test_load_variants_file(tmp_path):
    from qpp_fusion_rag_tpu.qpp.gen_variants import load_variants_file

    p = tmp_path / "variants.tsv"
    p.write_text(
        "q1\twhat is jax\twhat is the jax library\tjax framework intro\n"
        "q2\ttpu cost\thow much does a tpu cost\n"
        "q1\twhat is jax\tjax explained\n"        # repeated qid appends
        "bad line without variants\n"
        "\n"
    )
    v = load_variants_file(p)
    assert v["q1"] == ["what is the jax library", "jax framework intro",
                       "jax explained"]
    assert v["q2"] == ["how much does a tpu cost"]
    assert "bad line without variants" not in v


def test_gen_variant_qpp_smoothing():
    from qpp_fusion_rag_tpu.qpp.gen_variants import gen_variant_qpp

    base = np.array([1.0, 2.0])
    vb = np.array([[2.0, 4.0], [np.nan, np.nan]])
    sims = np.array([[1.0, 3.0], [0.5, 0.5]])
    out = gen_variant_qpp(base, vb, sims, lam=0.5)
    # q0: 0.5*1 + 0.5*((1*2 + 3*4)/4) = 0.5 + 1.75
    np.testing.assert_allclose(out[0], 2.25, rtol=1e-6)
    # q1: no usable variants -> base
    np.testing.assert_allclose(out[1], 2.0, rtol=1e-6)
    # num_variants=1 keeps only the highest-sim variant
    out1 = gen_variant_qpp(base, vb, sims, lam=0.0, num_variants=1)
    np.testing.assert_allclose(out1[0], 4.0, rtol=1e-6)
    # lam=1 ignores variants entirely
    np.testing.assert_allclose(
        gen_variant_qpp(base, vb, sims, lam=1.0), base, rtol=1e-6)


def test_train_test_grid_gen_variants_recovers_signal():
    """When the truth IS the variant-smoothed predictor, the grid must
    find a non-trivial (lambda, nv) and transfer to test."""
    from qpp_fusion_rag_tpu.qpp.gen_variants import (
        gen_variant_qpp,
        train_test_grid_gen_variants,
    )

    rng = np.random.default_rng(0)
    Q, V = 60, 4

    def split(seed):
        r = np.random.default_rng(seed)
        base = r.uniform(0, 1, Q)
        vb = base[:, None] + r.normal(0, 0.05, (Q, V))
        sims = r.uniform(0.3, 1.0, (Q, V))
        truth = gen_variant_qpp(base, vb, sims, lam=0.6, num_variants=3)
        truth = truth + r.normal(0, 0.01, Q)
        return base, vb, sims, truth

    btr, vtr, str_, ttr = split(1)
    bte, vte, ste, tte = split(2)
    res = train_test_grid_gen_variants(btr, vtr, str_, ttr,
                                       bte, vte, ste, tte, max_variants=V)
    assert res["best"]["tau"] > 0.8
    assert res["test"]["tau"] > 0.8
    assert len(res["grid"]) == V * 6


def test_rbo_sims_and_nn_queries_writer(tmp_path):
    from qpp_fusion_rag_tpu.qpp.gen_variants import (
        rbo_sims,
        write_nn_queries_file,
    )

    orig = np.array([[1, 2, 3, -1]])
    variants = np.array([[[1, 2, 3, -1], [9, 8, 7, -1]]])
    sims = rbo_sims(orig, variants)
    assert sims.shape == (1, 2)
    assert sims[0, 0] == pytest.approx(1.0)       # identical runs
    assert sims[0, 1] < 0.1                       # disjoint runs

    p = tmp_path / "nn.res"
    n = write_nn_queries_file(
        p, ["q1", "q2"], ["alpha", "beta"],
        nn_idx=np.array([[1, -1], [0, -1]]),
        nn_sims=np.array([[0.75, 0.0], [0.5, 0.0]]))
    lines = p.read_text().splitlines()
    assert n == 2 and len(lines) == 2
    assert lines[0].split("\t") == ["q1", "Q0", "q2", "1", "0.7500",
                                    "alpha| beta"]


def test_term_weight_formulas_match_reference_java():
    """Formula-exact vs TermWtUtil.java closed forms (incl. the faithful
    in-denominator IDF quirk)."""
    import math

    from qpp_fusion_rag_tpu.qpp.term_weights import (
        bm25_idf,
        bm25_weight,
        lmjm_weight,
        tfidf_weight,
    )

    N, df, cf, tf, dl, avg = 1000, 25, 40, 3, 120.0, 100.0
    idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    assert bm25_idf(N, df) == pytest.approx(idf)
    k, b = 0.9, 0.4
    want = tf * (k + 1) / (tf + k * (1 - b + b * dl / avg) * idf)
    assert bm25_weight(tf, N, df, dl, avg, k1=k, b=b) == pytest.approx(want)
    assert tfidf_weight(tf, N, df) == pytest.approx(tf * math.log(N / df))
    lam = 0.9
    want_lm = math.log(1 + lam / (1 - lam) * tf / dl * N / cf)
    assert lmjm_weight(tf, N, cf, dl, lam=lam) == pytest.approx(want_lm)
    # vectorized broadcast
    out = bm25_weight(np.array([1, 2, 3]), N, df, dl, avg)
    assert out.shape == (3,) and (np.diff(out) > 0).all()


def test_feedback_term_stats():
    from qpp_fusion_rag_tpu.qpp.feedback import feedback_term_stats

    corpus = {
        "d1": "neural retrieval with dense encoders",
        "d2": {"text": "dense dense retrieval models"},
        "d3": "cooking pasta with tomato sauce",
    }
    queries = {"q1": "dense retrieval", "q2": "no run for this one"}
    runs = {"q1": ["d1", "d2", "missing-doc"]}
    stats = feedback_term_stats(queries, runs, corpus, num_top_docs=2)
    assert set(stats) == {"q1"}                   # q2 skipped (no run)
    terms = [t for t, _ in stats["q1"]]
    weights = [w for _, w in stats["q1"]]
    assert "dense" in terms and "retrieval" in terms
    assert "tomato" not in terms                  # d3 not in the run
    assert all(np.diff(weights) <= 1e-12)         # sorted desc
    assert weights[0] > 0
