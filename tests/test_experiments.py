"""Experiments layer: properties registry, grid workflow, precomputed QPP."""

import numpy as np
import pytest


def test_load_properties(tmp_path):
    from qpp_fusion_rag_tpu.qpp.experiments import load_properties

    p = tmp_path / "exp.properties"
    p.write_text(
        "# comment\n"
        "! other comment\n"
        "index.dir=/x/y\n"
        "qpp.metric: tau\n"
        "retrieve.num_wanted=500\n"
        "long.key=a\\\nb\n"
    )
    props = load_properties(p)
    assert props["index.dir"] == "/x/y"
    assert props["qpp.metric"] == "tau"
    assert props["retrieve.num_wanted"] == "500"
    assert props["long.key"] == "ab"


def test_settings_registry(tmp_path):
    from qpp_fusion_rag_tpu.qpp.experiments import SettingsRegistry

    reg = SettingsRegistry({
        "qpp.metric": "rho", "qpp.method": "nqc",
        "qpp.numtopdocs": "10", "retrieve.num_wanted": "200",
    })
    assert reg.num_wanted == 200 and reg.qpp_top_k == 10
    a = np.array([1.0, 2.0, 3.0, 4.0])
    assert reg.correlation_metric()(a, a) == pytest.approx(1.0)
    with pytest.raises(KeyError):
        reg.correlation_metric("nope")

    # method predictor returns the matching qpp_kernel column
    from qpp_fusion_rag_tpu.ops import qpp as Q

    rng = np.random.default_rng(0)
    scores = -np.sort(-rng.uniform(0.1, 5.0, size=(4, 20)).astype(np.float32))
    n_valid = np.full(4, 20, np.int32)
    feats = np.tile(np.array([3.0, 3.0, 7.0, 5.0], np.float32), (4, 1))
    pred = reg.qpp_method("nqc")(scores, n_valid, feats)
    ref = np.asarray(Q.qpp_kernel(scores, n_valid, feats, cutoff=10))[:, 0]
    np.testing.assert_allclose(pred, ref, rtol=1e-6)
    with pytest.raises(KeyError):
        reg.qpp_method("bogus")


def test_precomputed_predictor(tmp_path):
    from qpp_fusion_rag_tpu.qpp.experiments import PreComputedPredictor

    f = tmp_path / "qpp.tsv"
    f.write_text("q1 0.5\nq2\t0.75\n\nq3 1.25 extra\n")
    p = PreComputedPredictor("rsd", k=50)
    p.set_data_source(f)
    assert p.compute("q1") == 0.5
    assert p.compute("q3") == 1.25
    assert p.compute("missing") == 0.0
    np.testing.assert_array_equal(
        p.compute_batch(["q2", "zzz"]), np.array([0.75, 0.0], np.float32)
    )
    assert str(p) == "rsd@k50"
    p2 = PreComputedPredictor("x")
    p2.set_data_source(tmp_path / "absent.tsv")  # silently empty, like reference
    assert p2.compute("q1") == 0.0


def test_train_test_grid_prefers_smoothing_when_it_helps(rng):
    """Construct data where neighbor smoothing denoises the predictor: the
    grid must pick lambda < 1 equivalent (some smoothing) and improve tau."""
    from qpp_fusion_rag_tpu.qpp.correlation import kendall
    from qpp_fusion_rag_tpu.qpp.experiments import train_test_grid

    Q = 60
    # queries live in 2 clusters; truth is cluster-dependent + small noise
    emb = rng.standard_normal((Q, 16)).astype(np.float32)
    emb[: Q // 2] += 4.0
    truth = np.where(np.arange(Q) < Q // 2, 0.8, 0.2) + rng.normal(0, 0.02, Q)
    base = truth + rng.normal(0, 0.4, Q)   # noisy base predictor
    emb_te = emb + rng.normal(0, 0.05, emb.shape).astype(np.float32)
    truth_te = truth + rng.normal(0, 0.02, Q)
    base_te = truth_te + rng.normal(0, 0.4, Q)

    out = train_test_grid(base, truth, emb, base_te, truth_te, emb_te,
                          max_variants=4)
    assert len(out["grid"]) == 4 * 6
    assert out["best"]["tau"] >= kendall(base, truth) - 1e-9
    raw_tau = kendall(base_te, truth_te)
    assert out["test"]["tau"] >= raw_tau - 0.05  # smoothing shouldn't hurt
    assert 0 <= out["test"]["smare"]
