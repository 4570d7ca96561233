"""Learned fusion models: GBDT (host train / device infer) and JAX MLP."""

import numpy as np
import pytest

from qpp_fusion_rag_tpu.models import (
    FusionMLP,
    MultiOutputGBDT,
    PerRetrieverGBDT,
    build_features,
    compute_targets,
    load_model,
)
from qpp_fusion_rag_tpu.models.gbdt import Booster, _predict_tree_host


@pytest.fixture(scope="module")
def regression_data():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((600, 10)).astype(np.float32)
    y = 2.0 * X[:, 0] - 1.5 * np.maximum(X[:, 1], 0) + 0.1 * rng.standard_normal(600)
    return X[:480], y[:480], X[480:], y[480:]


def test_booster_learns(regression_data):
    Xt, yt, Xv, yv = regression_data
    b = Booster({"num_boost_round": 80, "early_stopping_rounds": 15})
    info = b.fit(Xt, yt, Xv, yv)
    base_mse = np.mean((yv - yt.mean()) ** 2)
    assert info["best_val_mse"] < 0.3 * base_mse
    assert info["n_trees"] > 3


def test_booster_device_matches_host(regression_data):
    Xt, yt, Xv, _ = regression_data
    b = Booster({"num_boost_round": 20})
    b.fit(Xt, yt)
    host = b.predict(Xv, device=False)
    dev = b.predict(Xv, device=True)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_booster_pickle_roundtrip(tmp_path, regression_data):
    import pickle

    Xt, yt, Xv, _ = regression_data
    b = Booster({"num_boost_round": 10})
    b.fit(Xt, yt)
    p = tmp_path / "b.pkl"
    with open(p, "wb") as f:
        pickle.dump(b, f)
    with open(p, "rb") as f:
        b2 = pickle.load(f)
    np.testing.assert_allclose(b2.predict(Xv), b.predict(Xv), rtol=1e-5)


@pytest.fixture(scope="module")
def fusion_data():
    """QPP features where feature block j signals retriever j's quality."""
    rng = np.random.default_rng(1)
    retrievers = [f"r{i}" for i in range(3)]
    n_qpp, n_q = 13, 400
    X = rng.uniform(0, 1, (n_q, n_qpp * 3)).astype(np.float32)
    quality = np.stack([X[:, j * n_qpp + 5] for j in range(3)], axis=1)  # RSD col
    Y = quality / quality.sum(axis=1, keepdims=True)
    return retrievers, X, Y.astype(np.float32)


def test_per_retriever_gbdt(fusion_data):
    retrievers, X, Y = fusion_data
    m = PerRetrieverGBDT(retrievers, params={"num_boost_round": 40})
    m.train(X[:320], Y[:320], X[320:], Y[320:])
    W = m.predict(X[320:])
    assert W.shape == (80, 3)
    np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-5)
    assert np.all(W >= 0)
    # should correlate strongly with true targets
    corr = np.corrcoef(W.ravel(), Y[320:].ravel())[0, 1]
    assert corr > 0.8, corr
    assert m.feature_importance.shape == (39,)


def test_multioutput_gbdt_save_load(tmp_path, fusion_data):
    retrievers, X, Y = fusion_data
    m = MultiOutputGBDT(retrievers, params={"num_boost_round": 15})
    m.train(X[:320], Y[:320])
    path = tmp_path / "m.pkl"
    m.save(path)
    m2 = load_model(path)
    np.testing.assert_allclose(m2.predict(X[320:]), m.predict(X[320:]), rtol=1e-5)


def test_mlp_learns_soft_targets(fusion_data):
    retrievers, X, Y = fusion_data
    m = FusionMLP(retrievers, qpp_indices=[5], epochs=220, patience=60, seed=0)
    info = m.train(X[:320], Y[:320], X[320:], Y[320:])
    W = m.predict(X[320:])
    np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-5)
    corr = np.corrcoef(W.ravel(), Y[320:].ravel())[0, 1]
    assert corr > 0.7, corr
    assert info["epochs_run"] > 5


def test_mlp_filter_features(fusion_data):
    retrievers, X, _ = fusion_data
    m = FusionMLP(retrievers, qpp_indices=[5])
    Xf = m._filter_features(X)
    assert Xf.shape == (400, 3)
    np.testing.assert_array_equal(Xf[:, 1], X[:, 13 + 5])


def test_compute_targets_and_features():
    qual = np.array([[0.2, 0.0], [0.6, 0.0], [0.2, 1.0]], dtype=np.float32)  # [R=3, Q=2]
    Y = compute_targets(qual)
    np.testing.assert_allclose(Y.sum(axis=1), 1.0)
    np.testing.assert_allclose(Y[0], [0.2, 0.6, 0.2])
    qpp = {"q1": {"a": [1.0] * 13, "b": [2.0] * 13}}
    X, qids = build_features(qpp, ["a", "b"])
    assert X.shape == (1, 26) and qids == ["q1"]
    assert X[0, 0] == 1.0 and X[0, 13] == 2.0
