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

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



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


# -- regression: review findings (models) --------------------------------------

def test_booster_truncates_to_best_on_budget_exhaustion():
    """If the round budget ends during a bad validation streak (shorter than
    the patience), the kept ensemble must still be the best-val prefix."""
    from qpp_fusion_rag_tpu.models.gbdt import Booster

    rng = np.random.default_rng(0)
    X = rng.normal(size=(120, 5)).astype(np.float32)
    y = X[:, 0] * 2 + rng.normal(scale=0.1, size=120)
    # validation from a DIFFERENT distribution so late trees overfit
    Xv = rng.normal(size=(40, 5)).astype(np.float32) + 3.0
    yv = -Xv[:, 0] + rng.normal(scale=0.1, size=40)
    b = Booster({"num_boost_round": 30, "early_stopping_rounds": 1000,
                 "num_leaves": 8, "learning_rate": 0.3})
    info = b.fit(X, y, Xv, yv)
    vm = info["history"]["val_mse"]
    best_round = int(np.argmin(vm)) + 1
    assert info["n_trees"] == len(b.trees) == best_round
    # reported best matches the kept ensemble's actual val error
    pred = b.predict(Xv, device=False)
    assert np.mean((yv - pred) ** 2) == pytest.approx(info["best_val_mse"], rel=1e-6)


def test_booster_xval_without_yval_is_no_validation():
    from qpp_fusion_rag_tpu.models.gbdt import Booster

    rng = np.random.default_rng(0)
    X = rng.normal(size=(60, 4)).astype(np.float32)
    y = X[:, 0] + rng.normal(scale=0.1, size=60)
    b = Booster({"num_boost_round": 5})
    info = b.fit(X, y, X_val=X, y_val=None)     # must not crash
    assert info["best_val_mse"] is None


def test_build_features_short_qpp_rows_zero_padded():
    from qpp_fusion_rag_tpu.models.base import build_features

    qpp = {"q1": {"r0": [0.1, 0.2], "r1": [0.5] * 13}}
    X, qids = build_features(qpp, ["r0", "r1"])
    assert X.shape == (1, 26)
    assert X[0, 0] == pytest.approx(0.1) and X[0, 1] == pytest.approx(0.2)
    assert (X[0, 2:13] == 0).all()              # missing cells stay 0
    assert (X[0, 13:] == 0.5).all()


def test_bagging_freq_reuses_bag_between_redraws():
    """bagging_freq=N must reuse the same bag for N iterations (LightGBM
    semantics): with a fixed seed, freq=5 draws fewer distinct bags than
    freq=1 over the same rounds."""
    from qpp_fusion_rag_tpu.models import gbdt as G

    draws = []
    orig = np.random.default_rng

    class SpyRng:
        def __init__(self, rng):
            self._r = rng

        def choice(self, *a, **kw):
            out = self._r.choice(*a, **kw)
            if kw.get("size") and a[0] == 100:  # row bags only (n=100)
                draws.append(1)
            return out

        def __getattr__(self, k):
            return getattr(self._r, k)

    rng = np.random.default_rng(0)
    X = rng.normal(size=(100, 4)).astype(np.float32)
    y = X[:, 0]
    params = {"num_boost_round": 10, "bagging_fraction": 0.5, "bagging_freq": 5,
              "feature_fraction": 1.0}
    b = G.Booster(params)
    import unittest.mock as mock
    with mock.patch.object(np.random, "default_rng",
                           lambda seed=None: SpyRng(orig(seed))):
        b.fit(X, y)
    assert len(draws) == 2                      # rounds 0 and 5 only


def test_booster_refit_replaces_model():
    """Refitting a Booster must train a fresh model, not append trees."""
    import numpy as np

    from qpp_fusion_rag_tpu.models.gbdt import Booster

    rng = np.random.default_rng(0)
    X1 = rng.standard_normal((64, 4)).astype(np.float32)
    y1 = X1[:, 0] * 2.0
    X2 = rng.standard_normal((64, 4)).astype(np.float32)
    y2 = -X2[:, 1]
    b = Booster({"n_estimators": 10})
    b.fit(X1, y1)
    b.fit(X2, y2)
    fresh = Booster({"n_estimators": 10})
    fresh.fit(X2, y2)
    assert len(b.trees) == len(fresh.trees)
    np.testing.assert_allclose(b.predict(X2), fresh.predict(X2), rtol=1e-6)


def test_mlp_train_without_yval_does_not_crash():
    import numpy as np

    from qpp_fusion_rag_tpu.models.mlp import FusionMLP

    rng = np.random.default_rng(0)
    X = rng.standard_normal((32, 65)).astype(np.float32)
    Y = np.abs(rng.standard_normal((32, 5))).astype(np.float32)
    Y = Y / Y.sum(axis=1, keepdims=True)
    m = FusionMLP([f"r{i}" for i in range(5)], epochs=2)
    m.train(X, Y, X_val=X[:4], Y_val=None)   # must not crash
