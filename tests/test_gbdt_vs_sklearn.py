"""GBDT quality cross-check vs sklearn's GradientBoostingRegressor."""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")
from sklearn.ensemble import GradientBoostingRegressor

from qpp_fusion_rag_tpu.models.gbdt import Booster

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



def test_booster_quality_close_to_sklearn():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((800, 12)).astype(np.float32)
    y = (np.sin(X[:, 0]) + 0.5 * X[:, 1] * X[:, 2] + 0.3 * np.maximum(X[:, 3], 0)
         + 0.05 * rng.standard_normal(800))
    Xt, yt, Xv, yv = X[:600], y[:600], X[600:], y[600:]

    ours = Booster({"num_boost_round": 150, "learning_rate": 0.1,
                    "feature_fraction": 1.0, "bagging_fraction": 1.0,
                    "min_data_in_leaf": 5})
    ours.fit(Xt, yt)
    mse_ours = float(np.mean((ours.predict(Xv, device=False) - yv) ** 2))

    ref = GradientBoostingRegressor(n_estimators=150, learning_rate=0.1,
                                    max_depth=5, random_state=0)
    ref.fit(Xt, yt)
    mse_ref = float(np.mean((ref.predict(Xv) - yv) ** 2))

    base = float(np.mean((yt.mean() - yv) ** 2))
    # both must crush the mean baseline; ours within 2x of sklearn's MSE
    assert mse_ours < 0.3 * base, (mse_ours, base)
    assert mse_ours < 2.0 * mse_ref, (mse_ours, mse_ref)
