"""Reference-pickle interop (VERDICT r3 task #5).

Loads the reference's REAL trained fusion models
(reference data/scifact/models/fusion_*.pkl) through the shim unpickler,
converts LightGBM boosters / the torch MLP to this repo's device formats,
and verifies inference against independent oracles. Skipped when the
reference tree is absent.
"""

import numpy as np
import pytest

from pathlib import Path

REF = Path("/root/reference/data/scifact")

pytestmark = pytest.mark.skipif(
    not (REF / "models/fusion_multioutput.pkl").exists(),
    reason="reference scifact models not available",
)


@pytest.fixture(scope="module")
def real_features():
    from qpp_fusion_rag_tpu.data.loaders import load_qpp_scores
    from qpp_fusion_rag_tpu.models.base import build_features

    qpp = load_qpp_scores(REF / "qpp")
    retrievers = ["BGE", "BM25", "BM25_MonoT5", "BM25_TCT", "Splade"]
    X, _ = build_features(qpp, retrievers, 13)
    return X


@pytest.mark.parametrize("name", ["fusion_multioutput",
                                  "fusion_per_retriever", "fusion_mlp"])
@pytest.mark.slow
def test_load_and_predict_real_model(name, real_features):
    from qpp_fusion_rag_tpu.models.interop import load_reference_fusion_model

    m = load_reference_fusion_model(REF / f"models/{name}.pkl")
    assert m.retrievers == ["BGE", "BM25", "BM25_MonoT5", "BM25_TCT",
                            "Splade"]
    w = m.predict(real_features)
    assert w.shape == (300, 5)
    assert np.isfinite(w).all()
    assert (w >= 0).all()
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
    # trained models produce query-dependent weights, not a constant row
    assert w.std(axis=0).max() > 1e-3


def test_gbdt_device_matches_host_oracle():
    """Parsed booster trees: ops.trees device traversal vs the independent
    host-side traversal, on the REAL multioutput booster text."""
    from qpp_fusion_rag_tpu.models.interop import (
        _RefUnpickler, _traverse_host, booster_to_ensemble,
        parse_lgbm_model_str)
    from qpp_fusion_rag_tpu.ops.trees import predict_ensemble
    import io

    env = _RefUnpickler(
        io.BytesIO((REF / "models/fusion_multioutput.pkl").read_bytes())
    ).load()
    booster = env["model"].__dict__["models"][0]
    trees = parse_lgbm_model_str(booster.model_str)
    assert len(trees) >= 1
    ens = booster_to_ensemble(booster.model_str)

    rng = np.random.RandomState(0)
    X = rng.rand(64, 65).astype(np.float32)
    host = np.zeros(64)
    for t in trees:
        host += _traverse_host(t, X)
    dev = np.asarray(predict_ensemble(ens, X))
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)


def test_mlp_numpy_matches_torch_forward():
    """The extracted (W, b) numpy forward vs the actual unpickled torch
    module, on the real FusionMLP."""
    torch = pytest.importorskip("torch")
    from qpp_fusion_rag_tpu.models.interop import (
        _RefUnpickler, load_reference_fusion_model)
    import io

    m = load_reference_fusion_model(REF / "models/fusion_mlp.pkl")
    env = _RefUnpickler(
        io.BytesIO((REF / "models/fusion_mlp.pkl").read_bytes())).load()
    seq = env["model"].__dict__["model"]
    seq.eval()

    rng = np.random.RandomState(1)
    X = rng.rand(32, 65).astype(np.float32)
    Xf = m._filter(X) if len(m.qpp_indices) < m.n_qpp else X
    with torch.no_grad():
        ref = torch.softmax(seq(torch.FloatTensor(Xf)), dim=1).numpy()
    ours = m.predict(X)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
