"""Stage-04 training pipeline: targets, splits, learned vs uniform vs oracle."""

import numpy as np
import pytest

from qpp_fusion_rag_tpu.data.runtensor import RunTensor
from qpp_fusion_rag_tpu.data.vocab import DocVocab

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



@pytest.fixture(scope="module")
def synthetic_world():
    """3 retrievers over 120 queries: retriever quality varies per query and
    the RSD QPP column (index 5) reveals which retriever is good."""
    rng = np.random.default_rng(42)
    R, Q, K, n_docs = 3, 120, 20, 400
    vocab = DocVocab()
    for d in range(n_docs):
        vocab.add(f"d{d}")

    qids = [str(i) for i in range(Q)]
    qrels = {qid: {f"d{rng.integers(0, n_docs)}": 1, f"d{rng.integers(0, n_docs)}": 1}
             for qid in qids}

    doc_ids = np.full((R, Q, K), -1, np.int32)
    scores = np.zeros((R, Q, K), np.float32)
    good = rng.integers(0, R, size=Q)  # which retriever is good per query
    qpp_data = {}
    for qi, qid in enumerate(qids):
        rel = [vocab.id_of(d) for d in qrels[qid]]
        for r in range(R):
            if r == good[qi]:
                # good retriever ranks the relevant docs on top
                rest = rng.choice(n_docs, K - len(rel), replace=False)
                row = rel + [x for x in rest if x not in rel][: K - len(rel)]
            else:
                row = list(rng.choice(n_docs, K, replace=False))
            doc_ids[r, qi, : len(row)] = row[:K]
            scores[r, qi] = np.sort(rng.uniform(0, 1, K))[::-1]
        qpp_data[qid] = {
            f"r{r}": [0.5] * 5 + [0.9 if r == good[qi] else 0.1] + [0.5] * 7
            for r in range(R)
        }
    rt = RunTensor(doc_ids, scores, qids, [f"r{r}" for r in range(R)], vocab)
    return rt, qpp_data, qrels


def test_build_training_data(synthetic_world):
    from qpp_fusion_rag_tpu.train.fusion_trainer import build_training_data

    rt, qpp_data, qrels = synthetic_world
    X, Y, quality, qids = build_training_data(rt, qpp_data, qrels)
    assert X.shape == (120, 39) and Y.shape == (120, 3)
    assert quality.shape == (3, 120)
    np.testing.assert_allclose(Y.sum(axis=1), 1.0, atol=1e-6)


def test_train_fusion_models_learned_beats_uniform(synthetic_world):
    from qpp_fusion_rag_tpu.train.fusion_trainer import train_fusion_models

    rt, qpp_data, qrels = synthetic_world
    results = train_fusion_models(
        rt, qpp_data, qrels, model_types=("per_retriever", "mlp"),
    )
    base = results["_baselines"]
    assert base["oracle"] >= base["uniform"]
    learned = results["per_retriever"]["fused_nDCG@10"]
    # QPP features perfectly reveal the good retriever -> learned must beat uniform
    assert learned > base["uniform"] + 0.02, (learned, base)
    assert learned <= base["oracle"] + 0.05
    mlp = results["mlp"]["fused_nDCG@10"]
    assert mlp > base["uniform"] - 0.02, (mlp, base)


def test_models_saved(tmp_path, synthetic_world):
    from qpp_fusion_rag_tpu.train.fusion_trainer import train_fusion_models
    from qpp_fusion_rag_tpu.models import load_model

    rt, qpp_data, qrels = synthetic_world
    results = train_fusion_models(
        rt, qpp_data, qrels, model_types=("multioutput",), output_dir=tmp_path,
    )
    m = load_model(results["multioutput"]["path"])
    W = m.predict(np.zeros((2, 39), np.float32))
    assert W.shape == (2, 3)


def test_no_test_leakage_into_early_stopping(synthetic_world, monkeypatch):
    """The validation set passed to model.train must come from the train
    portion; no test-slice row may be shown to the model before predict()."""
    from qpp_fusion_rag_tpu.train import fusion_trainer

    rt, qpp_data, qrels = synthetic_world
    seen = {}

    class SpyModel:
        def __init__(self, retrievers, seed=0):
            self.retrievers = retrievers

        def train(self, X_tr, Y_tr, X_val, Y_val):
            seen["tr"], seen["val"] = np.asarray(X_tr), np.asarray(X_val)
            return {}

        def predict(self, X):
            seen["te"] = np.asarray(X)
            R = len(self.retrievers)
            return np.full((len(X), R), 1.0 / R, np.float32)

    monkeypatch.setattr(fusion_trainer, "get_model_class", lambda name: SpyModel)
    fusion_trainer.train_fusion_models(rt, qpp_data, qrels, model_types=("spy",))

    X, _, _, _ = fusion_trainer.build_training_data(rt, qpp_data, qrels)
    n_train = seen["tr"].shape[0] + seen["val"].shape[0]
    assert seen["val"].shape[0] >= 1
    assert n_train + seen["te"].shape[0] == len(X)
    # fit + val together are exactly the first n_train rows, in order; the
    # test slice is exactly the remainder -> no positional overlap
    np.testing.assert_array_equal(
        np.concatenate([seen["tr"], seen["val"]]), X[:n_train]
    )
    np.testing.assert_array_equal(seen["te"], X[n_train:])
