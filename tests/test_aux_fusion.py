"""Oracle baseline, ProbFuse, argmax-QPP selection."""

import numpy as np
import pytest

from qpp_fusion_rag_tpu.data.runtensor import RunTensor
from qpp_fusion_rag_tpu.data.vocab import DocVocab


@pytest.fixture(scope="module")
def world():
    """2 retrievers, 30 queries; r0 is good on even queries, r1 on odd."""
    rng = np.random.default_rng(0)
    R, Q, K, n_docs = 2, 30, 10, 200
    vocab = DocVocab()
    for d in range(n_docs):
        vocab.add(f"d{d}")
    qids = [str(i) for i in range(Q)]
    qrels = {q: {f"d{int(q) * 2}": 1} for q in qids}
    doc_ids = np.full((R, Q, K), -1, np.int32)
    scores = np.tile(np.linspace(1, 0.1, K, dtype=np.float32), (R, Q, 1))
    for qi, q in enumerate(qids):
        rel = vocab.id_of(f"d{int(q) * 2}")
        good = qi % 2
        for r in range(R):
            row = list(rng.choice(n_docs, K, replace=False))
            if r == good:
                row[0] = rel
            elif rel in row:
                row.remove(rel)
                row.append(0)
            doc_ids[r, qi] = row
    rt = RunTensor(doc_ids, scores, qids, ["r0", "r1"], vocab)
    return rt, qrels


def test_oracle(world):
    from qpp_fusion_rag_tpu.fusion.oracle import oracle_report

    rt, qrels = world
    rep = oracle_report(rt, qrels)
    # oracle picks the good retriever each time -> near-perfect nDCG
    assert rep["oracle_metric"] > 0.95
    assert rep["headroom"] > 0.3
    # roughly half the queries select each retriever
    h = rep["selection_histogram"]
    assert 10 <= h["r0"] <= 20 and 10 <= h["r1"] <= 20
    assert rep["oracle"]["nDCG@10"] == pytest.approx(rep["oracle_metric"], abs=1e-5)


def test_probfuse(world):
    from qpp_fusion_rag_tpu.fusion.probfuse import ProbFuse, probfuse_experiment

    rt, qrels = world
    qids = rt.qids
    res = probfuse_experiment(
        rt, qrels, train_qids=qids[:20], test_qids=qids[20:],
        x=5, depth=10,
    )
    assert set(res["probs"].keys()) == {"r0", "r1"}
    p0 = np.asarray(res["probs"]["r0"])
    # early segments should carry the relevance mass (planted at rank 1)
    assert p0[0] >= p0[-1]
    assert 0.0 <= res["nDCG@10"] <= 1.0
    assert res["fused"].doc_ids.shape[0] == 1


def test_argmax_qpp(world):
    from qpp_fusion_rag_tpu.fusion.argmax_qpp import (
        argmax_qpp_experiment,
        qpp_index_names,
    )

    rt, qrels = world
    # QPP column 5 (RSD) perfectly signals the good retriever
    qpp_data = {}
    for qi, q in enumerate(rt.qids):
        good = qi % 2
        qpp_data[q] = {
            f"r{r}": [0.5] * 5 + [0.9 if r == good else 0.1] + [0.5] * 7
            for r in range(2)
        }
    out = argmax_qpp_experiment(rt, qpp_data, qrels, qpp_indices=[5, 0])
    names = qpp_index_names()                     # kernel column order
    assert names[5] == "RSD" and names[0] == "nqc"
    assert out["RSD"]["nDCG@10"] > 0.95          # perfect selection signal
    assert out["nqc"]["nDCG@10"] < out["RSD"]["nDCG@10"]  # ties -> argmax=r0 always
