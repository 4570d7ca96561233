"""End-to-end QPP signal: COMPUTED statistics (not injected) improve fusion.

The paper's core mechanism: retrievers that answer a query well produce
peaked score distributions; QPP statistics detect this and weight fusion
toward the per-query best retriever. This test builds runs where score
shape genuinely correlates with quality and checks that the full computed
path (qpp kernel -> cross-query normalization -> weighted fusion) beats
unweighted fusion.
"""

import numpy as np
import pytest

from qpp_fusion_rag_tpu.config import config
from qpp_fusion_rag_tpu.data.runtensor import RunTensor
from qpp_fusion_rag_tpu.data.vocab import DocVocab
from qpp_fusion_rag_tpu.evaluation.ir_evaluator import IREvaluator
from qpp_fusion_rag_tpu.fusion.engine import run_fusion
from qpp_fusion_rag_tpu.qpp.engine import compute_qpp_for_runtensor, qpp_tensor_to_dict

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    R, Q, K, n_docs = 3, 60, 30, 800
    vocab = DocVocab()
    for d in range(n_docs):
        vocab.add(f"d{d}")
    qids = [str(i) for i in range(Q)]
    qrels = {q: {f"d{int(q)}": 1, f"d{int(q) + 60}": 1} for q in qids}

    doc_ids = np.full((R, Q, K), -1, np.int32)
    scores = np.zeros((R, Q, K), np.float32)
    for qi, q in enumerate(qids):
        good = qi % R
        rel = [vocab.id_of(f"d{int(q)}"), vocab.id_of(f"d{int(q) + 60}")]
        for r in range(R):
            if r == good:
                # confident retriever: relevant docs on top, PEAKED scores
                rest = [d for d in rng.choice(np.arange(200, n_docs), K, replace=False)
                        if d not in rel][: K - 2]
                doc_ids[r, qi] = rel + rest
                scores[r, qi] = 5.0 * (0.75 ** np.arange(K)) + rng.uniform(0, 0.01, K)
            else:
                # unconfident retriever: random docs, FLAT scores
                doc_ids[r, qi] = rng.choice(np.arange(200, n_docs), K, replace=False)
                scores[r, qi] = 1.0 + np.sort(rng.uniform(0, 0.05, K))[::-1]
    return RunTensor(doc_ids, scores, qids, [f"r{r}" for r in range(R)], vocab), qrels


def test_computed_qpp_weights_beat_unweighted(world):
    rt, qrels = world
    # QPP computed from the RAW score distributions (nothing injected)
    qpp = compute_qpp_for_runtensor(rt)
    qpp_dict = qpp_tensor_to_dict(qpp, rt.qids, rt.retrievers)

    ev = IREvaluator(["nDCG@10"])
    rt_norm = rt.minmax_normalized()
    base = ev.evaluate(run_fusion("combsum", rt_norm, qpp=qpp_dict), qrels)["nDCG@10"]

    # weight by computed NQC (variance): peaked >> flat. Names resolve to
    # the kernel's column layout, so "NQC" selects the nqc column directly
    # (the reference's method_index table indexed a different file layout).
    assert config.get_qpp_index("NQC") == 0
    weighted = ev.evaluate(
        run_fusion("wcombsum", rt_norm, qpp=qpp_dict, qpp_model="NQC"), qrels
    )["nDCG@10"]

    assert weighted > base + 0.1, (weighted, base)
    assert weighted > 0.5


def test_computed_qpp_separates_confident_retrievers(world):
    rt, qrels = world
    qpp = compute_qpp_for_runtensor(rt, normalize="none")
    # raw NQC (col 0) of the confident retriever must exceed the flat ones
    nqc = qpp[:, :, 0]                       # [R, Q]
    for qi in range(rt.Q):
        good = qi % rt.R
        others = [r for r in range(rt.R) if r != good]
        assert nqc[good, qi] > max(nqc[r, qi] for r in others)
