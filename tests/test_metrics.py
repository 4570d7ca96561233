import numpy as np
import pytest

from qpp_fusion_rag_tpu.data.vocab import DocVocab
from qpp_fusion_rag_tpu.evaluation.ir_evaluator import IREvaluator, compute_ndcg
from qpp_fusion_rag_tpu.ops import metrics as M


def _align(run_docs, qrels_row, vocab=None, K=None):
    vocab = vocab or DocVocab()
    K = K or len(run_docs)
    ids = np.full((1, K), -1, dtype=np.int32)
    for i, d in enumerate(run_docs[:K]):
        ids[0, i] = vocab.add(d)
    return M.align_relevance(ids, ["q"], {"q": qrels_row}, vocab)


@pytest.mark.slow
def test_ndcg_matches_sklearn(rng):
    from sklearn.metrics import ndcg_score

    for _ in range(25):
        n = 30
        rels = rng.integers(0, 4, size=n)  # graded relevance per doc
        scores = rng.normal(size=n)
        order = np.argsort(-scores)
        run_docs = [f"d{i}" for i in order]
        qrels_row = {f"d{i}": int(r) for i, r in enumerate(rels) if r > 0}
        if not qrels_row:
            continue
        k = int(rng.integers(1, n + 1))
        gains, n_rel, ideal = _align(run_docs, qrels_row)
        ours = float(M.ndcg_at(gains, ideal, k)[0])
        ref = ndcg_score(rels[None, :].astype(float), scores[None, :], k=k)
        assert ours == pytest.approx(ref, abs=2e-5)  # f32 kernel vs f64 oracle


def test_rr_recall_precision_ap_handcomputed():
    # run: d1(rel), d2, d3(rel), d4 ; qrels has 3 relevant docs (d1,d3,d9)
    gains, n_rel, ideal = _align(["d1", "d2", "d3", "d4"], {"d1": 1, "d3": 2, "d9": 1})
    assert float(M.rr_at(gains, 10)[0]) == 1.0
    gains2, _, _ = _align(["d2", "d4", "d3"], {"d1": 1, "d3": 2, "d9": 1})
    assert float(M.rr_at(gains2, 10)[0]) == pytest.approx(1 / 3)
    assert float(M.rr_at(gains2, 2)[0]) == 0.0

    assert float(M.recall_at(gains, n_rel, 1)[0]) == pytest.approx(1 / 3)
    assert float(M.recall_at(gains, n_rel, 4)[0]) == pytest.approx(2 / 3)
    assert float(M.precision_at(gains, 4)[0]) == pytest.approx(2 / 4)
    assert float(M.precision_at(gains, 10)[0]) == pytest.approx(2 / 10)

    # AP = (P@1 + P@3)/n_rel = (1 + 2/3)/3
    assert float(M.average_precision(gains, n_rel)[0]) == pytest.approx((1 + 2 / 3) / 3)


def test_no_relevant_query_zero():
    gains, n_rel, ideal = _align(["d1", "d2"], {})
    assert float(M.ndcg_at(gains, ideal, 10)[0]) == 0.0
    assert float(M.average_precision(gains, n_rel)[0]) == 0.0
    assert float(M.recall_at(gains, n_rel, 5)[0]) == 0.0


def test_compute_ndcg_list_helper():
    # perfect ranking -> 1.0
    assert compute_ndcg(["a", "b"], {"a": 2, "b": 1}, k=10) == pytest.approx(1.0)
    # swapped ranking on graded rels
    val = compute_ndcg(["b", "a"], {"a": 2, "b": 1}, k=10)
    expected = (1 / np.log2(2) + 2 / np.log2(3)) / (2 / np.log2(2) + 1 / np.log2(3))
    assert val == pytest.approx(expected, abs=1e-9)
    assert compute_ndcg([], {"a": 1}) == 0.0
    assert compute_ndcg(["a"], {}) == 0.0


def test_ir_evaluator_end_to_end():
    run = {
        "1": [("d1", 0.9), ("d2", 0.8), ("d3", 0.7)],
        "2": [("d9", 0.9), ("d1", 0.2)],
        "3": [("dX", 1.0)],  # unjudged query — excluded from aggregate
    }
    qrels = {"1": {"d1": 1, "d3": 1}, "2": {"d1": 1}}
    ev = IREvaluator(metrics=["nDCG@10", "RR@10", "R@10", "P@10", "AP"])
    agg = ev.evaluate(run, qrels)
    pq = ev.evaluate(run, qrels, per_query=True)
    assert set(pq["AP"]) == {"1", "2"}  # unjudged q3 excluded
    assert agg["RR@10"] == pytest.approx((1.0 + 0.5) / 2)
    assert agg["R@10"] == pytest.approx((1.0 + 1.0) / 2)
    # aggregate is the mean of per-query
    assert agg["AP"] == pytest.approx(np.mean(list(pq["AP"].values())))

    df = ev.evaluate_multiple({"runA": run}, qrels)
    assert df.loc["runA", "RR@10"] == pytest.approx(agg["RR@10"])


def test_evaluator_on_runtensor():
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor

    runs = {
        "A": {"1": [("d1", 2.0, 1), ("d2", 1.0, 2)]},
        "B": {"1": [("d2", 5.0, 1), ("d1", 1.0, 2)]},
    }
    rt = RunTensor.from_run_dicts(runs)
    qrels = {"1": {"d1": 1}}
    ev = IREvaluator(metrics=["nDCG@10", "RR@10"])
    res = ev.evaluate_runtensor(rt, qrels)
    assert res["A"]["RR@10"] == 1.0
    assert res["B"]["RR@10"] == 0.5
    assert res["A"]["nDCG@10"] == 1.0


def test_per_query_metric_matrix():
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor
    from qpp_fusion_rag_tpu.evaluation.ir_evaluator import per_query_metric

    runs = {
        "A": {"1": [("d1", 2.0, 1)], "2": [("d9", 1.0, 1)]},
        "B": {"1": [("dZ", 5.0, 1)], "2": [("d8", 9.0, 1), ("d9", 2.0, 2)]},
    }
    rt = RunTensor.from_run_dicts(runs)
    qrels = {"1": {"d1": 1}, "2": {"d9": 1}}
    mat = per_query_metric(rt, qrels, "nDCG@10")
    assert mat.shape == (2, 2)
    assert mat[0, 0] == 1.0 and mat[1, 0] == 0.0
    assert mat[0, 1] == 1.0
    assert 0 < mat[1, 1] < 1.0  # d9 at rank 2 -> 1/log2(3)


def test_ndcg_truncated_run_deeper_cutoff():
    """trec_eval semantics: IDCG@k sums min(k, n_rel) ideal gains even
    when the RUN is shallower than k (regression: IDCG truncated at run
    depth inflated nDCG to 1.0 on fully-relevant truncated runs)."""
    import numpy as np

    from qpp_fusion_rag_tpu.data.vocab import DocVocab
    from qpp_fusion_rag_tpu.ops import metrics as M

    vocab = DocVocab()
    docs = [f"d{i}" for i in range(8)]
    ids = np.array([[vocab.add(d) for d in docs[:3]]], dtype=np.int32)
    qrels = {"q": {f"d{i}": 1 for i in range(5)}}       # 5 relevant
    gains, n_rel, ideal = M.align_relevance(ids, ["q"], qrels, vocab,
                                            ideal_k=10)
    got = float(M.ndcg_at(gains, ideal, 10)[0])
    d = 1.0 / np.log2(np.arange(2, 12))
    want = d[:3].sum() / d[:5].sum()                    # DCG@3 / IDCG@5
    assert got == pytest.approx(want, abs=1e-6)
    assert got < 0.999                                   # NOT 1.0


def test_load_qrels_classic_trec_format(tmp_path):
    from qpp_fusion_rag_tpu.data.loaders import load_qrels

    p = tmp_path / "qrels.txt"
    p.write_text("1 0 d7 2\n1 0 d9 0\n2 0 d1 1\n")
    q = load_qrels(p)
    assert q == {"1": {"d7": 2, "d9": 0}, "2": {"d1": 1}}
