"""Interop with REAL reference artifacts (skipped when not mounted).

The reference checkout ships real scifact QPP files (300 queries × 5
retrievers × 13 scores), queries.jsonl and qrels; run files are git-LFS
stubs. These tests validate our file-format layer and weighted fusion
against the genuine artifacts.
"""

from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/data/scifact")

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not REF.exists(), reason="reference data not mounted")]


def test_load_real_qpp_files():
    from qpp_fusion_rag_tpu.data.loaders import load_qpp_scores

    qpp = load_qpp_scores(REF / "qpp", suffix=".mmnorm.qpp")
    # 5 retrievers, ~300 scifact test queries, 13 scores each
    assert len(qpp) >= 200
    any_q = next(iter(qpp.values()))
    assert len(any_q) == 5
    for scores in any_q.values():
        assert len(scores) == 13
        assert all(0.0 <= s <= 1.0 + 1e-6 for s in scores)  # min-max normalized


def test_real_qrels_and_queries():
    from qpp_fusion_rag_tpu.data.loaders import load_qrels, load_queries

    qrels = load_qrels(REF / "BEIR-scifact" / "qrels" / "test.tsv")
    assert len(qrels) == 300
    queries = load_queries(REF / "BEIR-scifact")
    assert len(queries) == 300           # split-filtered to qrels
    assert all(isinstance(t, str) and t for t in queries.values())


def test_weighted_fusion_with_real_qpp():
    """QPP-weighted fusion over synthetic runs keyed by the REAL scifact
    qids/retrievers/QPP weights — exercises get_qpp_weight + method_index
    against genuine artifact content."""
    from qpp_fusion_rag_tpu.data.loaders import load_qpp_scores
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor
    from qpp_fusion_rag_tpu.data.vocab import DocVocab
    from qpp_fusion_rag_tpu.fusion.engine import run_fusion, weights_from_qpp

    qpp = load_qpp_scores(REF / "qpp", suffix=".mmnorm.qpp")
    qids = sorted(qpp.keys(), key=lambda x: int(x))[:50]
    retrievers = sorted(next(iter(qpp.values())).keys())

    W = weights_from_qpp(qpp, qids, retrievers, qpp_index=5)  # RSD
    assert W.shape == (5, 50)
    assert np.all(W >= 0) and np.all(W <= 1 + 1e-6)
    assert W.std() > 0  # real signal, not constant

    rng = np.random.default_rng(0)
    vocab = DocVocab()
    K = 20
    doc_ids = rng.integers(0, 500, (5, 50, K)).astype(np.int32)
    for d in range(500):
        vocab.add(f"doc{d}")
    scores = np.sort(rng.uniform(0, 1, (5, 50, K)).astype(np.float32))[..., ::-1]
    rt = RunTensor(doc_ids, np.ascontiguousarray(scores), qids, retrievers, vocab)

    fused = run_fusion("wcombsum", rt, qpp=qpp, qpp_model="RSD")
    assert fused.Q == 50
    assert fused.retrievers == ["wcombsum-rsd"]
    s = fused.scores[0]
    valid = fused.doc_ids[0] >= 0
    assert np.isfinite(s[valid]).all()


HOTPOT = Path("/root/reference/data/hotpotqa/BEIR-hotpotqa")


@pytest.mark.skipif(not HOTPOT.exists(), reason="reference data not mounted")
def test_hotpotqa_scale_pipeline(tmp_path):
    """Full tensor pipeline at real hotpotqa scale: 7.4k REAL hex qids
    (stresses mixed qid sorting), synthetic runs over real qrels docs."""
    from qpp_fusion_rag_tpu.data.loaders import load_qrels, write_run_file
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor
    from qpp_fusion_rag_tpu.evaluation.ir_evaluator import IREvaluator
    from qpp_fusion_rag_tpu.fusion.engine import run_fusion
    from qpp_fusion_rag_tpu.qpp.engine import compute_qpp_for_runtensor, qpp_tensor_to_dict

    qrels = load_qrels(HOTPOT / "qrels" / "test.tsv")
    assert len(qrels) == 7405
    qids = sorted(qrels.keys())
    doc_pool = sorted({d for rel in qrels.values() for d in rel})
    rng = np.random.default_rng(0)

    # synthetic 3-retriever runs: r0 ranks each query's relevant docs first
    runs_dir = tmp_path / "runs"
    runs_dir.mkdir()
    K = 20
    pool_arr = np.array(doc_pool)
    for r in range(3):
        run = {}
        for qid in qids:
            rel = list(qrels[qid]) if r == 0 else []
            rand = pool_arr[rng.integers(0, len(pool_arr), K)]
            docs = (rel + [d for d in rand if d not in qrels[qid]])[:K]
            # per-(query, retriever) random score shapes so QPP statistics
            # vary across queries (constant scores would min-max normalize
            # every QPP weight to zero — degenerate by construction)
            scores = np.sort(rng.uniform(0.05, 1.0, len(docs)))[::-1]
            run[qid] = list(zip(docs, scores.tolist()))
        write_run_file(run, runs_dir / f"r{r}.norm.res", tag=f"r{r}")

    rt = RunTensor.from_trec_dir(runs_dir, use_normalized=True)
    assert rt.Q == 7405 and rt.R == 3

    # QPP over 7405 real qids (mixed hex/numeric must not raise)
    qpp = compute_qpp_for_runtensor(rt)
    assert qpp.shape == (3, 7405, 13)
    qpp_dict = qpp_tensor_to_dict(qpp, rt.qids, rt.retrievers)

    fused = run_fusion("wcombsum", rt, qpp=qpp_dict, qpp_model="RSD",
                       output_path=tmp_path / "fused.res")
    ev = IREvaluator(["nDCG@10"])
    fused_score = ev.evaluate(fused, qrels)["nDCG@10"]
    r0 = ev.evaluate(rt, qrels, retriever="r0")["nDCG@10"]
    assert r0 > 0.9            # r0 plants all relevant docs on top
    assert fused_score > 0.3   # fusion keeps much of r0's signal

    # written TREC file round-trips with the hex qids intact
    from qpp_fusion_rag_tpu.data.loaders import load_run_file

    back = load_run_file(tmp_path / "fused.res")
    assert len(back) == 7405
    assert "5a8b57f25542995d1e6f1371" in back

    # oracle + argmax-QPP selection also handle 7.4k-query scale
    from qpp_fusion_rag_tpu.fusion.argmax_qpp import argmax_qpp_experiment
    from qpp_fusion_rag_tpu.fusion.oracle import oracle_report

    rep = oracle_report(rt, qrels)
    assert rep["oracle_metric"] >= rep["best_single"] - 1e-9
    assert sum(rep["selection_histogram"].values()) == 7405
    sel = argmax_qpp_experiment(rt, qpp_dict, qrels, qpp_indices=[5])
    assert "RSD" in sel and 0.0 <= sel["RSD"]["nDCG@10"] <= 1.0
