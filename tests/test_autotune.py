"""Sparse-engine autotuner: cheapest config meeting the recall target."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



@pytest.fixture(scope="module")
def built_index():
    from qpp_fusion_rag_tpu.index.sparse import SparseIndex

    rng = np.random.default_rng(7)
    vocab = [f"w{j}" for j in range(120)]
    docs = [(f"d{i}", " ".join(rng.choice(vocab, 14))) for i in range(800)]
    idx = SparseIndex.build_bm25(docs)
    idx.quantize()
    queries = [" ".join(rng.choice(vocab, 3)) for _ in range(24)]
    return idx, queries


def test_autotune_picks_feasible_cheapest(built_index):
    from qpp_fusion_rag_tpu.index.autotune import autotune_sparse

    idx, queries = built_index
    cfg = autotune_sparse(idx, queries, k=10, target_recall=0.9,
                          p_caps=(16, 64), candidate_sizes=(64, 256))
    assert cfg.sweep and len(cfg.sweep) == 2 * (1 + 2)
    assert cfg.engine in ("q8", "q8r")
    if cfg.meets_target:
        assert cfg.recall >= 0.9
        # no feasible config in the sweep is cheaper
        for s in cfg.sweep:
            if s["recall"] >= 0.9:
                assert cfg.cost <= s["cost"]
    # the chosen config reproduces its measured recall through the
    # public search API (same 4k-deep tie-aware measure)
    k_deep = min(40, idx.num_docs)
    s_ex, i_ex = idx.search(queries, k=k_deep, p_cap=idx.max_df,
                            engine="exact", exact_topk=True)
    got_s, got_i = idx.search(queries, k=10, p_cap=cfg.p_cap,
                              engine=cfg.engine,
                              candidates=cfg.candidates or 2048)
    from qpp_fusion_rag_tpu.index.autotune import _recall_at_k
    assert abs(_recall_at_k(s_ex, i_ex, got_i, 10) - cfg.recall) < 1e-9


def test_autotune_unreachable_target_flags_best_effort(built_index):
    from qpp_fusion_rag_tpu.index.autotune import autotune_sparse

    idx, queries = built_index
    # p_cap=1 truncates hard; a 1.0 target with those caps should fail
    cfg = autotune_sparse(idx, queries, k=10, target_recall=1.01,
                          p_caps=(1,), candidate_sizes=(16,))
    assert not cfg.meets_target
    assert cfg.recall == max(s["recall"] for s in cfg.sweep)


def test_autotune_cli(built_index, tmp_path):
    import json

    from qpp_fusion_rag_tpu.pipeline.autotune import main

    idx, queries = built_index
    idx.save(tmp_path / "bm25")
    with open(tmp_path / "queries.jsonl", "w") as f:
        for i, q in enumerate(queries):
            f.write(json.dumps({"_id": str(i), "text": q}) + "\n")
    out = tmp_path / "tuned.json"
    rc = main(["--index-dir", str(tmp_path / "bm25"),
               "--queries", str(tmp_path / "queries.jsonl"),
               "--k", "10", "--target-recall", "0.8",
               "--p-caps", "16", "64", "--candidates", "64",
               "--output", str(out)])
    assert rc == 0
    tuned = json.loads(out.read_text())
    assert tuned["chosen"]["engine"] in ("q8", "q8r")
    assert len(tuned["sweep"]) == 2 * 2


@pytest.fixture(scope="module")
def dense_index():
    from qpp_fusion_rag_tpu.retrievers.dense import DenseIndex

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((600, 48)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    idx = DenseIndex(emb, [f"d{i}" for i in range(600)], shuffle=False)
    q = emb[rng.choice(600, 20, replace=False)] \
        + 0.05 * rng.standard_normal((20, 48)).astype(np.float32)
    return idx, q.astype(np.float32)


def test_autotune_dense_picks_feasible_cheapest(dense_index):
    from qpp_fusion_rag_tpu.index.autotune import autotune_dense

    idx, q = dense_index
    cfg = autotune_dense(idx, q, k=10, target_recall=0.9,
                         rescore_pools=(32, 128))
    assert len(cfg.sweep) >= 3          # int8 + two pools
    assert cfg.engine in ("int8", "int8r", "stream")
    if cfg.meets_target:
        assert cfg.recall >= 0.9
        for s in cfg.sweep:
            if s["recall"] >= 0.9:
                assert cfg.cost <= s["cost"]
    # the chosen config reproduces its recall through the public API
    if cfg.engine != "stream":
        from qpp_fusion_rag_tpu.index.autotune import _recall_at_k

        k_deep = min(40, idx.num_docs)
        s_ex, i_ex = idx.search(q, k=k_deep, engine="stream", exact=True)
        _, got = idx.search(q, k=10, engine=cfg.engine,
                            rescore_pool=cfg.rescore_pool or 512)
        assert abs(_recall_at_k(s_ex, i_ex, got, 10) - cfg.recall) < 1e-9


def test_autotune_dense_unreachable_target_escalates(dense_index):
    from qpp_fusion_rag_tpu.index.autotune import autotune_dense

    idx, q = dense_index
    cfg = autotune_dense(idx, q, k=10, target_recall=1.01,
                         rescore_pools=(32,))
    assert not cfg.meets_target
    assert cfg.engine == "stream"       # escalation is always feasible
    assert cfg.recall == 1.0


def test_autotune_dense_cli(dense_index, tmp_path):
    import json

    from qpp_fusion_rag_tpu.pipeline.autotune import main

    idx, q = dense_index
    idx_dir = tmp_path / "dense"
    idx.save(idx_dir)
    np.save(tmp_path / "q.npy", q)
    out = tmp_path / "tuned_dense.json"
    rc = main(["--dense", "--index-dir", str(idx_dir),
               "--query-emb", str(tmp_path / "q.npy"),
               "--k", "10", "--target-recall", "0.9",
               "--rescore-pools", "32", "128",
               "--output", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["chosen"]["engine"] in ("int8", "int8r", "stream")
    assert 0.0 <= data["chosen"]["recall"] <= 1.0
