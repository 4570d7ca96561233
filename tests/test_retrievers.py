"""Retriever layer: dense retriever, registry, stage-01/02 CLIs end-to-end."""

import json

import numpy as np
import pytest


def test_dense_index_and_retriever(tmp_path):
    from qpp_fusion_rag_tpu.retrievers.dense import DenseIndex, DenseRetriever

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    docnos = [f"d{i}" for i in range(200)]
    idx = DenseIndex(emb, docnos, normalize=True)
    idx.save(tmp_path / "dense")
    idx2 = DenseIndex.load(tmp_path / "dense")

    # encoder = lookup of the (normalized) doc embedding -> doc must rank #1
    # (the index shuffles rows, so resolve rows through the docno list)
    row_of = {d: i for i, d in enumerate(idx2.docnos)}

    def encoder(texts):
        return np.stack([idx2.embeddings[row_of[t]] for t in texts])

    r = DenseRetriever(idx2, encoder=encoder, exact=True)
    res = r.retrieve("d17", "q1", top_k=5)
    assert res.results[0][0] == "d17"
    batch = r.retrieve_batch({"a": "d3", "b": "d4"}, top_k=3)
    assert batch["a"].results[0][0] == "d3"
    assert batch["b"].results[0][0] == "d4"


def test_registry_unknown():
    from qpp_fusion_rag_tpu.retrievers import get_retriever

    with pytest.raises(KeyError):
        get_retriever("nope")


def test_index_and_retrieve_cli(tmp_path, tmp_dataset):
    from qpp_fusion_rag_tpu.pipeline.index import main as index_main
    from qpp_fusion_rag_tpu.pipeline.retrieve import main as retrieve_main

    idx_dir = tmp_path / "index"
    rc = index_main([
        "--corpus", str(tmp_dataset / "corpus.jsonl"),
        "--output", str(idx_dir / "bm25"),
    ])
    assert rc == 0

    runs = tmp_path / "runs"
    rc = retrieve_main([
        "--dataset-dir", str(tmp_dataset),
        "--index-dir", str(idx_dir),
        "--retrievers", "bm25",
        "--output-dir", str(runs),
        "--top-k", "10",
    ])
    assert rc == 0
    assert (runs / "bm25.res").exists() and (runs / "bm25.norm.res").exists()

    # .norm.res is per-query min-max of .res
    from qpp_fusion_rag_tpu.data.loaders import load_run_file

    raw = load_run_file(runs / "bm25.res")
    norm = load_run_file(runs / "bm25.norm.res")
    assert set(raw) == set(norm) and len(raw) > 0
    for qid in raw:
        scores = [s for _, s, _ in norm[qid]]
        assert max(scores) <= 1.0 + 1e-6 and min(scores) >= -1e-6


def test_dense_index_shuffles_clustered_order():
    """Adjacency-clustered corpora must not collapse group-max recall: the
    index shuffles rows (consistent docno permutation) at construction."""
    from qpp_fusion_rag_tpu.retrievers.dense import DenseIndex

    rng = np.random.default_rng(0)
    emb = np.arange(100, dtype=np.float32).reshape(100, 1).repeat(4, axis=1)
    docnos = [f"d{i}" for i in range(100)]
    idx = DenseIndex(emb, docnos, shuffle=True)
    # mapping stays consistent: row i's embedding belongs to docnos[i]
    for row in [0, 7, 42]:
        orig = int(idx.docnos[row][1:])
        np.testing.assert_array_equal(idx.embeddings[row], emb[orig])
    # and the order actually changed
    assert idx.docnos != docnos


def test_dense_index_load_does_not_reshuffle(tmp_path):
    from qpp_fusion_rag_tpu.retrievers.dense import DenseIndex

    rng = np.random.default_rng(1)
    idx = DenseIndex(rng.standard_normal((20, 4)).astype(np.float32),
                     [f"d{i}" for i in range(20)])
    idx.save(tmp_path / "x")
    loaded = DenseIndex.load(tmp_path / "x")
    assert loaded.docnos == idx.docnos
    np.testing.assert_array_equal(loaded.embeddings, idx.embeddings)


def test_dense_retriever_clustered_corpus_recall():
    """End-to-end: clustered corpus order + approx search keeps high recall
    because DenseIndex shuffles rows (the regression this guards measured
    recall@20 ~0.01 unshuffled on adjacency-clustered data)."""
    from qpp_fusion_rag_tpu.retrievers.dense import DenseIndex

    rng = np.random.default_rng(0)
    D, n_clusters, per = 32, 64, 64
    centers = rng.standard_normal((n_clusters, D)).astype(np.float32)
    emb = (np.repeat(centers, per, axis=0)
           + 0.05 * rng.standard_normal((n_clusters * per, D))).astype(np.float32)
    docnos = [f"d{i}" for i in range(len(emb))]
    idx = DenseIndex(emb, docnos, normalize=True)

    q = centers[:4] / np.linalg.norm(centers[:4], axis=1, keepdims=True)
    scores, rows = idx.search(q.astype(np.float32), k=20, exact=False)
    exact_scores, exact_rows = idx.search(q.astype(np.float32), k=20, exact=True)
    rec = np.mean([
        len(set(rows[i].tolist()) & set(exact_rows[i].tolist())) / 20
        for i in range(4)
    ])
    assert rec >= 0.85, rec


def test_serve_cli(tmp_path, tmp_dataset):
    """One-process retrieve->QPP->fuse over the synthetic dataset."""
    from qpp_fusion_rag_tpu.pipeline.index import main as index_main
    from qpp_fusion_rag_tpu.pipeline.serve import main as serve_main

    idx_dir = tmp_path / "index"
    index_main(["--corpus", str(tmp_dataset / "corpus.jsonl"),
                "--output", str(idx_dir / "bm25")])
    out = tmp_path / "fused.res"
    rc = serve_main([
        "--index-dir", str(idx_dir),
        "--retrievers", "bm25",
        "--queries", str(tmp_dataset / "queries.jsonl"),
        "--output", str(out),
        "--method", "wcombsum",
        "--top-k", "10",
        "--timing-jsonl", str(tmp_path / "timing.jsonl"),
    ])
    assert rc == 0
    assert out.exists()
    from qpp_fusion_rag_tpu.data.loaders import load_run_file

    fused = load_run_file(out)
    assert len(fused) > 0
    timing = (tmp_path / "timing.jsonl").read_text().splitlines()
    stages = {json.loads(l)["stage"] for l in timing}
    assert {"load_indexes", "retrieve:bm25", "tensorize", "qpp", "fuse"} <= stages


def test_batch_latency_includes_encoding(tiny_dense_retriever=None):
    """retrieve_batch must time query encoding like retrieve() does."""
    import time

    import numpy as np

    from qpp_fusion_rag_tpu.retrievers.dense import DenseIndex, DenseRetriever

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(64, 16)).astype(np.float32)
    idx = DenseIndex(emb, [f"d{i}" for i in range(64)])

    def slow_encoder(texts):
        time.sleep(0.03)
        return rng.normal(size=(len(texts), 16)).astype(np.float32)

    r = DenseRetriever(idx, encoder=slow_encoder, exact=True)
    out = r.retrieve_batch({"a": "x", "b": "y"}, top_k=5)
    # 30ms encode amortized over 2 queries -> >= ~15ms each
    assert all(res.latency_ms >= 10.0 for res in out.values())


def test_splade_retriever_without_encoder_raises():
    import numpy as np
    import pytest as _pytest

    from qpp_fusion_rag_tpu.retrievers.splade import SpladeIndex, SpladeRetriever

    idx = SpladeIndex.from_impacts(
        np.array([[1, 2]], np.int32), np.array([[1.0, 0.5]], np.float32),
        ["d0"], vocab_size=8,
    )
    r = SpladeRetriever(idx, encoder=None)
    with _pytest.raises(RuntimeError, match="no query encoder"):
        r.retrieve("hello", "q1")


def test_dense_index_int8_engines_match_exact():
    """DenseIndex.search engine='int8'/'int8r' (the ensemble's production
    dense kernels) return near-exact top-k on a small corpus."""
    import numpy as np

    from qpp_fusion_rag_tpu.retrievers.dense import DenseIndex

    rng = np.random.default_rng(0)
    N, D, B, K = 1024, 64, 4, 8
    emb = rng.standard_normal((N, D)).astype(np.float32)
    idx = DenseIndex(emb, [f"d{i}" for i in range(N)], shuffle=True)
    q = rng.standard_normal((B, D)).astype(np.float32)
    s_ex, i_ex = idx.search(q, k=K, exact=True)
    for engine in ("int8", "int8r"):
        s, i = idx.search(q, k=K, engine=engine, rescore_pool=256)
        assert s.shape == (B, K)
        # group-max emits one candidate per 128-doc group; top-1 must
        # agree (or tie within int8 quantization)
        for b in range(B):
            assert i[b][0] == i_ex[b][0] or \
                abs(s_ex[b][0] - s[b][0]) < 0.15 * abs(s_ex[b][0])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        idx.search(q, k=K, engine="int8", mesh=object())
