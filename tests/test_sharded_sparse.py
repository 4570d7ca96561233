"""Sharded sparse retrieval: corpus-axis CSR partition + ICI merge equals
the single-device kernel (exact settings, 8-device CPU mesh)."""

import numpy as np
import pytest


def _toy_postings(rng, n_docs=230, n_terms=40, avg_df=25):
    """Random CSR impact lists with strictly distinct weights (no ties)."""
    rows = []
    for t in range(n_terms):
        df = rng.integers(1, avg_df * 2)
        docs = rng.choice(n_docs, size=min(df, n_docs), replace=False)
        for d in docs:
            rows.append((t, int(d)))
    rows = np.array(rows, dtype=np.int64)
    w = rng.permutation(len(rows)).astype(np.float32) / len(rows) + 0.05
    # impact order within each term: sort by (term asc, weight desc)
    order = np.lexsort((-w, rows[:, 0]))
    rows, w = rows[order], w[order]
    offsets = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows[:, 0], minlength=n_terms), out=offsets[1:])
    return offsets, rows[:, 1].astype(np.int32), w


@pytest.mark.parametrize("n_docs", [230, 256])
def test_sharded_sparse_matches_single_device(cpu_mesh, rng, n_docs):
    from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk
    from qpp_fusion_rag_tpu.parallel.sharded import (
        shard_sparse_csr,
        sharded_sparse_topk,
    )

    offsets, docs, weights = _toy_postings(rng, n_docs=n_docs)
    n_shards = cpu_mesh.shape["corpus"]
    B, Tq, k = 4, 6, 20
    q_terms = rng.integers(0, 40, size=(B, Tq)).astype(np.int32)
    q_terms[0, -2:] = -1  # padded query terms
    q_weights = rng.uniform(0.5, 2.0, size=(B, Tq)).astype(np.float32)

    # exact single-device reference (p_cap covers every posting list)
    p_cap = int(np.diff(offsets).max())
    ref_scores, ref_ids = sparse_score_topk(
        docs, weights, offsets.astype(np.int32), q_terms, q_weights,
        k=k, p_cap=p_cap, exact_topk=True,
    )

    offsets_s, docs_s, weights_s, doc_base = shard_sparse_csr(
        offsets, docs, weights, n_docs=n_docs, n_shards=n_shards
    )
    assert offsets_s.shape == (n_shards, len(offsets))
    # every posting lands in exactly one shard
    assert int(offsets_s[:, -1].sum()) == len(docs)

    scores, ids = sharded_sparse_topk(
        q_terms, q_weights, offsets_s, docs_s, weights_s, doc_base,
        cpu_mesh, n_docs=n_docs, k=k, p_cap=p_cap, exact_topk=True,
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_shard_sparse_csr_preserves_impact_order(rng):
    from qpp_fusion_rag_tpu.parallel.sharded import shard_sparse_csr

    offsets, docs, weights = _toy_postings(rng)
    offsets_s, docs_s, weights_s, doc_base = shard_sparse_csr(
        offsets, docs, weights, n_docs=230, n_shards=4
    )
    for s in range(4):
        for t in range(len(offsets) - 1):
            lo, hi = offsets_s[s, t], offsets_s[s, t + 1]
            run = weights_s[s, lo:hi]
            assert (np.diff(run) <= 0).all(), (s, t, run)
