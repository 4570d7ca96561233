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


def test_sharded_ensemble_equals_single_device():
    """The full 5-view sharded ensemble on the (2, 4) mesh reproduces a
    single-device composition of the same primitives exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qpp_fusion_rag_tpu.ops import fusion as F
    from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk
    from qpp_fusion_rag_tpu.parallel.mesh import build_mesh
    from qpp_fusion_rag_tpu.parallel.sharded import (
        shard_sparse_csr,
        sharded_ensemble_step,
    )
    from qpp_fusion_rag_tpu.pipeline.engine import qpp_from_runs, weight_and_fuse

    rng = np.random.default_rng(0)
    N, D, B, K, T1, T2 = 512, 16, 8, 12, 40, 50

    def csr(n_terms, df, seed):
        r = np.random.default_rng(seed)
        terms = np.repeat(np.arange(n_terms), df)
        docs = np.concatenate(
            [r.choice(N, df, replace=False) for _ in range(n_terms)]
        ).astype(np.int32)
        w = r.uniform(0.05, 5.0, n_terms * df).astype(np.float32)
        order = np.lexsort((-w, terms))
        docs, w = docs[order], w[order]
        offsets = np.zeros(n_terms + 1, np.int64)
        np.cumsum(np.bincount(terms, minlength=n_terms), out=offsets[1:])
        return offsets, docs, w

    bo, bd, bw = csr(T1, 25, 1)
    so, sd, sw = csr(T2, 20, 2)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    bt = rng.integers(0, T1, (B, 4)).astype(np.int32)
    st = rng.integers(0, T2, (B, 6)).astype(np.int32)
    bqw = np.ones((B, 4), np.float32)
    sqw = np.ones((B, 6), np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    proj = (rng.standard_normal((2, D, D)) * 0.2).astype(np.float32)
    tf = np.tile(np.array([4.0, 4.0, 8.0, 5.0], np.float32), (B, 1))

    mesh = build_mesh(2, 4)
    bm25_shards = shard_sparse_csr(bo, bd, bw, n_docs=N, n_shards=4)
    splade_shards = shard_sparse_csr(so, sd, sw, n_docs=N, n_shards=4)
    fid_s, fsc_s, qpp_s = sharded_ensemble_step(
        bt, bqw, st, sqw, q, proj, tf, bm25_shards, splade_shards,
        jnp.asarray(corpus), mesh, n_docs=N, k=K, k_out=K, p_cap=32,
    )

    # single-device reference from the same primitives
    def single():
        b_s, b_i = sparse_score_topk(
            jnp.asarray(bd), jnp.asarray(bw), jnp.asarray(bo.astype(np.int32)),
            jnp.asarray(bt), jnp.asarray(bqw), k=K, p_cap=32, exact_topk=True)
        s_s, s_i = sparse_score_topk(
            jnp.asarray(sd), jnp.asarray(sw), jnp.asarray(so.astype(np.int32)),
            jnp.asarray(st), jnp.asarray(sqw), k=K, p_cap=32, exact_topk=True)
        scores = jnp.asarray(q) @ jnp.asarray(corpus).T
        d_s, d_i = jax.lax.top_k(scores, K)
        cand = jnp.asarray(corpus)[jnp.maximum(b_i, 0)]
        qv = jnp.einsum("bd,vdw->vbw", jnp.asarray(q), jnp.asarray(proj))
        rs = jnp.einsum("vbd,bkd->vbk", qv, cand)
        rs = jnp.where(b_i >= 0, rs, -jnp.inf)
        order = jnp.argsort(-rs, axis=-1)
        rids = jnp.broadcast_to(jnp.where(b_i >= 0, b_i, -1), rs.shape)
        rr_s = jnp.take_along_axis(rs, order, axis=-1)
        rr_i = jnp.take_along_axis(rids, order, axis=-1)
        vals = jnp.stack([b_s, s_s, d_s, rr_s[0], rr_s[1]])
        ids = jnp.stack([b_i, s_i, d_i, rr_i[0], rr_i[1]])
        qpp = qpp_from_runs(vals, ids, jnp.asarray(tf))
        norm = F._row_minmax(vals, ids >= 0, fill=-jnp.inf)
        return weight_and_fuse(ids, norm, qpp[..., 5], k_out=K) + (qpp,)

    fid_1, fsc_1, qpp_1 = single()
    np.testing.assert_array_equal(np.asarray(fid_s), np.asarray(fid_1))
    np.testing.assert_allclose(np.asarray(fsc_s), np.asarray(fsc_1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qpp_s), np.asarray(qpp_1),
                               rtol=1e-4, atol=1e-5)
