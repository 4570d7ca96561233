"""Heterogeneous ensemble step: 5 views, one compiled program (CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest
pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



def _csr(rng, n_docs, n_terms, df):
    terms = np.repeat(np.arange(n_terms), df)
    docs = np.concatenate(
        [rng.choice(n_docs, df, replace=False) for _ in range(n_terms)]
    ).astype(np.int32)
    w = (rng.permutation(n_terms * df).astype(np.float32) / (n_terms * df)) + 0.05
    order = np.lexsort((-w, terms))
    docs, w = docs[order], w[order]
    offsets = np.zeros(n_terms + 1, np.int32)
    np.cumsum(np.bincount(terms, minlength=n_terms), out=offsets[1:])
    return offsets, docs, w


def test_ensemble_step_end_to_end(rng):
    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
    from qpp_fusion_rag_tpu.pipeline.ensemble import (
        EnsembleIndexes,
        ensemble_retrieval_step,
    )

    from qpp_fusion_rag_tpu.ops.sparse import pack_postings

    N, D, B, K = 2048, 32, 4, 16
    bo, bd, bw = _csr(rng, N, n_terms=50, df=30)
    so, sd, sw = _csr(rng, N, n_terms=64, df=20)
    bp, bs = pack_postings(bd, bw, bo)
    sp, ss = pack_postings(sd, sw, so)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    c_int, d_scale = quantize_rows(jnp.asarray(corpus.T), axis=0)
    idx = EnsembleIndexes(
        bm25_packed=jnp.asarray(bp), bm25_scales=jnp.asarray(bs),
        bm25_offsets=jnp.asarray(bo),
        splade_packed=jnp.asarray(sp), splade_scales=jnp.asarray(ss),
        splade_offsets=jnp.asarray(so),
        corpus_int=c_int,
        corpus_rows=jnp.asarray(np.asarray(c_int).T),
        d_scale=d_scale.reshape(1, -1),
    )
    bm25_t = rng.integers(0, 50, (B, 4)).astype(np.int32)
    splade_t = rng.integers(0, 64, (B, 8)).astype(np.int32)
    q_emb = rng.standard_normal((B, D)).astype(np.float32)
    proj = (rng.standard_normal((2, D, D)) * 0.2).astype(np.float32)
    tf = np.tile(np.array([4.0, 4.0, 8.0, 5.0], np.float32), (B, 1))

    fused_ids, fused_scores, qpp = ensemble_retrieval_step(
        idx, bm25_t, np.ones((B, 4), np.float32),
        splade_t, np.ones((B, 8), np.float32),
        q_emb, proj, tf, k=K, k_out=K, p_cap=30,
    )
    fused_ids = np.asarray(fused_ids)
    fused_scores = np.asarray(fused_scores)
    qpp = np.asarray(qpp)
    assert fused_ids.shape == (B, K) and qpp.shape == (5, B, 13)
    assert np.isfinite(qpp).all()
    # fused scores sorted desc where valid
    for i in range(B):
        v = fused_scores[i][fused_ids[i] >= 0]
        assert (np.diff(v) <= 1e-6).all()
    # fused ids are real docs
    assert fused_ids.max() < N
    # no duplicate doc ids within a query's fused list
    for i in range(B):
        real = fused_ids[i][fused_ids[i] >= 0]
        assert len(set(real.tolist())) == len(real)


def test_rerank_view_is_subset_of_candidates(rng):
    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
    from qpp_fusion_rag_tpu.pipeline.ensemble import rerank_candidates

    N, D, B, K = 512, 16, 3, 8
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    c_int, d_scale = quantize_rows(jnp.asarray(corpus.T), axis=0)
    rows = jnp.asarray(np.asarray(c_int).T)
    cand = rng.choice(N, size=(B, K), replace=False).astype(np.int32)
    cand[0, -2:] = -1  # padded candidates
    q = rng.standard_normal((B, D)).astype(np.float32)
    s, ids = rerank_candidates(jnp.asarray(q), jnp.asarray(cand), rows,
                               d_scale.reshape(1, -1))
    s, ids = np.asarray(s), np.asarray(ids)
    for i in range(B):
        got = set(ids[i][ids[i] >= 0].tolist())
        want = set(cand[i][cand[i] >= 0].tolist())
        assert got == want
    # scores desc, pads last
    assert (ids[0][-2:] == -1).all()
    # rerank ordering follows the dense scores over candidates
    sc = (q[1] @ np.asarray(c_int).astype(np.float32)[:, cand[1]]) * \
        np.asarray(d_scale).reshape(-1)[cand[1]]
    np.testing.assert_array_equal(ids[1], cand[1][np.argsort(-sc, kind="stable")])


def test_ensemble_learned_fusion(rng):
    """mlp_params switches the ensemble step to learned softmax weights."""
    import jax

    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
    from qpp_fusion_rag_tpu.ops.sparse import pack_postings
    from qpp_fusion_rag_tpu.pipeline.engine import init_mlp_params
    from qpp_fusion_rag_tpu.pipeline.ensemble import (
        EnsembleIndexes,
        ensemble_retrieval_step,
    )

    N, D, B, K = 1024, 16, 4, 10
    bo, bd, bw = _csr(rng, N, n_terms=30, df=20)
    so, sd, sw = _csr(rng, N, n_terms=40, df=15)
    bp, bs = pack_postings(bd, bw, bo)
    sp, ss = pack_postings(sd, sw, so)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    c_int, d_scale = quantize_rows(jnp.asarray(corpus.T), axis=0)
    idx = EnsembleIndexes(
        jnp.asarray(bp), jnp.asarray(bs), jnp.asarray(bo),
        jnp.asarray(sp), jnp.asarray(ss), jnp.asarray(so),
        c_int, jnp.asarray(np.asarray(c_int).T), d_scale.reshape(1, -1),
    )
    args = (
        rng.integers(0, 30, (B, 4)).astype(np.int32),
        np.ones((B, 4), np.float32),
        rng.integers(0, 40, (B, 8)).astype(np.int32),
        np.ones((B, 8), np.float32),
        rng.standard_normal((B, D)).astype(np.float32),
        (rng.standard_normal((2, D, D)) * 0.2).astype(np.float32),
        np.tile(np.array([4.0, 4.0, 8.0, 5.0], np.float32), (B, 1)),
    )
    params = init_mlp_params(jax.random.PRNGKey(0), [5 * 13, 16, 5])
    fid, fsc, qpp = ensemble_retrieval_step(
        idx, *args, k=K, k_out=K, p_cap=16, mlp_params=params)
    fid2, fsc2, _ = ensemble_retrieval_step(
        idx, *args, k=K, k_out=K, p_cap=16)
    assert fid.shape == fid2.shape
    assert np.isfinite(np.asarray(fsc)[:, 0]).all()
    # learned weights differ from the RSD column -> fused scores differ
    assert not np.allclose(np.asarray(fsc), np.asarray(fsc2))


def test_ensemble_q8r_pool_smaller_than_k(rng):
    """A q8r candidate pool smaller than k must pad its views to [B, k]
    (regression: bench.py's small CPU workload stacked ragged views)."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
    from qpp_fusion_rag_tpu.ops.sparse import pack_doc_vectors, pack_postings
    from qpp_fusion_rag_tpu.pipeline.ensemble import (
        EnsembleIndexes,
        ensemble_retrieval_step,
    )

    N, D, B, K = 1024, 32, 4, 16
    bo, bd, bw = _csr(rng, N, n_terms=40, df=24)
    so, sd, sw = _csr(rng, N, n_terms=50, df=16)
    bp, bs = pack_postings(bd, bw, bo)
    sp, ss = pack_postings(sd, sw, so)
    bdp, bds, _ = pack_doc_vectors(bo, bd, bw, N)
    sdp, sds, _ = pack_doc_vectors(so, sd, sw, N)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    c_int, d_scale = quantize_rows(jnp.asarray(corpus.T), axis=0)
    idx = EnsembleIndexes(
        bm25_packed=jnp.asarray(bp), bm25_scales=jnp.asarray(bs),
        bm25_offsets=jnp.asarray(bo),
        splade_packed=jnp.asarray(sp), splade_scales=jnp.asarray(ss),
        splade_offsets=jnp.asarray(so),
        corpus_int=c_int, corpus_rows=jnp.asarray(np.asarray(c_int).T),
        d_scale=d_scale.reshape(1, -1),
        bm25_doc_packed=jnp.asarray(bdp), bm25_doc_scale=jnp.asarray(bds),
        splade_doc_packed=jnp.asarray(sdp), splade_doc_scale=jnp.asarray(sds),
    )
    fid, fsc, qpp = ensemble_retrieval_step(
        idx, rng.integers(0, 40, (B, 4)).astype(np.int32),
        np.ones((B, 4), np.float32),
        rng.integers(0, 50, (B, 8)).astype(np.int32),
        np.ones((B, 8), np.float32),
        rng.standard_normal((B, D)).astype(np.float32),
        (rng.standard_normal((2, D, D)) * 0.2).astype(np.float32),
        np.tile(np.array([4.0, 4.0, 8.0, 5.0], np.float32), (B, 1)),
        k=K, k_out=K, p_cap=24, sparse_mode="q8r", sparse_candidates=8,
    )
    assert np.asarray(fid).shape == (B, K)
    assert np.isfinite(np.asarray(fsc)[:, 0]).all()


def test_ensemble_certified_mode(rng):
    """sparse_mode='q8c': the step returns per-query certificates (AND
    of both sparse views); with full window coverage and a generous pool
    every query certifies and the sparse views equal the q8r views."""
    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
    from qpp_fusion_rag_tpu.ops.sparse import (
        doc_vector_imp_bits,
        pack_doc_vectors,
        pack_postings,
    )
    from qpp_fusion_rag_tpu.pipeline.ensemble import (
        EnsembleIndexes,
        ensemble_retrieval_step,
    )

    N, D, B, K = 1024, 16, 4, 8
    bo, bd, bw = _csr(rng, N, n_terms=40, df=32)
    so, sd, sw = _csr(rng, N, n_terms=48, df=24)
    bp, bs = pack_postings(bd, bw, bo)
    sp, ss = pack_postings(sd, sw, so)
    bits = doc_vector_imp_bits(48)
    bdp, bds, _ = pack_doc_vectors(bo, bd, bw, N, imp_bits=bits)
    sdp, sds, _ = pack_doc_vectors(so, sd, sw, N, imp_bits=bits)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    c_int, d_scale = quantize_rows(jnp.asarray(corpus.T), axis=0)
    idx = EnsembleIndexes(
        bm25_packed=jnp.asarray(bp), bm25_scales=jnp.asarray(bs),
        bm25_offsets=jnp.asarray(bo),
        splade_packed=jnp.asarray(sp), splade_scales=jnp.asarray(ss),
        splade_offsets=jnp.asarray(so),
        corpus_int=c_int, corpus_rows=jnp.asarray(np.asarray(c_int).T),
        d_scale=d_scale.reshape(1, -1),
        bm25_doc_packed=jnp.asarray(bdp), bm25_doc_scale=jnp.asarray(bds),
        splade_doc_packed=jnp.asarray(sdp), splade_doc_scale=jnp.asarray(sds),
        doc_imp_bits=bits,
    )
    bm25_t = rng.integers(0, 40, (B, 4)).astype(np.int32)
    splade_t = rng.integers(0, 48, (B, 8)).astype(np.int32)
    args = (bm25_t, np.ones((B, 4), np.float32),
            splade_t, np.ones((B, 8), np.float32),
            rng.standard_normal((B, D)).astype(np.float32),
            (rng.standard_normal((2, D, D)) * 0.2).astype(np.float32),
            np.tile(np.array([4.0, 4.0, 8.0, 5.0], np.float32), (B, 1)))
    fid_c, fsc_c, qpp_c, cert, slack = ensemble_retrieval_step(
        idx, *args, k=K, k_out=K, p_cap=32, sparse_mode="q8c",
        sparse_candidates=256)
    cert, slack = np.asarray(cert), np.asarray(slack)
    assert cert.shape == (B,) and cert.dtype == bool
    assert np.isfinite(slack).all()
    assert cert.all(), "full coverage + generous pool must certify all"
    # the certified step's fused output matches the q8r step's
    fid_r, fsc_r, qpp_r = ensemble_retrieval_step(
        idx, *args, k=K, k_out=K, p_cap=32, sparse_mode="q8r",
        sparse_candidates=256)
    np.testing.assert_array_equal(np.asarray(fid_c), np.asarray(fid_r))
    np.testing.assert_allclose(np.asarray(fsc_c), np.asarray(fsc_r),
                               rtol=1e-5, atol=1e-6)
