"""Sharded sparse retrieval: corpus-axis CSR partition + ICI merge equals
the single-device kernel (exact settings, 8-device CPU mesh)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



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


def _ensemble_fixture(N=512, D=32, B=8, T1=40, T2=50, seed=0):
    """Shared raw data for the single-chip vs sharded ensemble tests."""
    import numpy as np

    rng = np.random.default_rng(seed)

    def csr(n_terms, df, s):
        r = np.random.default_rng(s)
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

    bm25 = csr(T1, 25, 1)
    splade = csr(T2, 20, 2)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    queries = dict(
        bt=rng.integers(0, T1, (B, 4)).astype(np.int32),
        bqw=np.ones((B, 4), np.float32),
        st=rng.integers(0, T2, (B, 6)).astype(np.int32),
        sqw=np.ones((B, 6), np.float32),
        q=rng.standard_normal((B, D)).astype(np.float32),
        proj=(rng.standard_normal((2, D, D)) * 0.2).astype(np.float32),
        tf=np.tile(np.array([4.0, 4.0, 8.0, 5.0], np.float32), (B, 1)),
    )
    return bm25, splade, corpus, queries


def _single_chip_indexes(bm25, splade, corpus, with_doc_vectors=False):
    import jax.numpy as jnp
    import numpy as np

    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
    from qpp_fusion_rag_tpu.ops.sparse import pack_doc_vectors, pack_postings
    from qpp_fusion_rag_tpu.pipeline.ensemble import EnsembleIndexes

    N = corpus.shape[0]
    bo, bd, bw = bm25
    so, sd, sw = splade
    bp, bs = pack_postings(bd, bw, bo)
    sp, ss = pack_postings(sd, sw, so)
    rows_int, row_scale = quantize_rows(jnp.asarray(corpus), axis=-1)
    extra = {}
    if with_doc_vectors:
        bdp, bds, _ = pack_doc_vectors(bo, bd, bw, N)
        sdp, sds, _ = pack_doc_vectors(so, sd, sw, N)
        extra = dict(
            bm25_doc_packed=jnp.asarray(bdp), bm25_doc_scale=jnp.asarray(bds),
            splade_doc_packed=jnp.asarray(sdp),
            splade_doc_scale=jnp.asarray(sds),
        )
    return EnsembleIndexes(
        bm25_packed=jnp.asarray(bp), bm25_scales=jnp.asarray(bs),
        bm25_offsets=jnp.asarray(bo.astype(np.int32)),
        splade_packed=jnp.asarray(sp), splade_scales=jnp.asarray(ss),
        splade_offsets=jnp.asarray(so.astype(np.int32)),
        corpus_int=jnp.transpose(rows_int), corpus_rows=rows_int,
        d_scale=row_scale.reshape(1, -1), **extra,
    )


@pytest.mark.parametrize("sparse_mode", ["sort", "q8r"])
def test_sharded_ensemble_equals_single_chip_production(sparse_mode):
    """VERDICT r2 task 4: the sharded ensemble and the single-chip
    production step are the SAME per-view kernels in two compositions —
    outputs must agree on the virtual mesh (exact sparse settings)."""
    import jax.numpy as jnp
    import numpy as np

    from qpp_fusion_rag_tpu.parallel.mesh import build_mesh
    from qpp_fusion_rag_tpu.parallel.sharded import (
        shard_ensemble_indexes,
        sharded_ensemble_step,
    )
    from qpp_fusion_rag_tpu.pipeline.ensemble import ensemble_retrieval_step

    bm25, splade, corpus, qs = _ensemble_fixture()
    N = corpus.shape[0]
    K = 12
    p_cap = int(max(np.diff(bm25[0]).max(), np.diff(splade[0]).max()))

    idx1 = _single_chip_indexes(bm25, splade, corpus,
                                with_doc_vectors=sparse_mode == "q8r")
    fid_1, fsc_1, qpp_1 = ensemble_retrieval_step(
        idx1, qs["bt"], qs["bqw"], qs["st"], qs["sqw"], qs["q"], qs["proj"],
        qs["tf"], k=K, k_out=K, p_cap=p_cap, sparse_mode=sparse_mode,
        sparse_candidates=64 if sparse_mode == "q8r" else 0,
    )

    mesh = build_mesh(2, 4)
    sidx = shard_ensemble_indexes(bm25, splade, corpus, n_docs=N, n_shards=4)
    fid_s, fsc_s, qpp_s = sharded_ensemble_step(
        sidx, qs["bt"], qs["bqw"], qs["st"], qs["sqw"], qs["q"], qs["proj"],
        qs["tf"], mesh, n_docs=N, k=K, k_out=K, p_cap=p_cap,
        sparse_mode=sparse_mode,
        sparse_candidates=64 if sparse_mode == "q8r" else 0,
    )

    np.testing.assert_allclose(np.asarray(qpp_s), np.asarray(qpp_1),
                               rtol=1e-4, atol=1e-5)
    # f32 accumulation order differs (whole-window segmented sum vs
    # per-shard partial sums) -> ~1e-5 relative noise on fused scores
    np.testing.assert_allclose(np.asarray(fsc_s), np.asarray(fsc_1),
                               rtol=5e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fid_s), np.asarray(fid_1))


def test_sharded_dense_rescore_equals_single_chip():
    """bf16-rows dense rescore + rank-safe sparse: sharded == single-chip
    with the rank-safe serving config."""
    import jax.numpy as jnp
    import numpy as np

    from qpp_fusion_rag_tpu.parallel.mesh import build_mesh
    from qpp_fusion_rag_tpu.parallel.sharded import (
        shard_ensemble_indexes,
        sharded_ensemble_step,
    )
    from qpp_fusion_rag_tpu.pipeline.ensemble import ensemble_retrieval_step

    bm25, splade, corpus, qs = _ensemble_fixture(seed=3)
    N = corpus.shape[0]
    K = 12
    p_cap = int(max(np.diff(bm25[0]).max(), np.diff(splade[0]).max()))

    idx1 = _single_chip_indexes(bm25, splade, corpus, with_doc_vectors=True)
    idx1 = idx1._replace(corpus_rows=jnp.asarray(corpus, jnp.bfloat16))
    fid_1, fsc_1, qpp_1 = ensemble_retrieval_step(
        idx1, qs["bt"], qs["bqw"], qs["st"], qs["sqw"], qs["q"], qs["proj"],
        qs["tf"], k=K, k_out=K, p_cap=p_cap, sparse_mode="q8r",
        sparse_candidates=64, dense_rescore_pool=32,
    )

    mesh = build_mesh(2, 4)
    sidx = shard_ensemble_indexes(bm25, splade, corpus, n_docs=N, n_shards=4,
                                  rows_dtype="bf16")
    fid_s, fsc_s, qpp_s = sharded_ensemble_step(
        sidx, qs["bt"], qs["bqw"], qs["st"], qs["sqw"], qs["q"], qs["proj"],
        qs["tf"], mesh, n_docs=N, k=K, k_out=K, p_cap=p_cap,
        sparse_mode="q8r", sparse_candidates=64, dense_rescore_pool=32,
    )
    np.testing.assert_allclose(np.asarray(qpp_s), np.asarray(qpp_1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fsc_s), np.asarray(fsc_1),
                               rtol=5e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fid_s), np.asarray(fid_1))


def test_dense_rescore_reaches_row_precision():
    """At tiny scale with a pool covering the corpus, the bf16 dense
    rescore matches exact f32 top-k (bf16 tolerance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
    from qpp_fusion_rag_tpu.pipeline.ensemble import dense_view_rescored

    rng = np.random.default_rng(0)
    N, D, B, K = 512, 32, 4, 8
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    rows_int, scale = quantize_rows(jnp.asarray(corpus), axis=-1)
    s, i = dense_view_rescored(
        jnp.asarray(q), jnp.transpose(rows_int), scale.reshape(1, -1),
        jnp.asarray(corpus, jnp.bfloat16), k=K, pool=256)
    exact = q @ corpus.T
    for b in range(B):
        want = np.argsort(-exact[b])[:K]
        got = np.asarray(i)[b]
        # group-max pooling emits one candidate per 128-doc group; with
        # N=512 only 4 groups exist, so compare the top-4
        assert np.asarray(i)[b][0] == want[0] or \
            abs(exact[b][got[0]] - exact[b][want[0]]) < 0.05


def test_sharded_ensemble_presorted_equals_single_chip():
    """The DUAL doc-ordered presorted layout composes through the sharded
    ensemble: shard_ensemble_indexes(presorted_cap=P) +
    sharded_ensemble_step(sparse_presorted=True, p_cap=P) == the
    single-chip presorted step == the single-chip PLAIN q8 step at
    p_cap == P (the layout is score-identical by construction)."""
    import jax.numpy as jnp
    import numpy as np

    from qpp_fusion_rag_tpu.ops.sparse import pack_postings_presorted
    from qpp_fusion_rag_tpu.parallel.mesh import build_mesh
    from qpp_fusion_rag_tpu.parallel.sharded import (
        shard_ensemble_indexes,
        sharded_ensemble_step,
    )
    from qpp_fusion_rag_tpu.pipeline.ensemble import ensemble_retrieval_step

    bm25, splade, corpus, qs = _ensemble_fixture(seed=5)
    N = corpus.shape[0]
    K = 12
    # non-truncating build cap (== p_cap): a cap < df would keep each
    # SHARD's local top-cap, a different posting set than the single
    # chip's global top-cap — same caveat as plain sharded q8
    max_df = int(max(np.diff(bm25[0]).max(), np.diff(splade[0]).max()))
    P = 1
    while P < max_df:
        P *= 2

    idx_plain = _single_chip_indexes(bm25, splade, corpus)
    bpre, bo2, bs2 = pack_postings_presorted(bm25[1], bm25[2], bm25[0], cap=P)
    spre, so2, ss2 = pack_postings_presorted(splade[1], splade[2], splade[0],
                                             cap=P)
    idx_pre = idx_plain._replace(
        bm25_packed=jnp.asarray(bpre), bm25_scales=jnp.asarray(bs2),
        bm25_offsets=jnp.asarray(bo2.astype(np.int32)),
        splade_packed=jnp.asarray(spre), splade_scales=jnp.asarray(ss2),
        splade_offsets=jnp.asarray(so2.astype(np.int32)),
    )
    common = dict(k=K, k_out=K, p_cap=P, sparse_mode="q8")
    fid_0, fsc_0, qpp_0 = ensemble_retrieval_step(
        idx_plain, qs["bt"], qs["bqw"], qs["st"], qs["sqw"], qs["q"],
        qs["proj"], qs["tf"], **common)
    fid_1, fsc_1, qpp_1 = ensemble_retrieval_step(
        idx_pre, qs["bt"], qs["bqw"], qs["st"], qs["sqw"], qs["q"],
        qs["proj"], qs["tf"], sparse_presorted=True, **common)
    np.testing.assert_array_equal(np.asarray(fid_1), np.asarray(fid_0))
    np.testing.assert_allclose(np.asarray(fsc_1), np.asarray(fsc_0),
                               rtol=5e-5, atol=1e-5)

    mesh = build_mesh(2, 4)
    sidx = shard_ensemble_indexes(bm25, splade, corpus, n_docs=N, n_shards=4,
                                  presorted_cap=P)
    fid_s, fsc_s, qpp_s = sharded_ensemble_step(
        sidx, qs["bt"], qs["bqw"], qs["st"], qs["sqw"], qs["q"], qs["proj"],
        qs["tf"], mesh, n_docs=N, sparse_presorted=True, **common)
    np.testing.assert_allclose(np.asarray(qpp_s), np.asarray(qpp_1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fsc_s), np.asarray(fsc_1),
                               rtol=5e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fid_s), np.asarray(fid_1))


def test_sharded_certified_matches_bruteforce(cpu_mesh):
    """Certified sparse mode under shard_map: per-shard certificates
    AND-merge over the corpus axis; where the merged certificate holds,
    the returned ids must be the TRUE global top-k (modulo exact-tie
    swaps) of the f32 CSR scores."""
    import numpy as np

    from qpp_fusion_rag_tpu.parallel.sharded import (
        shard_ensemble_indexes,
        sharded_certified_topk,
    )

    bm25, splade, corpus, qs = _ensemble_fixture(N=512)
    n_shards = cpu_mesh.shape["corpus"]
    sidx = shard_ensemble_indexes(
        bm25, splade, corpus, n_docs=512, n_shards=n_shards)

    k = 10
    bo, bd, bw = bm25
    p_cap = 1
    while p_cap < int(np.diff(bo).max()):
        p_cap *= 2
    vals, ids, cert, slack = sharded_certified_topk(
        sidx, qs["bt"], qs["bqw"], cpu_mesh, n_docs=512,
        k=k, p_cap=p_cap, candidates=64)
    vals, ids = np.asarray(vals), np.asarray(ids)
    cert, slack = np.asarray(cert), np.asarray(slack)
    assert cert.shape == (qs["bt"].shape[0],)
    assert np.isfinite(slack).all()
    assert cert.any(), "no query certified on a fully-covered toy index"

    # brute-force true scores
    dense = np.zeros((len(bo) - 1, 512), np.float64)
    for t in range(len(bo) - 1):
        lo, hi = int(bo[t]), int(bo[t + 1])
        dense[t, bd[lo:hi]] = bw[lo:hi]
    for b in range(qs["bt"].shape[0]):
        if not cert[b]:
            continue
        true = np.zeros(512)
        for t, w in zip(qs["bt"][b], qs["bqw"][b]):
            if t >= 0:
                true += w * dense[t]
        true_sorted = np.sort(true)[::-1][:k]
        got = np.sort(true[ids[b]])[::-1]
        np.testing.assert_allclose(got, true_sorted, rtol=1e-4, atol=1e-6)


def test_sharded_tree_inference_matches_host(cpu_mesh, rng):
    """GBDT inference batch-sharded over the data axis equals the
    single-device device-kernel prediction."""
    import numpy as np

    from qpp_fusion_rag_tpu.models.gbdt import Booster
    from qpp_fusion_rag_tpu.parallel.sharded import sharded_predict_ensemble

    X = rng.standard_normal((96, 5)).astype(np.float32)
    y = (0.3 * X[:, 0] - X[:, 2] ** 2).astype(np.float32)
    booster = Booster({"n_estimators": 6, "max_depth": 3}, seed=1)
    booster.fit(X, y)

    Xq = rng.standard_normal((16, 5)).astype(np.float32)
    pred = sharded_predict_ensemble(booster.ensemble(), Xq, cpu_mesh)
    np.testing.assert_allclose(
        np.asarray(pred), booster.predict(Xq, device=True), rtol=1e-5)


def test_sharded_ensemble_certified_mode():
    """sparse_mode='q8c' in the sharded ensemble: fused outputs match
    the sharded q8r path (same scoring), certificates AND over shards
    and views; on a fully-covered toy index every query certifies, and
    the certified sparse views are sound (the single-chip q8c test
    covers the soundness math — here the cross-shard AND plumbing)."""
    import jax.numpy as jnp
    import numpy as np

    from qpp_fusion_rag_tpu.parallel.mesh import build_mesh
    from qpp_fusion_rag_tpu.parallel.sharded import (
        shard_ensemble_indexes,
        sharded_ensemble_step,
    )

    bm25, splade, corpus, qs = _ensemble_fixture()
    N = corpus.shape[0]
    K = 12
    p_cap = int(max(np.diff(bm25[0]).max(), np.diff(splade[0]).max()))
    mesh = build_mesh(2, 4)
    sidx = shard_ensemble_indexes(bm25, splade, corpus, n_docs=N, n_shards=4)

    fid_c, fsc_c, qpp_c, cert, slack = sharded_ensemble_step(
        sidx, qs["bt"], qs["bqw"], qs["st"], qs["sqw"], qs["q"], qs["proj"],
        qs["tf"], mesh, n_docs=N, k=K, k_out=K, p_cap=p_cap,
        sparse_mode="q8c", sparse_candidates=128)
    cert, slack = np.asarray(cert), np.asarray(slack)
    assert cert.shape == (qs["bt"].shape[0],) and cert.dtype == bool
    assert np.isfinite(slack).all()
    # per-shard certificates are conservative: a shard whose local k-th
    # score sits at the noise floor refuses, even when the merged result
    # is exact — so don't require all-certified on a toy fixture; do
    # require the AND/pmin plumbing's consistency (a certified query's
    # binding slack clears the tie band)
    assert (slack[cert] > -1e-3).all()

    fid_r, fsc_r, _ = sharded_ensemble_step(
        sidx, qs["bt"], qs["bqw"], qs["st"], qs["sqw"], qs["q"], qs["proj"],
        qs["tf"], mesh, n_docs=N, k=K, k_out=K, p_cap=p_cap,
        sparse_mode="q8r", sparse_candidates=128)
    np.testing.assert_array_equal(np.asarray(fid_c), np.asarray(fid_r))
    np.testing.assert_allclose(np.asarray(fsc_c), np.asarray(fsc_r),
                               rtol=1e-5, atol=1e-6)
