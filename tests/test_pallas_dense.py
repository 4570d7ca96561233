"""Pallas fused dense top-k vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (

    GROUP,
    group_max_scores,
    pallas_dense_topk,
    pallas_multi_view_topk,
)

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier


@pytest.fixture(scope="module")
def qc():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    c = rng.standard_normal((1024, 64)).astype(np.float32)
    return q, c


def test_group_max_matches_numpy(qc):
    q, c = qc
    vals, ids = group_max_scores(jnp.asarray(q), jnp.asarray(c), tm=8, tn=256)
    s = q @ c.T
    g = s.reshape(8, -1, GROUP)
    np.testing.assert_allclose(np.asarray(vals), g.max(-1), rtol=1e-5)
    expect_ids = g.argmax(-1) + np.arange(g.shape[1])[None, :] * GROUP
    np.testing.assert_array_equal(np.asarray(ids), expect_ids)


def test_pallas_topk_recall_vs_exact():
    rng = np.random.default_rng(3)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    c = rng.standard_normal((16384, 64)).astype(np.float32)  # 128 groups
    vals, ids = pallas_dense_topk(jnp.asarray(q), jnp.asarray(c), k=10, tm=8, tn=2048)
    s = q @ c.T
    exact = np.argsort(-s, axis=-1)[:, :10]
    got = np.asarray(ids)
    # group-max reduction: top-1 is always exact; top-10 recall high when
    # candidate groups >> k
    np.testing.assert_array_equal(got[:, 0], exact[:, 0])
    rec = np.mean([len(set(got[i]) & set(exact[i])) / 10 for i in range(len(q))])
    assert rec >= 0.85, rec
    # returned scores match the true scores at the returned ids
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(s, got, axis=-1), rtol=1e-4
    )


def test_pallas_topk_padding(qc):
    q, c = qc
    c_short = c[:1000]  # forces corpus padding to tn
    vals, ids = pallas_dense_topk(jnp.asarray(q), jnp.asarray(c_short), k=5, tm=8, tn=256)
    assert np.asarray(ids).max() < 1000
    s = q @ c_short.T
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.argmax(s, axis=-1))


def test_pallas_multi_view(qc):
    q, c = qc
    rng = np.random.default_rng(1)
    proj = rng.standard_normal((2, 64, 64)).astype(np.float32) * 0.2
    vals, ids = pallas_multi_view_topk(
        jnp.asarray(q), jnp.asarray(proj), jnp.asarray(c), k=5, tm=16, tn=256
    )
    assert vals.shape == (2, 8, 5)
    for r in range(2):
        s = (q @ proj[r]) @ c.T
        np.testing.assert_array_equal(np.asarray(ids)[r, :, 0], np.argmax(s, axis=-1))


def test_pallas_pad_docs_do_not_displace_negative_scores():
    """Zero-vector pad docs score 0; with all-negative real scores they must
    not steal group-argmax slots (regression: the post-hoc ids<n mask used
    to drop whole boundary groups)."""
    rng = np.random.default_rng(9)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    c = -np.abs(rng.standard_normal((100, 32))).astype(np.float32)
    # make all inner products negative: q positive, c negative
    q = np.abs(q)
    vals, ids = pallas_dense_topk(jnp.asarray(q), jnp.asarray(c), k=5, tm=8, tn=256)
    ids = np.asarray(ids)
    assert np.all(ids[:, 0] >= 0), ids[:, 0]
    s = q @ c.T
    np.testing.assert_array_equal(ids[:, 0], np.argmax(s, axis=-1))


def test_pallas_stride_coarse_reduction():
    rng = np.random.default_rng(5)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    c = rng.standard_normal((16384, 64)).astype(np.float32)
    v, i = pallas_dense_topk(jnp.asarray(q), jnp.asarray(c), k=10, tm=8, tn=2048, stride=4, packed=False)
    s = q @ c.T
    got = np.asarray(i)
    np.testing.assert_array_equal(got[:, 0], np.argmax(s, -1))  # top-1 exact
    exact = np.argsort(-s, -1)[:, :10]
    rec = np.mean([len(set(got[r].tolist()) & set(exact[r].tolist())) / 10 for r in range(8)])
    assert rec >= 0.6, rec  # 32 coarse candidates for top-10 -> collisions expected
    np.testing.assert_allclose(np.asarray(v), np.take_along_axis(s, got, -1), rtol=1e-4)


def test_pallas_transposed_corpus_matches_rowmajor():
    rng = np.random.default_rng(11)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    c = rng.standard_normal((1000, 64)).astype(np.float32)  # forces padding too
    v1, i1 = pallas_dense_topk(jnp.asarray(q), jnp.asarray(c), k=8, tm=8, tn=256)
    v2, i2 = pallas_dense_topk(jnp.asarray(q), jnp.asarray(c.T), k=8, tm=8, tn=256,
                               transposed=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_int8_topk_matches_exact_and_scores():
    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
        pallas_dense_topk_int8,
        quantize_rows,
    )

    rng = np.random.default_rng(11)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    c = rng.standard_normal((16384, 64)).astype(np.float32)
    c_int, d_scale = quantize_rows(jnp.asarray(c.T), axis=0)   # [D, N], [1, N]
    vals, ids = pallas_dense_topk_int8(
        jnp.asarray(q), c_int, d_scale.reshape(1, -1), k=10, tm=8, tn=2048,
        exact_merge=True,
    )
    s = q @ c.T
    exact = np.argsort(-s, axis=-1)[:, :10]
    got = np.asarray(ids)
    # int8 rounding can swap near-ties but recall vs exact stays high
    rec = np.mean([len(set(got[i]) & set(exact[i])) / 10 for i in range(len(q))])
    assert rec >= 0.8, rec
    # returned scores approximate the true scores at the returned ids
    true_at = np.take_along_axis(s, got, axis=-1)
    rel = np.abs(np.asarray(vals) - true_at) / np.maximum(np.abs(true_at), 1e-3)
    assert np.median(rel) < 2e-2, np.median(rel)


def test_int8_topk_padding_masks_fake_docs():
    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
        pallas_dense_topk_int8,
        quantize_rows,
    )

    rng = np.random.default_rng(5)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    c = rng.standard_normal((1000, 64)).astype(np.float32)
    c_int, d_scale = quantize_rows(jnp.asarray(c.T), axis=0)
    vals, ids = pallas_dense_topk_int8(
        jnp.asarray(q), c_int, d_scale.reshape(1, -1), k=5, tm=8, tn=256,
        exact_merge=True,
    )
    assert np.asarray(ids).max() < 1000
    s = q @ c.T
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.argmax(s, axis=-1))


def test_int8_multi_view_shapes_and_top1():
    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
        pallas_multi_view_topk_int8,
        quantize_rows,
    )

    rng = np.random.default_rng(9)
    B, D, Dv, N, R = 4, 32, 32, 4096, 3
    q = rng.standard_normal((B, D)).astype(np.float32)
    proj = (rng.standard_normal((R, D, Dv)) * 0.2).astype(np.float32)
    c = rng.standard_normal((N, Dv)).astype(np.float32)
    c_int, d_scale = quantize_rows(jnp.asarray(c.T), axis=0)
    vals, ids = pallas_multi_view_topk_int8(
        jnp.asarray(q), jnp.asarray(proj), c_int, d_scale.reshape(1, -1),
        k=5, tm=8, tn=512, exact_merge=True,
    )
    assert vals.shape == (R, B, 5) and ids.shape == (R, B, 5)
    qv = np.einsum("bd,rdv->rbv", q, proj)
    for r in range(R):
        s = qv[r] @ c.T
        np.testing.assert_array_equal(np.asarray(ids)[r, :, 0], np.argmax(s, axis=-1))


def test_int8_global_topk_matches_exact():
    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
        pallas_dense_topk_int8_global,
        quantize_global,
    )

    rng = np.random.default_rng(21)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    # unit-norm corpus: the global-scale regime
    c = rng.standard_normal((16384, 64)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    c_int, scale = quantize_global(jnp.asarray(c.T))
    vals, ids = pallas_dense_topk_int8_global(
        jnp.asarray(q), c_int, scale, k=10, tm=8, tn=2048, exact_merge=True,
    )
    s = q @ c.T
    exact = np.argsort(-s, axis=-1)[:, :10]
    got = np.asarray(ids)
    rec = np.mean([len(set(got[i]) & set(exact[i])) / 10 for i in range(len(q))])
    assert rec >= 0.8, rec
    true_at = np.take_along_axis(s, got, axis=-1)
    rel = np.abs(np.asarray(vals) - true_at) / np.maximum(np.abs(true_at), 1e-3)
    assert np.median(rel) < 2e-2, np.median(rel)


def test_int8_global_topk_padding():
    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
        pallas_dense_topk_int8_global,
        quantize_global,
    )

    rng = np.random.default_rng(23)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    c = rng.standard_normal((1000, 64)).astype(np.float32)
    c_int, scale = quantize_global(jnp.asarray(c.T))
    vals, ids = pallas_dense_topk_int8_global(
        jnp.asarray(q), c_int, scale, k=5, tm=8, tn=256, exact_merge=True,
    )
    assert np.asarray(ids).max() < 1000
    s = q @ c.T
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.argmax(s, axis=-1))


def test_rescore_match_pallas_matches_reference():
    """Fused gather+match kernel (interpret mode) == the XLA rescore
    formulation, including -1 candidate pads and query-term pads."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
    from qpp_fusion_rag_tpu.ops.pallas.row_gather import (
        pad_doc_rows,
        rescore_match_pallas,
    )
    from qpp_fusion_rag_tpu.ops.sparse import (
        doc_vector_imp_bits,
        pack_doc_vectors,
    )

    N = 2000
    offsets, docs, weights, _ = zipf_bm25_csr(
        N, vocab_size=512, avg_doc_len=18.0, seed=5)
    bits = doc_vector_imp_bits(512)
    dp, ds, _ = pack_doc_vectors(offsets, docs, weights, N, imp_bits=bits)
    table = pad_doc_rows(dp, bits)
    rng = np.random.default_rng(2)
    B, C = 4, 64
    ids = rng.integers(0, N, (B, C)).astype(np.int32)
    ids[1, -3:] = -1
    qt, qw = zipf_queries(offsets, B, n_terms=8, seed=3)

    out = np.asarray(rescore_match_pallas(
        jnp.asarray(table), jnp.asarray(ids), qt, qw, imp_bits=bits))

    safe = np.maximum(ids, 0)
    rows = np.asarray(dp)[safe.reshape(-1)].reshape(B, C, -1)
    t = rows >> bits
    imp = (rows & ((1 << bits) - 1)).astype(np.float64)
    qtn = np.asarray(qt)
    qwn = np.where(qtn >= 0, np.asarray(qw), 0.0)
    ref = np.zeros((B, C))
    for j in range(qtn.shape[1]):
        ref += (np.where(t == qtn[:, j, None, None],
                         qwn[:, j, None, None], 0.0) * imp).sum(-1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
