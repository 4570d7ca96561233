"""Certified rank-exact sparse scoring (ops.sparse.sparse_score_topk_q8_certified).

Soundness contract: whenever the certificate fires, the returned top-k
is the true top-k of the stored f32 index weights — the same result the
reference's exhaustive Lucene/Terrier traversal produces (reference
src/retrievers/bm25.py:43-52, splade.py:75-80). The bound must hold at
ANY p_cap / pool size, so the tests sweep truncation levels that force
both certified and uncertified queries.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
from qpp_fusion_rag_tpu.index.sparse import SparseIndex
from qpp_fusion_rag_tpu.ops.sparse import (

    doc_vector_imp_bits,
    pack_doc_vectors,
    pack_postings,
    sparse_score_topk_q8_certified,
)

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier

N_DOCS = 8192
K = 10


@pytest.fixture(scope="module")
def csr():
    offsets, docs, weights, _ = zipf_bm25_csr(
        N_DOCS, vocab_size=2048, avg_doc_len=24.0, seed=3)
    return offsets, docs, weights


@pytest.fixture(scope="module")
def device_index(csr):
    offsets, docs, weights = csr
    packed, scales = pack_postings(docs, weights, offsets)
    bits = doc_vector_imp_bits(len(offsets) - 1)
    dp, ds, _ = pack_doc_vectors(offsets, docs, weights, N_DOCS,
                                 imp_bits=bits)
    return (jnp.asarray(packed), jnp.asarray(offsets.astype(np.int32)),
            jnp.asarray(scales), jnp.asarray(dp), jnp.asarray(ds), bits)


@pytest.fixture(scope="module")
def queries(csr):
    qt, qw = zipf_queries(csr[0], 32, n_terms=8, seed=11)
    return qt, qw


def host_scores(csr, q_terms, q_weights):
    """Full-depth exhaustive scoring of the stored f32 weights (f64 acc)."""
    offsets, docs, weights = csr
    B = q_terms.shape[0]
    out = np.zeros((B, N_DOCS), np.float64)
    for b in range(B):
        for t, w in zip(q_terms[b], q_weights[b]):
            if t < 0:
                continue
            lo, hi = int(offsets[t]), int(offsets[t + 1])
            np.add.at(out[b], docs[lo:hi], w * weights[lo:hi].astype(np.float64))
    return out


def assert_true_topk(true_row, ids_row, k):
    """Returned ids must carry the k largest true scores (tie-tolerant)."""
    got = np.sort(true_row[ids_row[:k]])[::-1]
    best = np.sort(true_row)[::-1][:k]
    np.testing.assert_allclose(got, best, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("p_cap,candidates", [(128, 256), (512, 512)])
def test_certified_queries_are_exact(device_index, queries, csr,
                                     p_cap, candidates):
    packed, offs, scales, dp, ds, bits = device_index
    qt, qw = queries
    s, i, ok, slack = sparse_score_topk_q8_certified(
        packed, offs, scales, dp, ds, jnp.asarray(qt), jnp.asarray(qw),
        k=K, p_cap=p_cap, candidates=candidates, imp_bits=bits)
    s, i, ok, slack = map(np.asarray, (s, i, ok, slack))
    true = host_scores(csr, qt, qw)
    # soundness: every certified query is the true top-k
    for b in range(len(qt)):
        if ok[b]:
            assert_true_topk(true[b], i[b], K)
    # certification requires a full finite top-k and near-nonnegative
    # slack (the tie band allows slightly negative slack)
    assert not (ok & ~np.isfinite(s[:, K - 1])).any()
    assert not (ok & (slack < -1e-3 * np.abs(s[:, 0]))).any()


def test_certificate_not_vacuous(device_index, queries):
    """At a generous window the certificate must actually fire."""
    packed, offs, scales, dp, ds, bits = device_index
    qt, qw = queries
    _, _, ok, _ = sparse_score_topk_q8_certified(
        packed, offs, scales, dp, ds, jnp.asarray(qt), jnp.asarray(qw),
        k=K, p_cap=2048, candidates=1024, imp_bits=bits)
    assert np.asarray(ok).mean() > 0.5


def test_tight_window_forces_uncertified(device_index, queries):
    """Brutal truncation must leave the certificate unable to prove
    (otherwise the bound is not doing anything)."""
    packed, offs, scales, dp, ds, bits = device_index
    qt, qw = queries
    _, _, ok, _ = sparse_score_topk_q8_certified(
        packed, offs, scales, dp, ds, jnp.asarray(qt), jnp.asarray(qw),
        k=K, p_cap=16, candidates=64, imp_bits=bits)
    assert (~np.asarray(ok)).any()


DOCS = [(f"d{i}", t) for i, t in enumerate([
    "the quick brown fox jumps over the lazy dog",
    "a fast brown fox leaps across lazy dogs daily",
    "information retrieval systems rank documents by relevance",
    "neural retrieval models learn dense representations of documents",
    "the dog sleeps all day and dreams of foxes",
    "ranking documents with learned sparse representations",
    "dense retrieval needs large document collections indexed well",
    "sparse impact lists rank fox documents quickly",
] * 40)]


def test_search_certified_is_exhaustive_exact():
    """The escalating wrapper returns full-exhaustive results for EVERY
    query, certified or escalated."""
    idx = SparseIndex.build_bm25(DOCS)
    qs = ["brown fox documents", "dense sparse retrieval",
          "lazy dog sleeps", "ranking relevance systems"]
    s_cert, i_cert, info = idx.search_certified(qs, k=8, p_cap=4,
                                                candidates=16, max_rounds=2)
    s_ex, i_ex = idx.search(qs, k=8, p_cap=idx.max_df, exact_topk=True,
                            engine="exact")
    # compare by score multiset (tie-tolerant: equal-scoring docs may swap)
    np.testing.assert_allclose(
        np.sort(s_cert, axis=1), np.sort(s_ex, axis=1), rtol=1e-3, atol=1e-3)
    assert info["certified_round"].shape == (4,)
    assert len(info["rounds"]) >= 1


def test_search_certified_no_escalation_when_generous():
    # distinct docs (tie-free scores): exact-score ties are inherently
    # uncertifiable by the k/k+1 gap check, so avoid the replicated corpus
    rng = np.random.default_rng(5)
    words = ("fox dog retrieval dense sparse rank document neural learn "
             "impact list index query term weight score fusion brown "
             "lazy quick systems relevance representations").split()
    docs = [(f"u{i}", " ".join(rng.choice(words, size=rng.integers(6, 14))))
            for i in range(300)]
    idx = SparseIndex.build_bm25(docs)
    qs = ["brown fox documents", "dense sparse retrieval"]
    _, _, info = idx.search_certified(qs, k=5, p_cap=idx.max_df,
                                      candidates=512)
    assert (info["certified_round"] == 0).all()


def test_certified_presorted_is_sound(device_index, queries, csr):
    """The presorted dual layout's certified path: same soundness
    contract, hidden-mass bound taken from the window-min impact (the
    doc-ordered window has no meaningful edge position)."""
    from qpp_fusion_rag_tpu.ops.sparse import pack_postings_presorted

    offsets, docs, weights = csr
    packed, off32, sc, dp, ds, bits = device_index
    qt, qw = queries
    true = host_scores(csr, np.asarray(qt), np.asarray(qw))
    for p_cap in (128, 512):
        pre, o2, _ = pack_postings_presorted(
            docs, weights, offsets, cap=p_cap, scales=np.asarray(sc))
        s, ids, cert, slack = sparse_score_topk_q8_certified(
            jnp.asarray(pre), jnp.asarray(o2.astype(np.int32)), sc,
            dp, ds, qt, qw, k=K, p_cap=p_cap, candidates=256,
            imp_bits=bits, presorted=True)
        ids, cert = np.asarray(ids), np.asarray(cert)
        assert np.isfinite(np.asarray(slack)).all()
        assert cert.any(), f"nothing certified at p_cap={p_cap}"
        for b in range(qt.shape[0]):
            if cert[b]:
                assert_true_topk(true[b], ids[b], K)
        # plain and presorted layouts score the same impact windows: the
        # certified fractions must agree closely (pool-edge ties may
        # shift single queries)
        _, _, cert_p, _ = sparse_score_topk_q8_certified(
            packed, off32, sc, dp, ds, qt, qw, k=K, p_cap=p_cap,
            candidates=256, imp_bits=bits)
        assert abs(int(cert.sum()) - int(np.asarray(cert_p).sum())) <= 2


def test_certified_capped_doc_vectors_sound(csr, queries):
    """doc_cap-truncated doc vectors + tail_max: certificates must stay
    sound (certified => true top-k) even though stored rescores
    under-count truncated docs; the tail bound makes long docs harder to
    certify, never mis-certified."""
    offsets, docs, weights = csr
    qt, qw = queries
    true = host_scores(csr, np.asarray(qt), np.asarray(qw))
    bits = doc_vector_imp_bits(len(offsets) - 1)
    packed, scales = pack_postings(docs, weights, offsets)

    # a cap below the longest doc so truncation really happens, but rare
    # (q99, the intended production setting: cap = next tile multiple
    # >= the q99 doc length) so most pooled candidates stay exact
    doc_lens = np.bincount(docs, minlength=N_DOCS)
    cap = max(int(np.percentile(doc_lens[doc_lens > 0], 99)), 4)
    dp, ds, td, tail = pack_doc_vectors(offsets, docs, weights, N_DOCS,
                                        imp_bits=bits, doc_cap=cap,
                                        return_tail=True)
    assert td == cap and (tail > 0).any(), "fixture must truncate docs"

    s, ids, cert, slack = sparse_score_topk_q8_certified(
        jnp.asarray(packed), jnp.asarray(offsets.astype(np.int32)),
        jnp.asarray(scales), jnp.asarray(dp), jnp.asarray(ds), qt, qw,
        k=K, p_cap=512, candidates=256, imp_bits=bits,
        tail_max=jnp.asarray(tail))
    ids, cert = np.asarray(ids), np.asarray(cert)
    assert cert.any(), "nothing certified with a generous window"
    for b in range(qt.shape[0]):
        if cert[b]:
            assert_true_topk(true[b], ids[b], K)
    # tail bound must BIND: the same query set certifies no more than
    # the uncapped vectors do
    dp0, ds0, _ = pack_doc_vectors(offsets, docs, weights, N_DOCS,
                                   imp_bits=bits)
    _, _, cert0, _ = sparse_score_topk_q8_certified(
        jnp.asarray(packed), jnp.asarray(offsets.astype(np.int32)),
        jnp.asarray(scales), jnp.asarray(dp0), jnp.asarray(ds0), qt, qw,
        k=K, p_cap=512, candidates=256, imp_bits=bits)
    assert int(cert.sum()) <= int(np.asarray(cert0).sum())


def test_search_certified_engine_alias(csr):
    """SparseIndex.search(engine='certified') routes through the
    escalation ladder and matches the exact engine's result set."""
    offsets, docs, weights = csr
    doc_lens = np.bincount(docs, minlength=N_DOCS)
    idx = SparseIndex(offsets, docs, weights, doc_lens,
                      [f"d{i}" for i in range(N_DOCS)], vocab_dump="")
    qt, qw = zipf_queries(offsets, 4, n_terms=8, seed=21)
    idx.query_encoder = lambda texts, mt: (np.asarray(qt)[:len(texts)],
                                           np.asarray(qw)[:len(texts)])
    s_c, i_c = idx.search(["q"] * 4, k=K, engine="certified")
    s_e, i_e = idx.search(["q"] * 4, k=K, engine="exact")
    # compare score multisets (tie-tolerant: the certificate's contract
    # allows swaps among docs whose true scores tie at the boundary)
    np.testing.assert_allclose(np.sort(s_c, axis=1), np.sort(s_e, axis=1),
                               rtol=1e-4, atol=1e-4)
