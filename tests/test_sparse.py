"""Native tokenizer/index + device BM25 scoring vs a pure-Python reference."""

import math

import numpy as np
import pytest

from qpp_fusion_rag_tpu.index.native import NativeIndexBuilder
from qpp_fusion_rag_tpu.index.sparse import SparseIndex

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier


DOCS = [
    ("d0", "the quick brown fox jumps over the lazy dog"),
    ("d1", "a fast brown fox leaps across lazy dogs daily"),
    ("d2", "information retrieval systems rank documents by relevance"),
    ("d3", "neural retrieval models learn dense representations of documents"),
    ("d4", "the dog sleeps all day and dreams of foxes"),
    ("d5", "ranking documents with learned sparse representations"),
]


def python_bm25(docs, query_terms, k1=0.9, b=0.4, stem=None):
    """Reference BM25 with the same tokenization (given pre-stemmed tokens)."""
    toks = [stem(d) for _, d in docs]
    N = len(toks)
    avgdl = sum(len(t) for t in toks) / N
    scores = np.zeros(N)
    for qt in query_terms:
        df = sum(1 for t in toks if qt in t)
        if df == 0:
            continue
        idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
        for di, t in enumerate(toks):
            tf = t.count(qt)
            if tf:
                dl = len(t)
                scores[di] += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    return scores


@pytest.fixture(scope="module")
def index():
    return SparseIndex.build_bm25(DOCS)


def test_tokenizer_stem_and_stopwords():
    b = NativeIndexBuilder()
    b.add_doc("The running dogs are quickly jumping over fences")
    b.finalize()
    vocab = set(b.vocab_dump().splitlines())
    assert "run" in vocab          # Porter: running -> run
    assert "quickli" in vocab      # Porter: quickly -> quickli
    assert "dog" in vocab          # plural stripped
    assert "the" not in vocab      # stopword
    assert "are" not in vocab


def test_index_shapes(index):
    assert index.num_docs == 6
    assert index.num_terms > 10
    assert index.offsets[-1] == index.num_postings
    # postings impact-ordered within each term
    for t in range(index.num_terms):
        w = index.weights[index.offsets[t]:index.offsets[t + 1]]
        assert np.all(np.diff(w) <= 1e-6)


def test_bm25_scores_match_python(index):
    tok = index._tokenizer()

    def stem_doc(text):
        ids, counts = tok.query_terms(text, 64)
        # expand ids back to a token multiset via vocab
        terms = index.vocab_dump.splitlines()
        out = []
        for tid, c in zip(ids, counts):
            out += [terms[tid]] * int(c)
        return out

    query = "brown fox documents"
    q_terms = stem_doc(query)
    ref = python_bm25(DOCS, q_terms, stem=stem_doc)

    scores, rows = index.search([query], k=6)
    got = np.zeros(len(DOCS))
    for s, r in zip(scores[0], rows[0]):
        if r >= 0:
            got[int(r)] = s
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_search_ranking_sane(index):
    scores, rows = index.search(["brown fox"], k=3)
    top = [index.docno(int(r)) for r in rows[0] if r >= 0]
    assert set(top[:2]) == {"d0", "d1"}  # both fox docs on top


def test_save_load_roundtrip(tmp_path, index):
    index.save(tmp_path / "idx")
    loaded = SparseIndex.load(tmp_path / "idx")
    assert loaded.num_docs == index.num_docs
    s1, r1 = index.search(["lazy dog"], k=4)
    s2, r2 = loaded.search(["lazy dog"], k=4)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    np.testing.assert_array_equal(r1, r2)


def test_p_cap_pruning(index):
    """p_cap=1 keeps only each term's best posting — scores drop, shapes hold."""
    s_full, _ = index.search(["brown fox dog"], k=6)
    s_cap, _ = index.search(["brown fox dog"], k=6, p_cap=1)
    assert s_cap[0][0] <= s_full[0][0] + 1e-6


def test_bm25_retriever(index):
    from qpp_fusion_rag_tpu.retrievers.bm25 import BM25Retriever

    r = BM25Retriever(index)
    res = r.retrieve("brown fox", "q1", top_k=3)
    assert res.query_id == "q1"
    assert res.results[0][0] in ("d0", "d1")
    assert res.results[0][2] == 1
    batch = r.retrieve_batch({"q1": "brown fox", "q2": "dense neural models"}, top_k=3)
    assert batch["q2"].results[0][0] == "d3"


def test_empty_and_oov_query(index):
    scores, rows = index.search(["zzzqqqxyz unknownterm", ""], k=3)
    assert np.all(rows == -1)


def test_quantized_index_close_to_f32(tmp_path, index):
    from qpp_fusion_rag_tpu.index.sparse import SparseIndex

    s_full, r_full = index.search(["brown fox documents"], k=6)

    qidx = SparseIndex.build_bm25(DOCS).quantize()
    assert qidx.weights.dtype == np.uint8
    s_q, r_q = qidx.search(["brown fox documents"], k=6)
    # same ranking, scores within quantization error (~0.4% per weight)
    np.testing.assert_array_equal(r_full, r_q)
    np.testing.assert_allclose(s_q, s_full, rtol=0.02, atol=1e-3)

    # save/load roundtrip preserves quantization
    qidx.save(tmp_path / "qidx")
    loaded = SparseIndex.load(tmp_path / "qidx")
    assert loaded.params["quantized"] and loaded.weights.dtype == np.uint8
    s_l, r_l = loaded.search(["brown fox documents"], k=6)
    np.testing.assert_allclose(s_l, s_q, rtol=1e-6)
    np.testing.assert_array_equal(r_l, r_q)


def test_rescore_matches_sort_path(index):
    """Sort-free rescore path agrees with the exact sort path."""
    from qpp_fusion_rag_tpu.ops.sparse import sparse_rescore_topk, sparse_score_topk
    import jax.numpy as jnp

    q_terms, q_weights = index.encode_queries(["brown fox documents", "lazy dog"])
    args = (jnp.asarray(index.docs), jnp.asarray(index.weights.astype(np.float32)),
            jnp.asarray(index.offsets), jnp.asarray(q_terms), jnp.asarray(q_weights))
    s1, i1 = sparse_score_topk(*args, k=6, p_cap=6, exact_topk=True)
    s2, i2 = sparse_rescore_topk(*args, k=6, p_cap=6)
    s1, i1, s2, i2 = map(np.asarray, (s1, i1, s2, i2))
    for b in range(2):
        a = {int(i): float(s) for s, i in zip(s1[b], i1[b]) if i >= 0}
        c = {int(i): float(s) for s, i in zip(s2[b], i2[b]) if i >= 0}
        assert set(a) == set(c)
        for d in a:
            assert abs(a[d] - c[d]) < 1e-4


def test_rescore_random_fuzz():
    from qpp_fusion_rag_tpu.ops.sparse import sparse_rescore_topk, sparse_score_topk
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    T, P = 50, 400
    counts = rng.integers(1, 20, T)
    offsets = np.zeros(T + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    Pt = int(offsets[-1])
    docs = rng.integers(0, 60, Pt).astype(np.int32)
    w = rng.uniform(0.1, 5, Pt).astype(np.float32)
    # impact-order within each term
    for t in range(T):
        s, e = offsets[t], offsets[t + 1]
        o = np.argsort(-w[s:e])
        docs[s:e], w[s:e] = docs[s:e][o], w[s:e][o]
    qt = rng.integers(0, T, (4, 8)).astype(np.int32)
    qw = np.ones((4, 8), np.float32)
    args = (jnp.asarray(docs), jnp.asarray(w), jnp.asarray(offsets),
            jnp.asarray(qt), jnp.asarray(qw))
    s1, i1 = sparse_score_topk(*args, k=10, p_cap=20, exact_topk=True)
    s2, i2 = sparse_rescore_topk(*args, k=10, p_cap=20, candidates=8)
    s1, i1, s2, i2 = map(np.asarray, (s1, i1, s2, i2))
    for b in range(4):
        a = sorted(float(s) for s, i in zip(s1[b], i1[b]) if i >= 0)
        c = sorted(float(s) for s, i in zip(s2[b], i2[b]) if i >= 0)
        np.testing.assert_allclose(c, a, rtol=1e-4, atol=1e-4)


def test_stemmer_one_char_stems_and_nul_docs():
    """Tokens that stem to one char ('ies', 'ied') must not crash the native
    stemmer; embedded NUL bytes must not split documents."""
    from qpp_fusion_rag_tpu.index.sparse import SparseIndex

    corpus = [
        ("d0", "ies ied sses agreed flies"),
        ("d1", "before\x00after normal words here"),
        ("d2", "plain document text"),
    ]
    idx = SparseIndex.build_bm25(corpus)
    assert idx.num_docs == 3                      # NUL did not split d1
    scores, rows = idx.search(["after words"], k=3)
    assert idx.docno(int(rows[0][0])) == "d1"     # both halves indexed as d1


def test_sparse_index_postings_overflow_guard():
    """Host storage keeps int64 offsets (no silent wrap while building);
    the >=2^31 guard fires at device transfer, mirroring SpladeIndex."""
    import numpy as np
    import pytest as _pytest

    from qpp_fusion_rag_tpu.index.sparse import SparseIndex

    idx = SparseIndex(
        offsets=np.array([0, 2**31], np.int64),
        docs=np.zeros(1, np.int32), weights=np.zeros(1, np.float32),
        doc_lens=np.zeros(1, np.int32), docnos=["d0"], vocab_dump="t\n",
    )
    assert idx.offsets.dtype == np.int64          # construction is fine
    with _pytest.raises(OverflowError):
        idx._offsets_i32()                        # device transfer is not


def test_packed_postings_match_unpacked(rng):
    """Packed (doc<<8 | uint8) scoring matches the f32 path within the
    8-bit impact quantization tolerance."""
    from qpp_fusion_rag_tpu.ops.sparse import (
        pack_postings,
        sparse_score_topk,
        sparse_score_topk_packed,
    )

    T, n_docs, df = 40, 300, 25
    terms = np.repeat(np.arange(T), df)
    docs = np.concatenate(
        [rng.choice(n_docs, df, replace=False) for _ in range(T)]
    ).astype(np.int32)
    w = rng.uniform(0.2, 4.0, T * df).astype(np.float32)
    order = np.lexsort((-w, terms))
    docs, w = docs[order], w[order]
    offsets = np.zeros(T + 1, np.int64)
    np.cumsum(np.bincount(terms, minlength=T), out=offsets[1:])

    B = 6
    q_terms = rng.integers(0, T, (B, 5)).astype(np.int32)
    q_terms[0, -1] = -1
    q_weights = rng.uniform(0.5, 1.5, (B, 5)).astype(np.float32)

    ref_s, ref_i = sparse_score_topk(
        docs, w, offsets.astype(np.int32), q_terms, q_weights, k=20, p_cap=df
    )
    packed, scales = pack_postings(docs, w, offsets)
    got_s, got_i = sparse_score_topk_packed(
        packed, offsets.astype(np.int32), scales, q_terms, q_weights,
        k=20, p_cap=df,
    )
    ref_s, got_s = np.asarray(ref_s), np.asarray(got_s)
    ref_i, got_i = np.asarray(ref_i), np.asarray(got_i)
    # top-20 sets overlap almost fully; scores within quantization error
    for i in range(B):
        ov = len(set(ref_i[i]) & set(got_i[i])) / 20
        assert ov >= 0.9, (i, ov)
    valid = (ref_i >= 0) & (got_i == ref_i)
    rel = np.abs(got_s[valid] - ref_s[valid]) / np.maximum(ref_s[valid], 1e-6)
    assert np.median(rel) < 0.01


def test_pack_postings_doc_id_range_guard():
    from qpp_fusion_rag_tpu.ops.sparse import pack_postings

    docs = np.array([1 << 23], dtype=np.int64)
    with pytest.raises(ValueError, match="2\\^23"):
        pack_postings(docs, np.ones(1, np.float32), np.array([0, 1]))


def test_rescore_packed_matches_sort_packed_exact_regime():
    """Packed rescore == packed sort path when the pool is exact
    (M small enough that pool selection uses lax.top_k over everything)."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops.sparse import (
        pack_postings,
        sparse_rescore_topk_packed,
        sparse_score_topk_packed,
    )

    rng = np.random.default_rng(11)
    T = 30
    counts = rng.integers(1, 15, T)
    offsets = np.zeros(T + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    Pt = int(offsets[-1])
    docs = rng.integers(0, 50, Pt).astype(np.int32)
    w = rng.uniform(0.1, 5, Pt).astype(np.float32)
    for t in range(T):
        s, e = offsets[t], offsets[t + 1]
        o = np.argsort(-w[s:e])
        docs[s:e], w[s:e] = docs[s:e][o], w[s:e][o]
    packed, scales = pack_postings(docs, w, offsets)
    qt = rng.integers(0, T, (4, 6)).astype(np.int32)
    qt[0, 3:] = -1
    qw = rng.uniform(0.5, 2.0, (4, 6)).astype(np.float32)
    args = (jnp.asarray(packed), jnp.asarray(offsets.astype(np.int32)),
            jnp.asarray(scales), jnp.asarray(qt), jnp.asarray(qw))
    s1, i1 = sparse_score_topk_packed(*args, k=10, p_cap=16, exact_topk=True)
    s2, i2 = sparse_rescore_topk_packed(*args, k=10, p_cap=16, candidates=10)
    s1, i1, s2, i2 = map(np.asarray, (s1, i1, s2, i2))
    for b in range(4):
        a = {int(i): float(s) for s, i in zip(s1[b], i1[b]) if i >= 0}
        c = {int(i): float(s) for s, i in zip(s2[b], i2[b]) if i >= 0}
        assert set(a) == set(c)
        for d in a:
            assert abs(a[d] - c[d]) < 1e-3


def test_rescore_packed_recall_zipfian():
    """At approx-pool scale the packed rescore keeps >=0.98 recall@k vs the
    exact sort path on a Zipfian index (measured 0.995+ at bench shapes with
    candidates=8; this is the small CI-sized version of that check)."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
    from qpp_fusion_rag_tpu.ops.sparse import (
        pack_postings,
        sparse_rescore_topk_packed,
        sparse_score_topk_packed,
    )

    bo, bd, bw, _ = zipf_bm25_csr(8192, vocab_size=4000, avg_doc_len=25.0,
                                  seed=5, max_postings=250_000)
    bp, bs = pack_postings(bd, bw, bo)
    qt, qw = zipf_queries(bo, 16, n_terms=8, seed=2)
    args = (jnp.asarray(bp), jnp.asarray(bo.astype(np.int32)),
            jnp.asarray(bs), qt, qw)
    K = 50
    ex_s, ex_i = sparse_score_topk_packed(*args, k=K, p_cap=256, exact_topk=True)
    rs, ri = sparse_rescore_topk_packed(*args, k=K, p_cap=256, candidates=8)
    ex_i, ri = np.asarray(ex_i), np.asarray(ri)
    recalls = []
    for b in range(16):
        truth = set(ex_i[b][ex_i[b] >= 0])
        got = set(ri[b][ri[b] >= 0])
        recalls.append(len(truth & got) / max(1, len(truth)))
    assert np.mean(recalls) >= 0.98, np.mean(recalls)


def test_q8_matches_exact_scores_closely():
    """Quantized-sort kernel: scores within ~1% of the exact pair-sort path
    and >=0.98 recall@k on a Zipfian index (bench-measured 0.992 at scale)."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
    from qpp_fusion_rag_tpu.ops.sparse import (
        pack_postings,
        sparse_score_topk_packed,
        sparse_score_topk_q8,
    )

    bo, bd, bw, _ = zipf_bm25_csr(8192, vocab_size=4000, avg_doc_len=25.0,
                                  seed=5, max_postings=250_000)
    bp, bs = pack_postings(bd, bw, bo)
    qt, qw = zipf_queries(bo, 16, n_terms=8, seed=2)
    args = (jnp.asarray(bp), jnp.asarray(bo.astype(np.int32)),
            jnp.asarray(bs), qt, qw)
    K = 50
    ex_s, ex_i = sparse_score_topk_packed(*args, k=K, p_cap=256, exact_topk=True)
    qs, qi = sparse_score_topk_q8(*args, k=K, p_cap=256, exact_topk=True)
    ex_s, ex_i, qs, qi = map(np.asarray, (ex_s, ex_i, qs, qi))
    recalls, errs = [], []
    for b in range(16):
        truth = {int(i): float(s) for i, s in zip(ex_i[b], ex_s[b]) if i >= 0}
        got = {int(i): float(s) for i, s in zip(qi[b], qs[b]) if i >= 0}
        recalls.append(len(truth.keys() & got.keys()) / max(1, len(truth)))
        errs += [abs(got[d] - truth[d]) / max(truth[d], 1e-9)
                 for d in truth.keys() & got.keys() if truth[d] > 0]
    assert np.mean(recalls) >= 0.98, np.mean(recalls)
    assert np.mean(errs) < 0.01, np.mean(errs)


def test_q8_handles_pad_terms_and_empty_query():
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops.sparse import pack_postings, sparse_score_topk_q8

    docs = np.array([3, 1, 0, 2, 4], np.int32)
    w = np.array([5.0, 3.0, 4.0, 2.0, 1.0], np.float32)
    offsets = np.array([0, 2, 5], np.int64)
    packed, scales = pack_postings(docs, w, offsets)
    qt = jnp.asarray([[0, 1], [-1, -1]], jnp.int32)
    qw = jnp.asarray([[1.0, 2.0], [1.0, 1.0]], jnp.float32)
    s, i = sparse_score_topk_q8(
        jnp.asarray(packed), jnp.asarray(offsets.astype(np.int32)),
        jnp.asarray(scales), qt, qw, k=3, p_cap=4)
    s, i = np.asarray(s), np.asarray(i)
    assert (i[1] == -1).all()          # empty query -> all padded
    assert i[0, 0] in (0, 3)           # top doc from the real postings
    assert np.isfinite(s[0, 0])


def test_pallas_window_gather_interpret():
    """DMA window gather == dynamic_slice reference, including the
    unaligned-start rotate path (interpret mode on CPU)."""
    import jax
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops.pallas.window_gather import (
        ALIGN,
        gather_windows_pallas,
        pad_for_gather,
    )

    import pytest as _pytest

    rng = np.random.default_rng(0)
    flat = pad_for_gather(rng.integers(0, 2**30, 6000).astype(np.int32), 1024)
    assert len(flat) % ALIGN == 0
    src = jnp.asarray(flat)
    # starts exercise off == 0, off < 128, off across sublanes, near-end
    base = [0, 1, 127, 128, 129, 1023, 1024, 1025, 2048, 3000, 4095, 5000]
    starts = np.resize(np.asarray(base, np.int32), 32)
    out = gather_windows_pallas(src, jnp.asarray(starts), 1024)
    ref = np.stack([flat[s:s + 1024] for s in starts])
    np.testing.assert_array_equal(np.asarray(out), ref)
    # >1 grid step exercises the double-buffered slot rotation (odd and
    # even steps read different scratch slots; 3 steps cover both parities
    # plus the no-prefetch epilogue)
    starts3 = np.resize(
        rng.permutation(np.arange(0, 5000, dtype=np.int32)), 96)
    out3 = gather_windows_pallas(src, jnp.asarray(starts3), 1024)
    ref3 = np.stack([flat[s:s + 1024] for s in starts3])
    np.testing.assert_array_equal(np.asarray(out3), ref3)
    # cap must be ALIGN-aligned: 256 lowers to an 10-row tpu.dynamic_rotate
    # that Mosaic rejects on hardware — the validator must refuse it
    with _pytest.raises(ValueError, match="multiple of 1024"):
        gather_windows_pallas(src, jnp.asarray(starts), 256)


def test_dma_gather_matches_fallback_in_kernel():
    """sparse_score_topk_packed with dma_gather forced on (interpret mode)
    equals the vmap fallback path."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
    from qpp_fusion_rag_tpu.ops.sparse import (
        pack_postings,
        sparse_score_topk_packed,
    )

    bo, bd, bw, _ = zipf_bm25_csr(4096, vocab_size=2000, avg_doc_len=20.0,
                                  seed=3, max_postings=120_000)
    bp, bs = pack_postings(bd, bw, bo)
    qt, qw = zipf_queries(bo, 8, n_terms=4, seed=1)   # G = 32
    args = (jnp.asarray(bp), jnp.asarray(bo.astype(np.int32)),
            jnp.asarray(bs), qt, qw)
    s1, i1 = sparse_score_topk_packed(*args, k=20, p_cap=1024,
                                      exact_topk=True, dma_gather=False)
    s2, i2 = sparse_score_topk_packed(*args, k=20, p_cap=1024,
                                      exact_topk=True, dma_gather=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_q8_bitonic_matches_lax_sort():
    """q8 kernel with the Pallas bitonic sort (interpret mode) == the
    lax.sort path, at a power-of-two M."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
    from qpp_fusion_rag_tpu.ops.sparse import pack_postings, sparse_score_topk_q8

    bo, bd, bw, _ = zipf_bm25_csr(4096, vocab_size=2000, avg_doc_len=20.0,
                                  seed=3, max_postings=120_000)
    bp, bs = pack_postings(bd, bw, bo)
    qt, qw = zipf_queries(bo, 8, n_terms=4, seed=1)   # M = 4*256 = 1024
    args = (jnp.asarray(bp), jnp.asarray(bo.astype(np.int32)),
            jnp.asarray(bs), qt, qw)
    s1, i1 = sparse_score_topk_q8(*args, k=20, p_cap=256,
                                  exact_topk=True, bitonic=False)
    s2, i2 = sparse_score_topk_q8(*args, k=20, p_cap=256,
                                  exact_topk=True, bitonic=True)
    s1, i1, s2, i2 = map(np.asarray, (s1, i1, s2, i2))
    # the fused kernel's integer run sums are EXACT while the lax.sort
    # path's f32 cumsum-differences carry ~1e-5 jitter, so exact-tie
    # ordering may differ — compare per-doc score maps, and allow the
    # k-th-place BOUNDARY to swap between docs tied at the k-th score
    # (the two paths also break integer ties differently: _bitonic_pool
    # by position key, lax.top_k by first occurrence)
    for b in range(len(s1)):
        a = {int(i): float(s) for i, s in zip(i1[b], s1[b]) if i >= 0}
        c = {int(i): float(s) for i, s in zip(i2[b], s2[b]) if i >= 0}
        kth = min(min(a.values()), min(c.values()))
        for d in set(a) ^ set(c):
            s = a.get(d, c.get(d))
            assert abs(s - kth) <= 1e-3 * max(1.0, abs(kth)), (d, s, kth)
        for d in set(a) & set(c):
            assert abs(a[d] - c[d]) <= 1e-3 * max(1.0, abs(a[d]))
    np.testing.assert_allclose(np.sort(s1, axis=1), np.sort(s2, axis=1),
                               rtol=1e-3, atol=1e-4)


def test_bitonic_sort_rows_small():
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops.pallas.bitonic import bitonic_sort_rows

    rng = np.random.default_rng(1)
    x = rng.integers(-2**31, 2**31 - 1, (8, 1024), np.int64).astype(np.int32)
    out = np.asarray(bitonic_sort_rows(jnp.asarray(x)))
    np.testing.assert_array_equal(out, np.sort(x, axis=1))


def test_bitonic_segsum_max_run_matches_full_span():
    """bitonic_segsum_rows(max_run=Tq) == the full log2(M)-stage scan on
    every real (non-sentinel) position: the scan's span only has to
    cover the longest real run, and sentinel runs' sums are masked by
    callers (sids >= 0x7FFFFF)."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops.pallas.bitonic import bitonic_segsum_rows

    rng = np.random.default_rng(3)
    B, M, Tq = 8, 2048, 16
    docs = rng.integers(0, 5000, size=(B, M)).astype(np.int32)
    assert all(np.max(np.unique(r, return_counts=True)[1]) <= Tq
               for r in docs)
    keys = (docs << 8) | rng.integers(0, 256, (B, M)).astype(np.int32)
    keys[:, -200:] = 2**31 - 1   # ascending-pad sentinel run >> Tq long
    keys[:, :5] = -(2**31)       # descending-window sentinel
    for plus_one in (False, True):
        s_full, i_full = bitonic_segsum_rows(jnp.asarray(keys),
                                             plus_one=plus_one)
        s_cap, i_cap = bitonic_segsum_rows(jnp.asarray(keys),
                                           plus_one=plus_one, max_run=Tq)
        np.testing.assert_array_equal(np.asarray(i_full), np.asarray(i_cap))
        real = np.asarray(i_full) < 0x7FFFFF
        np.testing.assert_array_equal(np.asarray(s_full)[real],
                                      np.asarray(s_cap)[real])


def test_search_q8_engine(index):
    """engine='q8' serves the same ranking as exact on the toy index."""
    s_ex, r_ex = index.search(["brown fox documents", "lazy dog"], k=6)
    s_q8, r_q8 = index.search(["brown fox documents", "lazy dog"], k=6,
                              engine="q8")
    np.testing.assert_array_equal(r_ex, r_q8)
    np.testing.assert_allclose(s_q8, s_ex, rtol=0.02, atol=1e-3)
    with pytest.raises(ValueError):
        index.search(["x"], engine="nope")


def test_sparse_index_q8r_engine_matches_exact():
    """SparseIndex.search(engine='q8r') — the rank-safe serving engine —
    reproduces the exact engine's ranking when the pool covers the corpus."""
    from qpp_fusion_rag_tpu.index.sparse import SparseIndex

    rng = np.random.default_rng(5)
    vocab = [f"term{i}" for i in range(80)]
    corpus = []
    for d in range(300):
        words = rng.choice(vocab, size=rng.integers(5, 25), replace=True)
        corpus.append((f"d{d}", " ".join(words)))
    idx = SparseIndex.build_bm25(corpus)

    queries = ["term1 term7 term40", "term3 term3 term12 term77"]
    s_exact, i_exact = idx.search(queries, k=20, engine="exact")
    s_q8r, i_q8r = idx.search(queries, k=20, engine="q8r", candidates=512)
    for b in range(len(queries)):
        # same docs, except that 14-bit impact quantization may legally
        # swap true near-ties at the k boundary: any disagreement must
        # involve only docs whose exact scores sit within quantization
        # distance of the k-th exact score
        got = set(i_q8r[b][i_q8r[b] >= 0].tolist())
        want = set(i_exact[b][i_exact[b] >= 0].tolist())
        kth = s_exact[b][s_exact[b] > -np.inf][-1]
        s_full, i_full = idx.search([queries[b]], k=idx.num_docs,
                                    engine="exact")
        full = dict(zip(i_full[0].tolist(), s_full[0].tolist()))
        for d in got ^ want:
            assert abs(full[d] - kth) < 1e-3 * max(abs(kth), 1.0), \
                f"doc {d} not a boundary tie ({full[d]} vs kth {kth})"
        valid = i_q8r[b] >= 0
        np.testing.assert_allclose(s_q8r[b][valid], s_exact[b][valid],
                                   rtol=2e-2)


def test_bitonic_start_block_skips_presorted_rounds():
    """bitonic_sort_rows with start_block=2*bs on input whose aligned
    bs-blocks are pre-sorted alternately asc/desc == a full sort."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops.pallas.bitonic import bitonic_sort_rows

    rng = np.random.default_rng(7)
    B, M, bs = 8, 2048, 256
    x = rng.integers(-2**31, 2**31 - 1, (B, M), np.int64).astype(np.int32)
    blocks = x.reshape(B, M // bs, bs)
    blocks.sort(axis=-1)
    blocks[:, 1::2] = blocks[:, 1::2, ::-1]          # odd blocks descending
    x = blocks.reshape(B, M)
    out = np.asarray(bitonic_sort_rows(jnp.asarray(x), start_block=2 * bs))
    np.testing.assert_array_equal(out, np.sort(x, axis=1))


def _presorted_fixture(seed=9, n_docs=4096, vocab=2000, B=8, n_terms=4,
                       cap=256):
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
    from qpp_fusion_rag_tpu.ops.sparse import (
        pack_postings,
        pack_postings_presorted,
    )

    bo, bd, bw, _ = zipf_bm25_csr(n_docs, vocab_size=vocab, avg_doc_len=20.0,
                                  seed=seed, max_postings=120_000)
    qt, qw = zipf_queries(bo, B, n_terms=n_terms, seed=1)
    qt = np.asarray(qt).copy()
    qt[0, -1] = -1                                   # odd-slot pad window
    qt[1, 0] = -1                                    # even-slot pad window
    packed, scales = pack_postings(bd, bw, bo)
    pre, off2, scales2 = pack_postings_presorted(bd, bw, bo, cap=cap)
    np.testing.assert_allclose(scales, scales2)      # same quantization grid
    plain = (jnp.asarray(packed), jnp.asarray(bo.astype(np.int32)),
             jnp.asarray(scales), jnp.asarray(qt), qw)
    dual = (jnp.asarray(pre), jnp.asarray(off2.astype(np.int32)),
            jnp.asarray(scales), jnp.asarray(qt), qw)
    return plain, dual


def _score_maps(s, i):
    s, i = np.asarray(s), np.asarray(i)
    return [{int(d): float(v) for d, v in zip(i[b], s[b]) if d >= 0}
            for b in range(len(s))]


@pytest.mark.parametrize("bitonic", [True, False])
def test_q8_presorted_matches_plain_layout(bitonic):
    """sparse_score_topk_q8 over the dual doc-ordered layout (presorted
    skip-rounds path AND the lax.sort fallback) == the plain impact-
    ordered layout at p_cap == build cap: same candidate set, same
    quantization, same scores."""
    from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk_q8

    plain, dual = _presorted_fixture(cap=256)
    s1, i1 = sparse_score_topk_q8(*plain, k=20, p_cap=256,
                                  exact_topk=True, bitonic=bitonic)
    s2, i2 = sparse_score_topk_q8(*dual, k=20, p_cap=256,
                                  exact_topk=True, bitonic=bitonic,
                                  presorted=True)
    for a, c in zip(_score_maps(s1, i1), _score_maps(s2, i2)):
        assert set(a) == set(c)
        for d in a:
            assert abs(a[d] - c[d]) <= 1e-4 * max(1.0, abs(a[d])), (d, a[d], c[d])


def test_q8r_presorted_matches_plain_layout():
    """The rank-safe rescored scorer accepts the presorted layout and
    returns the plain layout's results (bitonic start_block path)."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops.sparse import (
        pack_doc_vectors,
        sparse_score_topk_q8_rescored,
    )
    from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr

    plain, dual = _presorted_fixture(cap=256)
    bo, bd, bw, _ = zipf_bm25_csr(4096, vocab_size=2000, avg_doc_len=20.0,
                                  seed=9, max_postings=120_000)
    dp, ds, _ = pack_doc_vectors(bo, bd, bw, n_docs=4096, imp_bits=12)
    dp, ds = jnp.asarray(dp), jnp.asarray(ds)
    s1, i1 = sparse_score_topk_q8_rescored(
        plain[0], plain[1], plain[2], dp, ds, plain[3], plain[4],
        k=20, p_cap=256, candidates=128, imp_bits=12, bitonic=True)
    s2, i2 = sparse_score_topk_q8_rescored(
        dual[0], dual[1], dual[2], dp, ds, dual[3], dual[4],
        k=20, p_cap=256, candidates=128, imp_bits=12, bitonic=True,
        presorted=True)
    for a, c in zip(_score_maps(s1, i1), _score_maps(s2, i2)):
        assert set(a) == set(c)
        for d in a:
            assert abs(a[d] - c[d]) <= 1e-4 * max(1.0, abs(a[d]))


def test_sparse_index_presorted_engine_matches_plain():
    """SparseIndex.search(engine='q8'/'q8r', presorted=True) builds the
    dual layout lazily and returns the plain engines' results."""
    from qpp_fusion_rag_tpu.index.sparse import SparseIndex

    rng = np.random.default_rng(11)
    docs = [(f"d{i}", " ".join(rng.choice([f"w{j}" for j in range(60)], 12)))
            for i in range(400)]
    idx = SparseIndex.build_bm25(docs)
    idx.quantize()
    queries = [" ".join(rng.choice([f"w{j}" for j in range(60)], 3))
               for _ in range(8)]
    for engine in ("q8", "q8r"):
        s0, i0 = idx.search(queries, k=10, p_cap=64, engine=engine)
        s1, i1 = idx.search(queries, k=10, p_cap=64, engine=engine,
                            presorted=True)
        for a, b, sa, sb in zip(i0, i1, s0, s1):
            assert set(a[a >= 0]) == set(b[b >= 0])
            np.testing.assert_allclose(sa[a >= 0], sb[b >= 0], rtol=1e-5)
    with pytest.raises(ValueError):
        idx.search(queries, k=10, engine="exact", presorted=True)


def test_q8r_sorted_gather_matches_unsorted():
    """sort_ids=True (ascending-address rescore gather) is a pure
    perf layout choice — identical results."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr
    from qpp_fusion_rag_tpu.ops.sparse import (
        pack_doc_vectors,
        sparse_score_topk_q8_rescored,
    )

    plain, _ = _presorted_fixture(cap=256)
    bo, bd, bw, _ = zipf_bm25_csr(4096, vocab_size=2000, avg_doc_len=20.0,
                                  seed=9, max_postings=120_000)
    dp, ds, _ = pack_doc_vectors(bo, bd, bw, n_docs=4096, imp_bits=12)
    dp, ds = jnp.asarray(dp), jnp.asarray(ds)
    s1, i1 = sparse_score_topk_q8_rescored(
        plain[0], plain[1], plain[2], dp, ds, plain[3], plain[4],
        k=20, p_cap=256, candidates=128, imp_bits=12)
    s2, i2 = sparse_score_topk_q8_rescored(
        plain[0], plain[1], plain[2], dp, ds, plain[3], plain[4],
        k=20, p_cap=256, candidates=128, imp_bits=12, sort_ids=True)
    for a, c in zip(_score_maps(s1, i1), _score_maps(s2, i2)):
        assert set(a) == set(c)
        for d in a:
            assert abs(a[d] - c[d]) <= 1e-5 * max(1.0, abs(a[d]))


def test_presorted_large_cap_tail_term():
    """Build cap > _MAX_DMA_CAP: the layout must pad enough tail slack
    that windows near the array end never clamp (clamping would put pad
    keys BEFORE a sorted run and break the skip-rounds entry state).
    Queries hit the LAST term so its window ends at the array tail."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops.sparse import (
        pack_postings,
        pack_postings_presorted,
        sparse_score_topk_q8,
    )

    rng = np.random.default_rng(3)
    cap = 8192
    # last term df << cap puts its window start near the data end — the
    # exact geometry where insufficient tail slack forces a clamp
    dfs = [6000, 6000, 64]
    T = len(dfs)
    docs = np.concatenate(
        [rng.choice(50_000, df, replace=False) for df in dfs]
    ).astype(np.int32)
    w = rng.random(sum(dfs)).astype(np.float32) + 0.1
    offsets = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(dfs, out=offsets[1:])
    for t in range(T):                      # impact-ordered per term
        sl = slice(offsets[t], offsets[t + 1])
        order = np.argsort(-w[sl])
        docs[sl], w[sl] = docs[sl][order], w[sl][order]
    packed, scales = pack_postings(docs, w, offsets)
    pre, off2, _ = pack_postings_presorted(docs, w, offsets, cap=cap,
                                           scales=scales)
    assert len(pre) >= int(off2[-1]) + cap  # tail slack covers the cap
    qt = np.array([[T - 1, T - 2]], dtype=np.int32).repeat(8, axis=0)
    qw = np.ones((8, 2), np.float32)
    s1, i1 = sparse_score_topk_q8(
        jnp.asarray(packed), jnp.asarray(offsets.astype(np.int32)),
        jnp.asarray(scales), jnp.asarray(qt), jnp.asarray(qw),
        k=20, p_cap=cap, exact_topk=True, bitonic=True)
    s2, i2 = sparse_score_topk_q8(
        jnp.asarray(pre), jnp.asarray(off2.astype(np.int32)),
        jnp.asarray(scales), jnp.asarray(qt), jnp.asarray(qw),
        k=20, p_cap=cap, exact_topk=True, bitonic=True, presorted=True)
    for a, c in zip(_score_maps(s1, i1), _score_maps(s2, i2)):
        assert set(a) == set(c)


def test_validate_presorted_cap_mismatch_raises():
    from qpp_fusion_rag_tpu.ops.sparse import (
        pack_postings_presorted,
        validate_presorted_cap,
    )
    from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr

    bo, bd, bw, _ = zipf_bm25_csr(4096, vocab_size=500, avg_doc_len=20.0,
                                  seed=1, max_postings=100_000)
    _, off2, _ = pack_postings_presorted(bd, bw, bo, cap=256)
    validate_presorted_cap(off2, 256)      # aligned: ok
    validate_presorted_cap(off2, 512)      # larger p_cap: slower, but safe
    with pytest.raises(ValueError):
        validate_presorted_cap(off2, 128)  # smaller: silently-wrong case


def test_q8_exact_wide_rows_stays_correct():
    """Regression: explicit bitonic=True with M > 65536 must NOT route
    exact selection through _bitonic_pool (16-bit position packing
    would corrupt sums); results must match the plain-layout truth."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.data.synthetic import zipf_bm25_csr, zipf_queries
    from qpp_fusion_rag_tpu.ops.sparse import pack_postings, sparse_score_topk_q8

    bo, bd, bw, _ = zipf_bm25_csr(4096, vocab_size=400, avg_doc_len=60.0,
                                  seed=5, max_postings=400_000)
    bp, bs = pack_postings(bd, bw, bo)
    qt, qw = zipf_queries(bo, 8, n_terms=32, seed=2)
    args = (jnp.asarray(bp), jnp.asarray(bo.astype(np.int32)),
            jnp.asarray(bs), qt, qw)
    # Tq=32, p_cap=4096 -> M = 131072 > 2^16
    s1, i1 = sparse_score_topk_q8(*args, k=10, p_cap=4096,
                                  exact_topk=True, bitonic=True)
    s2, i2 = sparse_score_topk_q8(*args, k=10, p_cap=4096,
                                  exact_topk=True, bitonic=False)
    for a, c in zip(_score_maps(s1, i1), _score_maps(s2, i2)):
        kth = min(min(a.values()), min(c.values()))
        for d in set(a) ^ set(c):
            sc = a.get(d, c.get(d))
            assert abs(sc - kth) <= 1e-3 * max(1.0, abs(kth))


def test_query_terms_truncation_prefers_rare_terms():
    """When a query has more unique terms than max_terms, the C++
    tokenizer must keep the HIGHEST-IDF (rarest) subset deterministically
    (regression: hash-bucket iteration order kept an arbitrary one)."""
    from qpp_fusion_rag_tpu.index.native import NativeIndexBuilder

    b = NativeIndexBuilder()
    # 'rare0'/'rare1' appear in 1 doc; common terms in many
    common = " ".join(f"common{j}" for j in range(10))
    for i in range(8):
        b.add_doc(common + (" rare0 rare1" if i == 0 else ""))
    b.finalize()
    vocab = b.vocab_dump().splitlines()
    ids, counts = b.query_terms(common + " rare0 rare1", 4)
    kept = {vocab[int(t)] for t in ids}
    assert "rare0" in kept and "rare1" in kept
    assert len(ids) == 4
    ids2, _ = b.query_terms(common + " rare0 rare1", 4)
    assert list(ids) == list(ids2)
