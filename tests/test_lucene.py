"""Lucene 9 index decoder vs the committed REAL SPLADE impact index.

Closes the last "Missing" item from the round-3 review: the reference's
Lucene90 SPLADE postings (reference data/scifact/index/splade) are
decoded natively — BlockTree terms, LowercaseAscii/LZ4 suffixes,
PFOR/ForUtil postings — and imported into the TPU-native CSR serving
path. Every layer is checked against the segment's own metadata.
Skipped when the reference tree is absent.
"""

import numpy as np
import pytest

from pathlib import Path

REF = Path("/root/reference/data/scifact/index/splade")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not (REF / "_h_Lucene90_0.tim").exists(),
    reason="reference SPLADE Lucene index not available",
)]


@pytest.fixture(scope="module")
def metas():
    from qpp_fusion_rag_tpu.index.lucene import read_fnm, read_tmd

    fnm = read_fnm(REF / "_h.fnm")
    return fnm, read_tmd(REF / "_h_Lucene90_0.tmd",
                         {k: v["index_options"] >= 2
                          for k, v in fnm.items()})


def test_field_metadata(metas):
    fnm, tmd = metas
    names = {v["name"]: k for k, v in fnm.items()}
    c = tmd[names["contents"]]
    assert c.num_terms == 16385
    assert c.sum_df == 975230
    assert c.sum_ttf == 47317323
    assert c.doc_count == 5183
    i = tmd[names["id"]]
    assert i.num_terms == 5183 and i.sum_df == 5183


def test_term_enumeration_totals(metas):
    from qpp_fusion_rag_tpu.index.lucene import enumerate_terms

    _, tmd = metas
    terms = enumerate_terms(REF / "_h_Lucene90_0.tim", tmd[1], True)
    assert len(terms) == 16385
    assert sum(t.df for t in terms) == 975230
    assert sum(t.ttf for t in terms) == 47317323
    assert all(terms[i].text < terms[i + 1].text
               for i in range(len(terms) - 1))


def test_forutil_roundtrip():
    """encode_reference <-> table-driven decode, all practical widths."""
    from qpp_fusion_rag_tpu.index.lucene import (
        _encode_reference, _for_unpack)

    rng = np.random.RandomState(0)
    for bits in (1, 2, 3, 5, 7, 8, 9, 13, 16, 17, 24):
        vals = rng.randint(0, 1 << bits, 128).tolist()
        enc = _encode_reference(vals, bits)
        assert len(enc) == 16 * bits
        dec = _for_unpack(np.frombuffer(enc, np.uint8), bits)
        assert dec.tolist() == vals, f"bits={bits}"


def test_postings_oracles_sample(metas):
    """Doc ids strictly increasing and in range; freq sums equal each
    term's totalTermFreq — across VInt, PFOR, and singleton paths."""
    from qpp_fusion_rag_tpu.index.lucene import (
        decode_postings, enumerate_terms)

    _, tmd = metas
    terms = enumerate_terms(REF / "_h_Lucene90_0.tim", tmd[1], True)
    doc = (REF / "_h_Lucene90_0.doc").read_bytes()
    sample = ([t for t in terms if t.df == 1][:20]
              + [t for t in terms if 1 < t.df < 128][:50]
              + [t for t in terms if t.df >= 128][:50])
    assert len(sample) == 120
    for t in sample:
        d, f = decode_postings(doc, t, True)
        assert len(d) == t.df
        assert int(f.sum()) == t.ttf
        assert (np.diff(d) > 0).all()
        assert 0 <= d[0] and d[-1] < 5183
        assert (f >= 1).all()


@pytest.fixture(scope="module")
def impact_index():
    from qpp_fusion_rag_tpu.index.lucene import LuceneImpactIndex

    return LuceneImpactIndex.load(REF)


def test_full_load_and_docnos(impact_index):
    idx = impact_index
    assert idx.num_docs == 5183
    assert idx.num_terms == 16385
    assert len(idx.docids) == 975230
    assert int(idx.freqs.min()) >= 1 and int(idx.freqs.max()) <= 255
    # docno universe equals the Terrier index's corpus (same dataset)
    terr = Path("/root/reference/data/scifact/index/pyterrier")
    if terr.exists():
        from qpp_fusion_rag_tpu.index.terrier import TerrierIndex

        ti = TerrierIndex.load(terr)
        assert set(idx.docnos) == set(ti.docnos)


def test_serves_through_sparse_kernel(impact_index):
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk

    sp = impact_index.to_sparse_index()
    assert sp.num_postings == 975230
    # impact-ordered runs (serving invariant)
    off = np.asarray(sp.offsets)
    w = np.asarray(sp.weights)
    inner = np.ones(len(w), bool)
    inner[off[1:-1]] = False
    assert ((np.diff(w) <= 1e-6) | ~inner[1:]).all()

    vocab = {t: i for i, t in enumerate(impact_index.terms)}
    qt = np.full((1, 8), -1, np.int32)
    qw = np.zeros((1, 8), np.float32)
    for j, (t, wt) in enumerate([("cancer", 3.0), ("breast", 2.5),
                                 ("tumor", 1.5), ("cell", 0.5)]):
        qt[0, j] = vocab[t]
        qw[0, j] = wt
    s, i = sparse_score_topk(
        jnp.asarray(sp.docs), jnp.asarray(sp.weights),
        jnp.asarray(sp.offsets.astype(np.int32)),
        jnp.asarray(qt), jnp.asarray(qw), k=10, p_cap=4096)
    s, i = np.asarray(s), np.asarray(i)
    assert (i[0] >= 0).all()
    assert (np.diff(s[0]) <= 1e-4).all()
    # exact host-side check for the top hit
    dense = np.zeros(sp.num_docs)
    for j in range(8):
        if qt[0, j] < 0:
            continue
        seg = slice(off[qt[0, j]], off[qt[0, j] + 1])
        np.add.at(dense, np.asarray(sp.docs)[seg], qw[0, j] * w[seg])
    assert int(i[0, 0]) == int(dense.argmax())
    assert s[0, 0] == pytest.approx(dense.max(), rel=1e-5)


def test_native_batch_decode_matches_python(metas):
    """C++ qpp_lucene_decode_postings vs the pure-Python decoder,
    bit-identical over the whole real segment."""
    from qpp_fusion_rag_tpu.index.lucene import (
        decode_postings_batch, enumerate_terms)

    _, tmd = metas
    terms = enumerate_terms(REF / "_h_Lucene90_0.tim", tmd[1], True)
    doc = (REF / "_h_Lucene90_0.doc").read_bytes()
    off = np.zeros(len(terms) + 1, np.int64)
    for i, t in enumerate(terms):
        off[i + 1] = off[i] + t.df
    d_n, f_n = decode_postings_batch(doc, terms, True, 5183, off,
                                     native=True)
    d_p, f_p = decode_postings_batch(doc, terms, True, 5183, off,
                                     native=False)
    assert (d_n == d_p).all()
    assert (f_n == f_p).all()
