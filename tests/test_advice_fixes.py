"""Regression tests for the round-3 advisor findings (ADVICE.md)."""

import numpy as np
import pytest


def _tiny_sparse_index(n_docs=300, vocab=50, seed=0):
    from qpp_fusion_rag_tpu.index.sparse import SparseIndex

    rng = np.random.RandomState(seed)
    rows = []
    offsets = [0]
    docs, weights = [], []
    for t in range(vocab):
        df = rng.randint(5, n_docs // 2)
        ds = np.sort(rng.choice(n_docs, df, replace=False))
        ws = rng.rand(df).astype(np.float32) + 0.1
        order = np.argsort(-ws)
        docs.extend(ds[order])
        weights.extend(ws[order])
        offsets.append(len(docs))
    del rows
    return SparseIndex(
        np.asarray(offsets, np.int64), np.asarray(docs, np.int32),
        np.asarray(weights, np.float32),
        np.ones(n_docs, np.int32) * 10,
        [str(i) for i in range(n_docs)],
        "\n".join(f"t{i}" for i in range(vocab)),
    )


def test_q8r_candidates_below_k_still_returns_k():
    """ADVICE #2: search(k, candidates<k) used to silently return only
    `candidates` docs padded with -1; the clamp must raise the pool to k."""
    idx = _tiny_sparse_index()
    s, i = idx.search(["t0 t1 t2 t3"], k=50, engine="q8r", candidates=16,
                      p_cap=64)
    real = (i[0] >= 0).sum()
    assert real >= 50, f"only {real} real docs returned for k=50"


def test_ensemble_doc_imp_bits_conflict_raises():
    """ADVICE #1: an explicit doc_imp_bits conflicting with the value the
    index was packed with must fail loudly, not mis-split bit fields."""
    from qpp_fusion_rag_tpu.pipeline.ensemble import resolve_doc_imp_bits

    assert resolve_doc_imp_bits(None, None) == 8
    assert resolve_doc_imp_bits(12, None) == 12
    assert resolve_doc_imp_bits(12, 12) == 12
    with pytest.raises(ValueError, match="imp_bits"):
        resolve_doc_imp_bits(12, 8)


def test_sharded_indexes_record_imp_bits():
    from qpp_fusion_rag_tpu.parallel.sharded import shard_ensemble_indexes

    idx = _tiny_sparse_index()
    csr = (idx.offsets, idx.docs, idx.weights)
    corpus = np.random.RandomState(0).rand(300, 16).astype(np.float32)
    sidx = shard_ensemble_indexes(csr, csr, corpus, 300, 2, doc_imp_bits=10)
    assert sidx.doc_imp_bits == 10


def test_xlsx_large_floats_stay_float_literals():
    """ADVICE #4: 1e300 must not be emitted as a 301-digit integer."""
    from qpp_fusion_rag_tpu.utils.xlsx import _cell_xml

    assert "<v>1e+300</v>" in _cell_xml("A1", 1e300)
    assert "<v>5</v>" in _cell_xml("A1", 5.0)
    assert "<v>2.5</v>" in _cell_xml("A1", 2.5)
    assert "<v>-1e+300</v>" in _cell_xml("A1", -1e300)


def test_term_scales_order_independent():
    """Real-data bug (round 4): term_scales_from_csr assumed impact-
    ordered runs and read each run's FIRST weight as its max; a doc-id-
    ordered import (decoded Terrier inverted file) then clamped strong
    impacts at 255 (30% top-1 score loss on real SciFact). Scales must
    be identical however runs are ordered."""
    from qpp_fusion_rag_tpu.ops.sparse import term_scales_from_csr

    offsets = np.array([0, 3, 3, 7])
    w_impact = np.array([9.0, 4.0, 1.0, 5.0, 3.0, 2.0, 0.5], np.float32)
    w_docid = np.array([1.0, 9.0, 4.0, 0.5, 5.0, 2.0, 3.0], np.float32)
    s1 = term_scales_from_csr(w_impact, offsets)
    s2 = term_scales_from_csr(w_docid, offsets)
    np.testing.assert_allclose(s1, s2)
    np.testing.assert_allclose(s1, [9.0 / 255, 1.0, 5.0 / 255], rtol=1e-6)


def test_terrier_import_is_impact_ordered():
    from pathlib import Path

    ref = Path("/root/reference/data/scifact/index/pyterrier")
    if not (ref / "data.properties").exists():
        pytest.skip("reference index unavailable")
    from qpp_fusion_rag_tpu.index.terrier import TerrierIndex

    idx = TerrierIndex.load(ref).to_sparse_index()
    off = np.asarray(idx.offsets)
    w = np.asarray(idx.weights)
    # every run non-increasing
    inner = np.ones(len(w), bool)
    inner[off[1:-1]] = False  # run starts may rise
    drops = np.diff(w) <= 1e-6
    assert (drops | ~inner[1:]).all()
