"""QPP normalization semantics: in-batch vs frozen calibration stats.

VERDICT r2 weak-item 5: the serving steps min-max QPP across the serving
batch while the reference normalizes across the whole query set
(src/qpp.py:340-374). These tests pin the semantics of both options; the
measured drift artifact lives in docs/qpp_norm_sensitivity.json.
"""

import numpy as np
import jax.numpy as jnp

from qpp_fusion_rag_tpu.ops import qpp as Q
import pytest
pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



def _raw(rng, R=5, B=64, M=13):
    return jnp.asarray(rng.normal(size=(R, B, M)).astype(np.float32))


def test_calibration_stats_are_batch_size_invariant(rng):
    """Normalizing against frozen stats must give IDENTICAL values no
    matter how the query set is batched — the whole point of the option."""
    raw = _raw(rng, B=96)
    stats = Q.qpp_calibration_stats(raw)
    full = np.asarray(Q.normalize_qpp_with(raw, stats))
    for B in (1, 7, 32, 96):
        parts = [
            np.asarray(Q.normalize_qpp_with(raw[:, lo:lo + B, :], stats))
            for lo in range(0, 96, B)
        ]
        np.testing.assert_array_equal(np.concatenate(parts, axis=1), full)


def test_calibration_matches_fullset_minmax_on_calibration_set(rng):
    """Stats frozen from the full set reproduce the reference's whole-set
    min-max exactly on that set (src/qpp.py:340-374 semantics)."""
    raw = _raw(rng)
    stats = Q.qpp_calibration_stats(raw)
    np.testing.assert_allclose(
        np.asarray(Q.normalize_qpp_with(raw, stats)),
        np.asarray(Q.normalize_qpp_with(raw, None)),
        rtol=1e-6, atol=1e-7)


def test_calibration_clips_out_of_range_queries(rng):
    """Serving queries outside the calibration range clip to [0, 1] —
    a bounded weight, never an extrapolated one."""
    raw = _raw(rng)
    stats = Q.qpp_calibration_stats(raw)
    wild = raw * 100.0
    out = np.asarray(Q.normalize_qpp_with(wild, stats))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_in_batch_minmax_is_batch_dependent(rng):
    """The in-batch default IS batch-size dependent (why calibration stats
    exist): normalizing two halves separately differs from the full set."""
    raw = _raw(rng, B=64)
    full = np.asarray(Q.normalize_qpp_with(raw, None))
    halves = np.concatenate([
        np.asarray(Q.normalize_qpp_with(raw[:, :32, :], None)),
        np.asarray(Q.normalize_qpp_with(raw[:, 32:, :], None)),
    ], axis=1)
    assert not np.allclose(halves, full)


def test_degenerate_columns_get_half(rng):
    raw = jnp.zeros((5, 8, 13))
    out = np.asarray(Q.normalize_qpp_with(raw, None))
    np.testing.assert_array_equal(out, np.full((5, 8, 13), 0.5))


def test_serving_step_accepts_stats(rng):
    """fused_retrieval_step(qpp_norm_stats=...) fuses with calibrated
    weights; two different batch splits give identical fused lists."""
    from qpp_fusion_rag_tpu.pipeline.engine import (
        fused_retrieval_step,
        qpp_from_runs,
    )
    from qpp_fusion_rag_tpu.ops.dense import multi_view_topk

    N, D, B, R = 1024, 16, 16, 3
    corpus = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    proj = jnp.asarray((rng.standard_normal((R, D, D)) * 0.2).astype(np.float32))
    tf = jnp.tile(jnp.asarray([4.0, 4.0, 8.0, 5.0], jnp.float32), (B, 1))

    vals, ids = multi_view_topk(q, proj, corpus, k=10, chunk=512)
    stats = Q.qpp_calibration_stats(
        qpp_from_runs(vals, ids, tf, normalize=False))

    full_ids, full_scores, _ = fused_retrieval_step(
        q, proj, corpus, tf, k=10, chunk=512, k_out=10,
        qpp_norm_stats=stats)
    parts = [
        fused_retrieval_step(q[lo:lo + 4], proj, corpus, tf[lo:lo + 4],
                             k=10, chunk=512, k_out=10, qpp_norm_stats=stats)
        for lo in range(0, B, 4)
    ]
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(p[0]) for p in parts]),
        np.asarray(full_ids))
    np.testing.assert_allclose(
        np.concatenate([np.asarray(p[1]) for p in parts]),
        np.asarray(full_scores), rtol=1e-6, atol=1e-7)
