"""Scatter-free segmented aggregation: fuzz vs float64 brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

from qpp_fusion_rag_tpu.ops.segment import SENTINEL, segmented_topk

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



def brute(ids, vals, k, count_bonus=False):
    acc, cnt = {}, {}
    for i, v in zip(ids, vals):
        if i == int(SENTINEL):
            continue
        acc[i] = acc.get(i, 0.0) + float(v)
        cnt[i] = cnt.get(i, 0) + 1
    scored = {i: (acc[i] * cnt[i] if count_bonus else acc[i]) for i in acc}
    top = sorted(scored.items(), key=lambda kv: -kv[1])[:k]
    return top


@pytest.mark.parametrize("count_bonus", [False, True])
@pytest.mark.parametrize("signed", [False, True])
def test_segmented_topk_fuzz(count_bonus, signed):
    rng = np.random.default_rng(0)
    for trial in range(20):
        M = int(rng.integers(10, 600))
        ids = rng.integers(0, 50, M).astype(np.int32)
        ids[rng.uniform(size=M) < 0.2] = int(SENTINEL)
        lo = -3.0 if signed else 0.0
        vals = rng.uniform(lo, 5.0, M).astype(np.float32)
        vals[ids == int(SENTINEL)] = 0.0
        k = int(rng.integers(1, 12))
        tids, tvals, tcnt = segmented_topk(
            jnp.asarray(ids), jnp.asarray(vals), k, count_bonus=count_bonus
        )
        ref = brute(ids, vals, k, count_bonus)
        got = [(int(i), float(v)) for i, v in zip(np.asarray(tids), np.asarray(tvals))
               if i >= 0]
        assert len(got) == len(ref)
        # compare as score multisets (ties may order differently)
        np.testing.assert_allclose(
            sorted(v for _, v in got), sorted(v for _, v in ref),
            rtol=1e-4, atol=1e-4,
        )


def test_segmented_topk_precision_at_scale():
    """Documented precision bound: <=1e-3 relative on top scores at M=32k."""
    rng = np.random.default_rng(1)
    M = 32768
    ids = rng.integers(0, 4000, M).astype(np.int32)
    vals = rng.uniform(0.0, 12.0, M).astype(np.float32)
    tids, tvals, _ = segmented_topk(jnp.asarray(ids), jnp.asarray(vals), 20)
    acc = np.zeros(4000, dtype=np.float64)
    np.add.at(acc, ids, vals.astype(np.float64))
    ref = acc[np.asarray(tids)]
    np.testing.assert_allclose(np.asarray(tvals), ref, rtol=1e-3)


def test_all_invalid():
    ids = jnp.full((16,), SENTINEL, dtype=jnp.int32)
    vals = jnp.zeros((16,), jnp.float32)
    tids, tvals, _ = segmented_topk(ids, vals, 5)
    assert np.all(np.asarray(tids) == -1)
