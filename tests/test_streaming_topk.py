"""Streaming (manual-DMA) dense kernel: correctness in interpret mode."""

import numpy as np

import jax.numpy as jnp

import pytest

from qpp_fusion_rag_tpu.ops.pallas.streaming_topk import (
    MSLAB,
    SUPER,
    streaming_dense_topk,
)

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier


def test_streaming_topk_matches_exact_top1():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    c = rng.standard_normal((SUPER, 64)).astype(np.float32)
    v, i = streaming_dense_topk(jnp.asarray(q), jnp.asarray(c), k=10)
    s = q @ c.T
    exact = np.argsort(-s, -1)[:, :10]
    got = np.asarray(i)
    np.testing.assert_array_equal(got[:, 0], exact[:, 0])
    rec = np.mean([len(set(got[r].tolist()) & set(exact[r].tolist())) / 10 for r in range(8)])
    assert rec >= 0.85, rec
    np.testing.assert_allclose(
        np.asarray(v), np.take_along_axis(s, got, -1), rtol=1e-4
    )


def test_streaming_topk_row_and_corpus_padding():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((3, 32)).astype(np.float32)       # pads to MSLAB rows
    c = rng.standard_normal((SUPER + 100, 32)).astype(np.float32)  # pads corpus
    v, i = streaming_dense_topk(jnp.asarray(q), jnp.asarray(c), k=5)
    assert v.shape == (3, 5)
    assert np.asarray(i).max() < SUPER + 100
    s = q @ c.T
    np.testing.assert_array_equal(np.asarray(i)[:, 0], np.argmax(s, -1))


def test_streaming_pad_docs_do_not_displace_negative_scores():
    rng = np.random.default_rng(9)
    q = np.abs(rng.standard_normal((3, 32))).astype(np.float32)
    c = -np.abs(rng.standard_normal((SUPER - 500, 32))).astype(np.float32)
    v, i = streaming_dense_topk(jnp.asarray(q), jnp.asarray(c), k=5)
    i = np.asarray(i)
    assert np.all(i[:, 0] >= 0)
    s = q @ c.T
    np.testing.assert_array_equal(i[:, 0], np.argmax(s, axis=-1))
