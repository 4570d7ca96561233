"""Embedding-based dense QPP: tight clusters -> high specificity."""

import numpy as np
import pytest

import jax.numpy as jnp

from qpp_fusion_rag_tpu.qpp.dense_qpp import (
    dense_qpp,
    dense_qpp_from_index,
    dense_qpp_matryoshka,
)


def test_tight_cluster_scores_higher():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    tight = q[:, None, :] + 0.01 * rng.standard_normal((2, 10, 16)).astype(np.float32)
    loose = q[:, None, :] + 2.0 * rng.standard_normal((2, 10, 16)).astype(np.float32)
    s_tight = np.asarray(dense_qpp(jnp.asarray(q), jnp.asarray(tight)))
    s_loose = np.asarray(dense_qpp(jnp.asarray(q), jnp.asarray(loose)))
    assert np.all(s_tight > s_loose)
    assert np.all((0 < s_tight) & (s_tight <= 1.0))


def test_identical_points_specificity_one():
    q = np.ones((1, 8), np.float32)
    docs = np.ones((1, 5, 8), np.float32)
    s = float(dense_qpp(jnp.asarray(q), jnp.asarray(docs), k=5)[0])
    assert s == pytest.approx(1.0)


def test_matryoshka_levels():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((3, 32)).astype(np.float32)
    docs = q[:, None, :] + 0.1 * rng.standard_normal((3, 8, 32)).astype(np.float32)
    m = np.asarray(dense_qpp_matryoshka(jnp.asarray(q), jnp.asarray(docs), k=8))
    assert m.shape == (3,)
    assert np.all((0 < m) & (m <= 1.0))


def test_from_index_with_padding():
    rng = np.random.default_rng(2)
    emb = rng.standard_normal((50, 8)).astype(np.float32)
    q = emb[:2]
    ids = np.array([[0, 1, 2, -1, -1], [3, 4, -1, -1, -1]])
    s = np.asarray(dense_qpp_from_index(q, ids, emb, k=5))
    assert s.shape == (2,)
    assert np.all(np.isfinite(s))
