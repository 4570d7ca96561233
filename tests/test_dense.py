"""Dense streaming top-k and its mesh-sharded variant vs naive argsort."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qpp_fusion_rag_tpu.ops import dense

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



def naive_topk(q, c, k):
    s = q @ c.T
    idx = np.argsort(-s, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=-1), idx


@pytest.fixture(scope="module")
def qc(rng=np.random.default_rng(7)):
    q = rng.standard_normal((6, 32)).astype(np.float32)
    c = rng.standard_normal((1000, 32)).astype(np.float32)
    return q, c


def test_dense_topk_matches_naive(qc):
    q, c = qc
    vals, ids = dense.dense_topk(jnp.asarray(q), jnp.asarray(c), k=10, chunk=128, exact=True)
    ref_vals, ref_ids = naive_topk(q, c, 10)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5)
    # ids may differ on exact ties; verify scores at returned ids instead
    got = np.take_along_axis(q @ c.T, np.asarray(ids), axis=-1)
    np.testing.assert_allclose(got, ref_vals, rtol=1e-5)


def test_dense_topk_k_exceeds_n():
    q = jnp.ones((2, 8), jnp.float32)
    c = jnp.ones((5, 8), jnp.float32)
    vals, ids = dense.dense_topk(q, c, k=10, chunk=4, exact=True)
    assert np.all(np.asarray(ids)[:, 5:] == -1)
    assert np.all(np.isneginf(np.asarray(vals)[:, 5:]))
    assert np.all(np.asarray(ids)[:, :5] >= 0)


def test_multi_view_topk(qc):
    q, c = qc
    rng = np.random.default_rng(3)
    proj = rng.standard_normal((3, 32, 32)).astype(np.float32) * 0.2
    vals, ids = dense.multi_view_topk(jnp.asarray(q), jnp.asarray(proj), jnp.asarray(c), k=7, chunk=256, exact=True)
    assert vals.shape == (3, 6, 7)
    for r in range(3):
        ref_vals, _ = naive_topk(q @ proj[r], c, 7)
        np.testing.assert_allclose(np.asarray(vals[r]), ref_vals, rtol=1e-4, atol=1e-4)


def test_merge_topk():
    va = jnp.asarray([[5.0, 3.0, 1.0]])
    ia = jnp.asarray([[50, 30, 10]], dtype=jnp.int32)
    vb = jnp.asarray([[4.0, 2.0, 0.0]])
    ib = jnp.asarray([[40, 20, 0]], dtype=jnp.int32)
    v, i = dense.merge_topk(va, ia, vb, ib, k=4)
    np.testing.assert_allclose(np.asarray(v[0]), [5, 4, 3, 2])
    np.testing.assert_array_equal(np.asarray(i[0]), [50, 40, 30, 20])


# ---------------------------------------------------------------------------
# Sharded (8 virtual CPU devices, mesh fixture from conftest)
# ---------------------------------------------------------------------------

def test_sharded_dense_topk_matches_local(cpu_mesh, qc):
    from qpp_fusion_rag_tpu.parallel.sharded import sharded_dense_topk

    q, c = qc
    c = c[:1000 - (1000 % 4)]  # divisible by 4 corpus shards
    vals, ids = sharded_dense_topk(jnp.asarray(q), jnp.asarray(c), cpu_mesh, k=10, chunk=64, exact=True)
    ref_vals, _ = naive_topk(q, c, 10)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5)
    got = np.take_along_axis(q @ c.T, np.asarray(ids), axis=-1)
    np.testing.assert_allclose(got, ref_vals, rtol=1e-5)


def test_sharded_multi_view_topk(cpu_mesh, qc):
    from qpp_fusion_rag_tpu.parallel.sharded import sharded_multi_view_topk

    q, c = qc
    c = c[:800]
    rng = np.random.default_rng(5)
    proj = rng.standard_normal((2, 32, 32)).astype(np.float32) * 0.3
    vals, ids = sharded_multi_view_topk(
        jnp.asarray(q), jnp.asarray(proj), jnp.asarray(c), cpu_mesh, k=5, chunk=100, exact=True
    )
    assert vals.shape == (2, 6, 5)
    for r in range(2):
        ref_vals, _ = naive_topk(q @ proj[r], c, 5)
        np.testing.assert_allclose(np.asarray(vals[r]), ref_vals, rtol=1e-4, atol=1e-4)


def test_approx_topk_recall(qc):
    """Default (approx) path must keep high recall vs exact."""
    q, c = qc
    ev, ei = dense.dense_topk(jnp.asarray(q), jnp.asarray(c), k=20, chunk=250, exact=True)
    av, ai = dense.dense_topk(jnp.asarray(q), jnp.asarray(c), k=20, chunk=250, exact=False)
    ei, ai = np.asarray(ei), np.asarray(ai)
    rec = np.mean([len(set(ei[i]) & set(ai[i])) / 20 for i in range(len(ei))])
    assert rec >= 0.9, rec


def test_sharded_multi_view_indivisible_corpus():
    """Multi-view sharded retrieval must also pad/mask non-divisible corpora."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qpp_fusion_rag_tpu.parallel.mesh import build_mesh
    from qpp_fusion_rag_tpu.parallel.sharded import sharded_multi_view_topk

    mesh = build_mesh(n_data=1, n_corpus=8, devices=jax.devices()[:8])
    rng = np.random.default_rng(0)
    N, D, R = 333, 16, 3
    corpus = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(2, D)).astype(np.float32))
    proj = jnp.asarray(np.stack([np.eye(D, dtype=np.float32)] * R))
    vals, ids = sharded_multi_view_topk(queries, proj, corpus, mesh, k=7, exact=True)
    ids = np.asarray(ids)
    assert ids.shape == (R, 2, 7)
    assert (ids >= 0).all() and ids.max() < N
    ref = np.asarray(corpus) @ np.asarray(queries).T          # same for all views
    expect = np.sort(ref, axis=0)[::-1][:7].T
    for r in range(R):
        np.testing.assert_allclose(np.sort(np.asarray(vals[r]))[:, ::-1],
                                   expect, rtol=1e-4)
