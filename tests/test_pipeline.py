"""Flagship pipeline: fused retrieval step, distributed training, graft entry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



def _inputs(B=8, D=32, N=512, R=3, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, D)).astype(np.float32)
    proj = (rng.standard_normal((R, D, D)) * 0.2).astype(np.float32)
    proj[0] = np.eye(D)
    c = rng.standard_normal((N, D)).astype(np.float32)
    tf = np.tile(np.array([4.0, 4.0, 8.0, 5.0], np.float32), (B, 1))
    return q, proj, c, tf


def test_fused_retrieval_step_shapes():
    from qpp_fusion_rag_tpu.pipeline.engine import fused_retrieval_step

    q, proj, c, tf = _inputs()
    ids, scores, qpp = fused_retrieval_step(
        jnp.asarray(q), jnp.asarray(proj), jnp.asarray(c), jnp.asarray(tf),
        k=20, chunk=128, k_out=15,
    )
    assert ids.shape == (8, 15) and scores.shape == (8, 15)
    assert qpp.shape == (3, 8, 13)
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=-1) <= 1e-6)  # fused scores sorted desc
    assert np.all(np.asarray(ids)[:, 0] >= 0)
    assert np.isfinite(np.asarray(qpp)).all()


def test_distributed_forward_matches_single(cpu_mesh):
    from qpp_fusion_rag_tpu.pipeline.distributed import make_distributed_forward
    from qpp_fusion_rag_tpu.pipeline.engine import fused_retrieval_step

    q, proj, c, tf = _inputs(B=8, N=512)
    fwd = make_distributed_forward(cpu_mesh, k=20, chunk=64, k_out=15)
    d_ids, d_scores, d_qpp = fwd(jnp.asarray(q), jnp.asarray(proj), jnp.asarray(c), jnp.asarray(tf))
    s_ids, s_scores, s_qpp = fused_retrieval_step(
        jnp.asarray(q), jnp.asarray(proj), jnp.asarray(c), jnp.asarray(tf),
        k=20, chunk=64, k_out=15,
    )
    np.testing.assert_allclose(np.asarray(d_scores), np.asarray(s_scores), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_qpp), np.asarray(s_qpp), rtol=1e-4, atol=1e-5)


def test_distributed_train_step_reduces_loss(cpu_mesh):
    import optax

    from qpp_fusion_rag_tpu.pipeline.distributed import (
        make_distributed_train_step,
        shard_inputs,
    )
    from qpp_fusion_rag_tpu.pipeline.engine import make_train_state

    R = 3
    q, proj, c, tf = _inputs(B=16, N=512, R=R)
    rng = np.random.default_rng(1)
    t_raw = rng.uniform(0.1, 1.0, (16, R)).astype(np.float32)
    targets = t_raw / t_raw.sum(axis=1, keepdims=True)

    state, opt = make_train_state(
        jax.random.PRNGKey(0), n_retrievers=R, n_qpp_features=R * 13,
        learning_rate=3e-3,
    )
    step = make_distributed_train_step(cpu_mesh, opt, k=20, chunk=64)
    args = shard_inputs(cpu_mesh, q, targets, proj, c, tf)
    losses = []
    for _ in range(30):
        state, loss = step(state, *args)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.01, losses[:3] + losses[-3:]


def test_graft_entry_single_chip():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ids, scores, qpp = out
    assert np.asarray(ids).shape[0] == args[0].shape[0]


def test_graft_entry_multichip():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_learned_fused_retrieval_step():
    import jax
    from qpp_fusion_rag_tpu.models.mlp import init_mlp_params
    from qpp_fusion_rag_tpu.pipeline.engine import learned_fused_retrieval_step

    q, proj, c, tf = _inputs()
    params = init_mlp_params(jax.random.PRNGKey(0), [3 * 13, 16, 3])
    ids, scores, qpp = learned_fused_retrieval_step(
        params, jnp.asarray(q), jnp.asarray(proj), jnp.asarray(c), jnp.asarray(tf),
        k=20, chunk=128, k_out=10,
    )
    assert ids.shape == (8, 10)
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=-1) <= 1e-6)
    assert np.isfinite(s[:, 0]).all()


def test_graft_entry_multichip_16_devices():
    """Driver may dry-run at other device counts; validate 16 via subprocess
    (device count must be set before the interpreter touches the backend)."""
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    code = (
        "import os;"
        "os.environ['JAX_PLATFORMS']='cpu';"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=16';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.path.insert(0, {str(root)!r});"
        "import __graft_entry__ as ge; ge.dryrun_multichip(16); print('OK16')"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK16" in out.stdout


def test_get_qpp_index_matches_kernel_columns():
    """QPP model names must resolve to the KERNEL's column order (the layout
    this framework writes into .qpp files), not the reference table."""
    from qpp_fusion_rag_tpu.config import config
    from qpp_fusion_rag_tpu.ops.qpp import METHOD_NAMES

    assert config.get_qpp_index("RSD") == METHOD_NAMES.index("RSD")
    assert config.get_qpp_index("UEF") == METHOD_NAMES.index("UEF")
    assert config.get_qpp_index("NQC") == METHOD_NAMES.index("nqc")
    assert config.get_qpp_index("SMV") == METHOD_NAMES.index("smv")
    assert config.get_qpp_index("WIG") == METHOD_NAMES.index("wig")
    assert config.get_qpp_index("Sigma_max") == METHOD_NAMES.index("SigmaMax")
    assert config.get_qpp_index("fusion") == -1
    import pytest as _pytest
    with _pytest.raises(KeyError):
        config.get_qpp_index("BERTQPP")   # reference-only model, no kernel column


def test_single_query_fused_step_nonzero():
    """B=1 serving must not zero out all QPP weights (degenerate minmax)."""
    import jax.numpy as jnp
    import numpy as np

    from qpp_fusion_rag_tpu.pipeline.engine import fused_retrieval_step

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))
    proj = jnp.asarray(rng.normal(size=(2, 16, 16)).astype(np.float32))
    corpus = jnp.asarray(rng.normal(size=(256, 16)).astype(np.float32))
    feats = jnp.zeros((1, 4), jnp.float32)
    ids, scores, qpp = fused_retrieval_step(q, proj, corpus, feats,
                                            k=10, chunk=256, k_out=10)
    assert (np.asarray(scores) > 0).any()
    np.testing.assert_allclose(np.asarray(qpp[..., 5]), 0.5)  # degenerate -> 0.5
