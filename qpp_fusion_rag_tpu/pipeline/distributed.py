"""Multi-chip pipeline: shard_map retrieval + sharded learned-fusion training.

Composes one jitted program per step over a (data, corpus) mesh:

  * retrieval runs corpus-parallel via shard_map (local streaming top-k,
    all-gather top-k merge over ICI — parallel.sharded),
  * QPP / fusion / MLP run batch-sharded over the data axis; cross-query
    QPP normalization and MLP gradient all-reduce come from jit's sharding
    propagation (XLA inserts the collectives).

This is the multi-chip execution contract exercised by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qpp_fusion_rag_tpu.models.mlp import mlp_apply, soft_cross_entropy
from qpp_fusion_rag_tpu.ops import dense as D
from qpp_fusion_rag_tpu.ops import fusion as F
from qpp_fusion_rag_tpu.parallel.mesh import CORPUS_AXIS, DATA_AXIS
from qpp_fusion_rag_tpu.pipeline.engine import (
    TrainState,
    _row_minmax_scores,
    qpp_from_runs,
    weight_and_fuse,
)


def _retrieval_shard_fn(mesh: Mesh, k: int, chunk: int) -> Callable:
    """shard_map'd R-view retrieval: corpus rows sharded, batch sharded."""

    def local(q, proj, c):
        vals, ids = D.multi_view_topk(q, proj, c, k=k, chunk=min(chunk, c.shape[0]))
        shard = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32)
        ids = jnp.where(ids >= 0, ids + shard * c.shape[0], -1)
        all_vals = jax.lax.all_gather(vals, CORPUS_AXIS, axis=2, tiled=True)
        all_ids = jax.lax.all_gather(ids, CORPUS_AXIS, axis=2, tiled=True)
        merged, top = jax.lax.top_k(all_vals, k)
        return merged, jnp.take_along_axis(all_ids, top, axis=-1)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(None, None, None), P(CORPUS_AXIS, None)),
        out_specs=(P(None, DATA_AXIS, None), P(None, DATA_AXIS, None)),
        check_rep=False,
    )


def make_distributed_forward(
    mesh: Mesh, k: int = 100, chunk: int = 8192, k_out: int = 100,
    method: int = F.COMBSUM, qpp_index: int = 5,
) -> Callable:
    """-> jitted (q_emb, view_proj, corpus, text_feats) -> (ids, scores, qpp)."""
    retrieve = _retrieval_shard_fn(mesh, k, chunk)

    def forward(q_emb, view_proj, corpus, text_feats):
        vals, ids = retrieve(q_emb, view_proj, corpus)
        qpp = qpp_from_runs(vals, ids, text_feats)
        norm = _row_minmax_scores(vals, ids >= 0)
        fused_ids, fused_scores = weight_and_fuse(
            ids, norm, qpp[..., qpp_index], method=method, k_out=k_out
        )
        return fused_ids, fused_scores, qpp

    return jax.jit(forward)


def make_distributed_train_step(
    mesh: Mesh,
    opt: optax.GradientTransformation,
    k: int = 100,
    chunk: int = 8192,
) -> Callable:
    """-> jitted (state, q_emb, targets, view_proj, corpus, text_feats)
    -> (state, loss). The FULL training step: sharded retrieval + QPP
    feature extraction + MLP soft-CE update in one compiled program."""
    retrieve = _retrieval_shard_fn(mesh, k, chunk)
    replicated = NamedSharding(mesh, P())

    def train_step(state: TrainState, q_emb, targets, view_proj, corpus, text_feats):
        vals, ids = retrieve(q_emb, view_proj, corpus)
        qpp = qpp_from_runs(vals, ids, text_feats)            # [R, B, 13]
        R, B, M = qpp.shape
        feats = jax.lax.stop_gradient(
            jnp.transpose(qpp, (1, 0, 2)).reshape(B, R * M)
        )
        feats = jax.lax.with_sharding_constraint(
            feats, NamedSharding(mesh, P(DATA_AXIS, None))
        )

        def loss_fn(params):
            return soft_cross_entropy(mlp_apply(params, feats), targets)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.with_sharding_constraint(grads, replicated)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), loss

    return jax.jit(train_step)


def shard_inputs(
    mesh: Mesh, q_emb, targets, view_proj, corpus, text_feats
) -> Tuple:
    """Place pipeline inputs with their canonical shardings."""
    put = jax.device_put
    return (
        put(q_emb, NamedSharding(mesh, P(DATA_AXIS, None))),
        put(targets, NamedSharding(mesh, P(DATA_AXIS, None))),
        put(view_proj, NamedSharding(mesh, P())),
        put(corpus, NamedSharding(mesh, P(CORPUS_AXIS, None))),
        put(text_feats, NamedSharding(mesh, P(DATA_AXIS, None))),
    )
