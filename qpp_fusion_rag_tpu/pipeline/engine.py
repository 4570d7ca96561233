"""The flagship device pipeline: retrieve → QPP → weight → fuse in one jit.

The reference runs this as five processes communicating through TREC files
(reference scripts/02_retrieve.py → 03_qpp.py → 05_fusion.py). Here the whole
per-batch path is a single compiled program:

    q_emb [B, D] ── multi-view dense top-k ──> scores/ids [R, B, K]
                 ── QPP kernel (13 stats)  ──> qpp [R, B, 13]
                 ── weight source (QPP column or learned MLP) ──> w [R, B]
                 ── segmented-aggregation fusion ──> fused [B, K_out]

plus a jitted training step for the learned-fusion MLP (soft cross-entropy
on quality soft-targets, reference scripts/04_train_fusion.py semantics).

Multi-chip: `mesh` switches retrieval to the shard_map corpus-parallel path;
QPP/fusion/MLP shard over the batch (data) axis; MLP gradients all-reduce
automatically under jit's sharding propagation.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from qpp_fusion_rag_tpu.ops import dense as D
from qpp_fusion_rag_tpu.ops import fusion as F
from qpp_fusion_rag_tpu.ops import qpp as Q
from qpp_fusion_rag_tpu.models.mlp import init_mlp_params, mlp_apply, soft_cross_entropy


def _row_minmax_scores(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-(retriever, query) min-max — the .norm.res contract on device
    (reference src/retrievers/base.py:60-73); shares ops.fusion's kernel."""
    return F._row_minmax(vals, valid, fill=-jnp.inf)


def weight_and_fuse(ids, norm, weights, method=F.COMBSUM, k_out=100):
    """Shared back half: weighted segmented-aggregation fusion."""
    return F.fuse_kernel(
        ids, norm, weights, method=method, minmax_norm=False, k_out=k_out
    )


def _retrieve_qpp_norm(q_emb, view_proj, corpus, text_feats, k, chunk, use_pallas,
                       corpus_transposed=False, corpus_scale=None,
                       qpp_norm_stats=None):
    """Shared pipeline front half: retrieval + QPP + .norm.res scores.
    Both the QPP-weighted and learned serving paths build on this, so
    kernel-path fixes apply to every flagship step at once.

    When ``corpus_scale`` is given, ``corpus`` is an int8 [Dv, N] quantized
    matrix with per-doc scales and retrieval runs on the MXU's int8 mode
    (1.6x the bf16 rate on v5e; see ops.pallas.pallas_dense_topk_int8)."""
    if corpus_scale is not None:
        from qpp_fusion_rag_tpu.ops.pallas.dense_topk import pallas_multi_view_topk_int8

        vals, ids = pallas_multi_view_topk_int8(
            q_emb, view_proj, corpus, corpus_scale, k=k
        )
    elif use_pallas:
        from qpp_fusion_rag_tpu.ops.pallas.dense_topk import pallas_multi_view_topk

        vals, ids = pallas_multi_view_topk(q_emb, view_proj, corpus, k=k,
                                           transposed=corpus_transposed)
    else:
        if corpus_transposed:
            raise ValueError("transposed corpus requires use_pallas=True")
        vals, ids = D.multi_view_topk(q_emb, view_proj, corpus, k=k, chunk=chunk)
    qpp = qpp_from_runs(vals, ids, text_feats, stats=qpp_norm_stats)
    norm = _row_minmax_scores(vals, ids >= 0)
    return vals, ids, qpp, norm


def qpp_from_runs(
    vals: jnp.ndarray,        # [R, B, K] raw retrieval scores (desc)
    ids: jnp.ndarray,         # [R, B, K] (-1 pad)
    text_feats: jnp.ndarray,  # [B, 4]
    cutoff: int = Q.DEFAULT_CUTOFF,
    normalize: bool = True,
    stats: Optional[jnp.ndarray] = None,   # [R, 2, 13] frozen calibration
) -> jnp.ndarray:
    """-> qpp [R, B, 13]; per-retriever cross-query min-max normalized —
    in-batch (analogue of reference src/qpp.py:340-374; degenerate columns
    get 0.5 so weights never all vanish) or, with `stats`, against frozen
    calibration extrema (batch-size-invariant; Q.qpp_calibration_stats)."""
    n_valid = jnp.sum(ids >= 0, axis=-1).astype(jnp.int32)          # [R, B]
    clean = jnp.where(ids >= 0, vals, 0.0)
    kern = partial(Q.qpp_kernel, cutoff=cutoff)
    qpp = jax.vmap(kern, in_axes=(0, 0, None))(clean, n_valid, text_feats)
    if stats is not None:
        return Q.normalize_qpp_with(qpp, stats)
    if normalize:
        qpp = Q.normalize_qpp_with(qpp, None)
    return qpp


@partial(
    jax.jit,
    static_argnames=("k", "chunk", "k_out", "method", "qpp_index", "use_pallas",
                     "corpus_transposed"),
)
def fused_retrieval_step(
    q_emb: jnp.ndarray,       # [B, D]
    view_proj: jnp.ndarray,   # [R, D, Dv]
    corpus: jnp.ndarray,      # [N, Dv] ([Dv, N] when corpus_transposed/int8)
    text_feats: jnp.ndarray,  # [B, 4]
    k: int = 100,
    chunk: int = 16384,
    k_out: int = 100,
    method: int = F.COMBSUM,
    qpp_index: int = 5,       # RSD (reference default weight source)
    use_pallas: bool = False,
    corpus_transposed: bool = False,
    corpus_scale: jnp.ndarray = None,   # [1, N] f32 -> int8 quantized path
    qpp_norm_stats: jnp.ndarray = None,  # [R, 2, 13] frozen calibration
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused-retrieval forward step -> (fused_ids [B, k_out],
    fused_scores [B, k_out], qpp [R, B, 13]). Multi-chip execution comes
    from jit sharding propagation over pre-sharded inputs (see
    __graft_entry__.dryrun_multichip)."""
    _vals, ids, qpp, norm = _retrieve_qpp_norm(
        q_emb, view_proj, corpus, text_feats, k, chunk, use_pallas,
        corpus_transposed=corpus_transposed, corpus_scale=corpus_scale,
        qpp_norm_stats=qpp_norm_stats,
    )
    fused_ids, fused_scores = weight_and_fuse(
        ids, norm, qpp[..., qpp_index], method=method, k_out=k_out
    )
    return fused_ids, fused_scores, qpp


@partial(jax.jit, static_argnames=("k", "chunk", "k_out", "use_pallas",
                                   "corpus_transposed"))
def learned_fused_retrieval_step(
    mlp_params,
    q_emb: jnp.ndarray,       # [B, D]
    view_proj: jnp.ndarray,   # [R, D, Dv]
    corpus: jnp.ndarray,      # [N, Dv] ([Dv, N] when corpus_transposed/int8)
    text_feats: jnp.ndarray,  # [B, 4]
    k: int = 100,
    chunk: int = 16384,
    k_out: int = 100,
    use_pallas: bool = False,
    corpus_transposed: bool = False,
    corpus_scale: jnp.ndarray = None,   # [1, N] f32 -> int8 quantized path
    qpp_norm_stats: jnp.ndarray = None,  # [R, 2, 13] frozen calibration
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Learned-fusion forward: retrieval → QPP features → MLP softmax
    weights → weighted CombSUM, one compiled program (serving-path analogue
    of reference learned_fusion, src/fusion.py:387-448)."""
    _vals, ids, qpp, norm = _retrieve_qpp_norm(
        q_emb, view_proj, corpus, text_feats, k, chunk, use_pallas,
        corpus_transposed=corpus_transposed, corpus_scale=corpus_scale,
        qpp_norm_stats=qpp_norm_stats,
    )
    R, B, M = qpp.shape
    feats = jnp.transpose(qpp, (1, 0, 2)).reshape(B, R * M)
    weights = jax.nn.softmax(mlp_apply(mlp_params, feats), axis=-1).T  # [R, B]
    fused_ids, fused_scores = weight_and_fuse(ids, norm, weights, k_out=k_out)
    return fused_ids, fused_scores, qpp


# =============================================================================
# Learned-fusion training step (jittable, mesh-shardable)
# =============================================================================

class TrainState(NamedTuple):
    params: list
    opt_state: optax.OptState


def make_train_state(
    key: jax.Array,
    n_retrievers: int,
    n_qpp_features: int,
    hidden_sizes=(32, 16),
    learning_rate: float = 1e-3,
) -> Tuple[TrainState, optax.GradientTransformation]:
    sizes = [n_qpp_features, *hidden_sizes, n_retrievers]
    params = init_mlp_params(key, sizes)
    opt = optax.adam(learning_rate)
    return TrainState(params, opt.init(params)), opt


def learned_fusion_train_step(
    state: TrainState,
    opt: optax.GradientTransformation,
    q_emb: jnp.ndarray,       # [B, D]
    targets: jnp.ndarray,     # [B, R] soft quality targets
    view_proj: jnp.ndarray,   # [R, D, Dv]
    corpus: jnp.ndarray,      # [N, Dv]
    text_feats: jnp.ndarray,  # [B, 4]
    k: int = 100,
    chunk: int = 8192,
) -> Tuple[TrainState, jnp.ndarray]:
    """Full training step: retrieval + QPP feature extraction on device,
    then MLP soft-CE update. Retrieval/QPP carry no gradient (targets are
    externally computed quality labels, reference 04_train_fusion.py:76-105).
    """
    vals, ids = D.multi_view_topk(q_emb, view_proj, corpus, k=k, chunk=chunk)
    qpp = qpp_from_runs(vals, ids, text_feats)                    # [R, B, 13]
    R, B, M = qpp.shape
    feats = jax.lax.stop_gradient(
        jnp.transpose(qpp, (1, 0, 2)).reshape(B, R * M)
    )

    def loss_fn(params):
        return soft_cross_entropy(mlp_apply(params, feats), targets)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state), loss
