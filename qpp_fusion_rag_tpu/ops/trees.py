"""Tree-ensemble inference as vectorized node-array traversal (device-side).

The reference runs LightGBM's C++ predictor for learned fusion weights
(reference src/models/lightgbm_models.py:23-241). On TPU, pointer-chasing
trees become flat node arrays and prediction becomes `depth` rounds of
gathers — every (row, tree) pair walks one step per round, so the whole
ensemble evaluates as a handful of vectorized gathers regardless of row
count. Leaf nodes self-loop (left == right == self), which makes the
fixed-depth loop exact rather than approximate.

Node-array layout per ensemble (T trees padded to N nodes each):
    feature   int32 [T, N]   split feature (-1 at leaves)
    threshold f32   [T, N]   go left iff x[f] <= threshold
    children  int32 [T, N, 2] (left, right); leaves point to themselves
    value     f32   [T, N]   leaf value (0 on internal nodes)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TreeEnsemble(NamedTuple):
    feature: jnp.ndarray    # int32 [T, N]
    threshold: jnp.ndarray  # f32   [T, N]
    children: jnp.ndarray   # int32 [T, N, 2]
    value: jnp.ndarray      # f32   [T, N]
    max_depth: int          # static traversal bound
    base_score: float       # F0 (mean of targets)
    learning_rate: float    # shrinkage applied per tree at predict


@partial(jax.jit, static_argnames=("max_depth",))
def _traverse(
    x: jnp.ndarray,         # [B, F]
    feature: jnp.ndarray,   # [T, N]
    threshold: jnp.ndarray,
    children: jnp.ndarray,
    value: jnp.ndarray,
    max_depth: int,
) -> jnp.ndarray:
    """-> per-tree leaf values [B, T]."""
    B = x.shape[0]
    T, N = feature.shape
    node = jnp.zeros((B, T), dtype=jnp.int32)
    tree_off = (jnp.arange(T, dtype=jnp.int32) * N)[None, :]   # [1, T]
    f_flat = feature.reshape(-1)
    t_flat = threshold.reshape(-1)
    l_flat = children[..., 0].reshape(-1)
    r_flat = children[..., 1].reshape(-1)

    def step(_, node):
        idx = node + tree_off                                   # [B, T] flat node ids
        f = f_flat[idx]
        go_left = jnp.take_along_axis(x, jnp.maximum(f, 0), axis=1) <= t_flat[idx]
        nxt = jnp.where(go_left, l_flat[idx], r_flat[idx])
        return jnp.where(f < 0, node, nxt)  # leaves stay put

    node = jax.lax.fori_loop(0, max_depth, step, node)
    return value.reshape(-1)[node + tree_off]


def predict_ensemble(ens: TreeEnsemble, x: jnp.ndarray) -> jnp.ndarray:
    """-> [B] boosted predictions: base + lr * sum_t leaf_t(x)."""
    leaves = _traverse(
        x.astype(jnp.float32), ens.feature, ens.threshold, ens.children,
        ens.value, ens.max_depth,
    )
    return ens.base_score + ens.learning_rate * jnp.sum(leaves, axis=-1)


def stack_trees(trees, base_score: float, learning_rate: float) -> TreeEnsemble:
    """Pack a list of host-side tree dicts into padded device arrays.

    Each tree dict has numpy arrays feature/threshold/left/right/value of
    equal per-tree length (see models.gbdt.Tree.to_arrays).
    """
    T = len(trees)
    N = max((len(t["feature"]) for t in trees), default=1)
    feature = np.full((T, N), -1, dtype=np.int32)
    threshold = np.zeros((T, N), dtype=np.float32)
    children = np.zeros((T, N, 2), dtype=np.int32)
    value = np.zeros((T, N), dtype=np.float32)
    max_depth = 1
    for ti, t in enumerate(trees):
        n = len(t["feature"])
        feature[ti, :n] = t["feature"]
        threshold[ti, :n] = t["threshold"]
        children[ti, :n, 0] = t["left"]
        children[ti, :n, 1] = t["right"]
        value[ti, :n] = t["value"]
        max_depth = max(max_depth, int(t["depth"]))
        # padding rows are self-looping leaves with value 0 already
        for j in range(n, N):
            children[ti, j] = (j, j)
    return TreeEnsemble(
        feature=jnp.asarray(feature),
        threshold=jnp.asarray(threshold),
        children=jnp.asarray(children),
        value=jnp.asarray(value),
        max_depth=max_depth,
        base_score=float(base_score),
        learning_rate=float(learning_rate),
    )
