"""Pure-JAX MLP fusion-weight model (soft cross-entropy on weight targets).

Re-expresses the reference's torch FusionMLP (reference
src/models/mlp_model.py:26-274) as a jitted optax training loop:

  * feature subset by QPP index (default RSD-only, qpp_indices=[5] →
    n_retrievers features; mlp_model.py:104-122),
  * Linear→ReLU→Dropout stack → n_retrievers logits,
  * soft cross-entropy against row-normalized quality targets
    (mlp_model.py:178-180): -sum(target * log_softmax(logits)),
  * Adam + reduce-LR-on-plateau + early stopping,
  * softmax at predict (weights are ≥0 and sum to 1 by construction).

The whole train step (forward, loss, backward, Adam update) is one jitted
function; epochs loop on host over device-resident minibatches.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from qpp_fusion_rag_tpu.config import config
from qpp_fusion_rag_tpu.models.base import BaseFusionModel


# =============================================================================
# Functional core (used by the pipeline-level jitted training step too)
# =============================================================================

def init_mlp_params(
    key: jax.Array, sizes: Sequence[int], dtype=jnp.float32
) -> List[Dict[str, jnp.ndarray]]:
    """He-init Linear stack: sizes = [in, h1, ..., out]."""
    params = []
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        fan_in = sizes[i]
        w = jax.random.normal(sub, (sizes[i], sizes[i + 1]), dtype) * jnp.sqrt(2.0 / fan_in)
        params.append({"w": w, "b": jnp.zeros((sizes[i + 1],), dtype)})
    return params


def mlp_apply(
    params: List[Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    *,
    dropout: float = 0.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Forward to logits. Dropout active only when key is given."""
    h = x
    n = len(params)
    for i, layer in enumerate(params):
        h = h @ layer["w"] + layer["b"]
        if i < n - 1:
            h = jax.nn.relu(h)
            if dropout > 0.0 and key is not None:
                key, sub = jax.random.split(key)
                keep = jax.random.bernoulli(sub, 1.0 - dropout, h.shape)
                h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    return h


def soft_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """-mean_i sum_j t_ij * log_softmax(l)_ij (reference mlp_model.py:178-180)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


# =============================================================================
# Model class (reference-compatible surface)
# =============================================================================

class FusionMLP(BaseFusionModel):
    """MLP fusion model with QPP-index feature filtering."""

    def __init__(
        self,
        retrievers: List[str],
        n_qpp: Optional[int] = None,
        hidden_sizes: Optional[Sequence[int]] = None,
        qpp_indices: Optional[Sequence[int]] = None,
        dropout: Optional[float] = None,
        learning_rate: Optional[float] = None,
        epochs: Optional[int] = None,
        batch_size: Optional[int] = None,
        patience: Optional[int] = None,
        seed: int = 0,
    ):
        super().__init__(retrievers, n_qpp)
        mcfg = config.training.mlp
        self.qpp_indices = list(
            qpp_indices if qpp_indices is not None else mcfg.qpp_indices
        )
        default_hidden = (
            mcfg.rsd_hidden_sizes if len(self.qpp_indices) == 1 else mcfg.hidden_sizes
        )
        self.hidden_sizes = list(hidden_sizes if hidden_sizes is not None else default_hidden)
        self.dropout = float(dropout if dropout is not None else mcfg.dropout)
        self.learning_rate = float(learning_rate if learning_rate is not None else mcfg.learning_rate)
        self.epochs = int(epochs if epochs is not None else mcfg.epochs)
        self.batch_size = int(batch_size if batch_size is not None else mcfg.batch_size)
        self.patience = int(patience if patience is not None else mcfg.patience)
        self.seed = seed
        self.n_input = len(self.qpp_indices) * self.n_retrievers
        self.params: Optional[list] = None
        self.history: Dict[str, list] = {}

    # -- features ------------------------------------------------------
    def _filter_features(self, X: np.ndarray) -> np.ndarray:
        """Select the configured QPP indices from each retriever's block
        (reference src/models/mlp_model.py:104-122)."""
        cols = [
            j * self.n_qpp + i
            for j in range(self.n_retrievers)
            for i in self.qpp_indices
        ]
        return np.asarray(X, dtype=np.float32)[:, cols]

    # -- training ------------------------------------------------------
    def train(
        self,
        X_train: np.ndarray,
        Y_train: np.ndarray,
        X_val: Optional[np.ndarray] = None,
        Y_val: Optional[np.ndarray] = None,
    ) -> Dict:
        Xt = jnp.asarray(self._filter_features(X_train))
        Yt = jnp.asarray(Y_train, dtype=jnp.float32)
        has_val = (X_val is not None and Y_val is not None
                   and len(X_val) > 0)
        if has_val:
            Xv = jnp.asarray(self._filter_features(X_val))
            Yv = jnp.asarray(Y_val, dtype=jnp.float32)

        sizes = [self.n_input, *self.hidden_sizes, self.n_retrievers]
        key = jax.random.PRNGKey(self.seed)
        key, init_key = jax.random.split(key)
        params = init_mlp_params(init_key, sizes)

        lr = jnp.asarray(self.learning_rate, jnp.float32)
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=self.learning_rate)
        opt_state = opt.init(params)

        @jax.jit
        def train_step(params, opt_state, xb, yb, key, lr):
            def loss_fn(p):
                logits = mlp_apply(p, xb, dropout=self.dropout, key=key)
                return soft_cross_entropy(logits, yb)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_loss(params, x, y):
            return soft_cross_entropy(mlp_apply(params, x), y)

        n = Xt.shape[0]
        bs = min(self.batch_size, n)
        steps = max(n // bs, 1)
        best_loss, best_params, bad_epochs, lr_bad = np.inf, params, 0, 0
        history = {"train_loss": [], "val_loss": [], "lr": []}

        for epoch in range(self.epochs):
            key, perm_key = jax.random.split(key)
            perm = jax.random.permutation(perm_key, n)
            ep_loss = 0.0
            for s in range(steps):
                idx = jax.lax.dynamic_slice_in_dim(perm, s * bs, bs)
                key, dk = jax.random.split(key)
                params, opt_state, loss = train_step(
                    params, opt_state, Xt[idx], Yt[idx], dk, lr
                )
                ep_loss += float(loss)
            ep_loss /= steps
            monitor = float(eval_loss(params, Xv, Yv)) if has_val else ep_loss
            history["train_loss"].append(ep_loss)
            history["val_loss"].append(monitor if has_val else None)
            history["lr"].append(float(lr))

            if monitor < best_loss - 1e-6:
                best_loss, best_params, bad_epochs, lr_bad = monitor, params, 0, 0
            else:
                bad_epochs += 1
                lr_bad += 1
                # ReduceLROnPlateau(factor=0.5) analogue
                if lr_bad >= max(self.patience // 3, 2):
                    lr = lr * 0.5
                    lr_bad = 0
                if bad_epochs >= self.patience:
                    break

        self.params = jax.device_get(best_params)
        self.is_trained = True
        self.history = history
        return {
            "best_loss": float(best_loss),
            "epochs_run": len(history["train_loss"]),
            "history": history,
        }

    # -- inference -----------------------------------------------------
    def predict(self, X: np.ndarray) -> np.ndarray:
        if not self.is_trained:
            raise RuntimeError("FusionMLP is not trained")
        logits = mlp_apply(
            [{k: jnp.asarray(v) for k, v in layer.items()} for layer in self.params],
            jnp.asarray(self._filter_features(X)),
        )
        return np.asarray(jax.nn.softmax(logits, axis=-1), dtype=np.float32)
