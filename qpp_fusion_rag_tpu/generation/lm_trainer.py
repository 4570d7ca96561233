"""From-scratch training for the on-TPU LM (generation.local_lm).

The reference treats the RAG answer model as an opaque external server
(reference src/generation.py:92-141) and therefore cannot produce an
end-task number without one. This module closes stage 07/08's loop
offline: a word-level tokenizer for synthetic/custom corpora, a masked
next-token-CE trainer over `local_lm.gpt_logits` (adamw, jit'd step,
static shapes), and npz+json persistence so `pipeline.rag_eval
--local-lm <dir>` can serve the trained model through
`LocalLMTransport` with no foreign runtime.

TPU notes: one compiled train step per (batch, seq) shape; loss is
masked to the answer span so the prompt tokens condition but don't
dominate the gradient; forward in bf16, loss/optimizer state in f32.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qpp_fusion_rag_tpu.generation.local_lm import (
    GPTConfig,
    gpt_logits,
    init_gpt_params,
)


class WordTokenizer:
    """Whitespace word-level tokenizer over a closed vocabulary.

    id 0 is EOS (matches GPTConfig.eos_token_id for saved models), id 1
    is <unk>. decode() skips negative ids (local_lm's generate buffers
    pad with -1) and stops at EOS, so LocalLMTransport can use it as a
    drop-in for BPETokenizer.
    """

    EOS = "<eos>"
    UNK = "<unk>"

    def __init__(self, words: Sequence[str]):
        extra = sorted(set(words) - {self.EOS, self.UNK})
        self.words: List[str] = [self.EOS, self.UNK] + extra
        self.index: Dict[str, int] = {w: i for i, w in enumerate(self.words)}
        self.eos_id = 0
        self.unk_id = 1

    def __len__(self) -> int:
        return len(self.words)

    @classmethod
    def from_texts(cls, texts: Iterable[str]) -> "WordTokenizer":
        vocab = set()
        for t in texts:
            vocab.update(t.split())
        return cls(sorted(vocab))

    def encode(self, text: str) -> List[int]:
        return [self.index.get(w, self.unk_id) for w in text.split()]

    def decode(self, ids) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i < 0:
                continue
            if i == self.eos_id:
                break
            if i < len(self.words):
                out.append(self.words[i])
        return " ".join(out)


def masked_lm_loss(params, cfg: GPTConfig, ids: jnp.ndarray,
                   loss_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean next-token cross-entropy over positions where loss_mask[t+1]
    is set (the mask marks TARGET positions). ids [B, T] i32,
    loss_mask [B, T] f32/bool."""
    attn = ids >= 0
    ids = jnp.maximum(ids, 0)
    logits = gpt_logits(params, cfg, ids, mask=attn)       # [B, T, V] f32
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    m = loss_mask[:, 1:].astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def train_lm(
    params,
    cfg: GPTConfig,
    batch_fn,                      # step -> (ids [B,T] i32, loss_mask [B,T])
    steps: int,
    lr: float = 3e-4,
    weight_decay: float = 0.01,
    warmup: int = 100,
    log_every: int = 200,
    seed: int = 0,
) -> Tuple[Dict, List[float]]:
    """Adamw + linear warmup + cosine decay; returns (params, loss log).

    `batch_fn(step)` supplies numpy batches — shapes must be constant
    across steps (one compiled program)."""
    import optax

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=max(warmup, 1),
        decay_steps=max(steps, warmup + 1), end_value=lr * 0.1)
    opt = optax.adamw(sched, weight_decay=weight_decay)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, ids, loss_mask):
        loss, grads = jax.value_and_grad(masked_lm_loss)(
            params, cfg, ids, loss_mask)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses: List[float] = []
    for s in range(steps):
        ids, loss_mask = batch_fn(s)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(ids), jnp.asarray(loss_mask))
        if s % log_every == 0 or s == steps - 1:
            losses.append(float(loss))
            print(f"[train_lm] step {s:5d} loss {float(loss):.4f}",
                  flush=True)
    return params, losses


# =============================================================================
# Persistence (npz weights + json config/vocab)
# =============================================================================

def save_lm(out_dir, params, cfg: GPTConfig,
            tokenizer: Optional[WordTokenizer] = None) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    np.savez(out / "weights.npz", **flat)
    (out / "config.json").write_text(json.dumps(cfg._asdict(), indent=1))
    if tokenizer is not None:
        (out / "vocab.json").write_text(json.dumps(tokenizer.words))


def load_lm(model_dir):
    """-> (params, GPTConfig, WordTokenizer|None)."""
    d = Path(model_dir)
    cfg = GPTConfig(**json.loads((d / "config.json").read_text()))
    data = np.load(d / "weights.npz")
    tmpl = init_gpt_params(jax.random.PRNGKey(0), cfg)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tmpl)
    vals = []
    for path, _leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        vals.append(jnp.asarray(data[key]))
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(tmpl), vals)
    tok = None
    if (d / "vocab.json").exists():
        tok = WordTokenizer(json.loads((d / "vocab.json").read_text()))
    return params, cfg, tok
