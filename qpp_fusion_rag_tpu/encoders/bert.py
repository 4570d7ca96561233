"""BERT-family encoder as a pure-JAX forward pass (jittable, mesh-shardable).

One architecture serves every neural component the reference uses through
torch/sentence-transformers (reference src/retrievers/bge.py:31-84 — BGE is
BERT-base + CLS pooling; tct_colbert.py:33-102 — TCT-ColBERT is BERT + mean
pooling; bm25_monot5.py:37-61 — the MiniLM cross-encoder is BERT + a
classification head; splade.py:25-80 — SPLADE is BERT + the MLM head with
log(1+relu(logits)) max-pooling).

Weights convert from any HuggingFace BERT-family checkpoint via
`params_from_hf_state_dict` (torch state_dict -> pytree); architecture
hyperparameters come from the HF config. Precision: params are kept f32,
matmuls run in bf16 on TPU via `compute_dtype`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# =============================================================================
# Config
# =============================================================================

class BertConfig:
    def __init__(
        self,
        vocab_size: int = 30522,
        hidden_size: int = 768,
        num_hidden_layers: int = 12,
        num_attention_heads: int = 12,
        intermediate_size: int = 3072,
        max_position_embeddings: int = 512,
        type_vocab_size: int = 2,
        layer_norm_eps: float = 1e-12,
        pad_token_id: int = 0,
    ):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.layer_norm_eps = layer_norm_eps
        self.pad_token_id = pad_token_id

    @classmethod
    def from_hf(cls, hf_config) -> "BertConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            type_vocab_size=hf_config.type_vocab_size,
            layer_norm_eps=hf_config.layer_norm_eps,
            pad_token_id=hf_config.pad_token_id or 0,
        )


# =============================================================================
# Forward
# =============================================================================

def _layer_norm(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _linear(x, p, dtype):
    return jnp.dot(x.astype(dtype), p["kernel"].astype(dtype),
                   preferred_element_type=jnp.float32) + p["bias"]


def bert_encode(
    params: Dict[str, Any],
    cfg: BertConfig,
    input_ids: jnp.ndarray,        # [B, L] int32
    attention_mask: jnp.ndarray,   # [B, L] 1=token
    token_type_ids: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """-> last hidden states [B, L, H] (f32)."""
    B, L = input_ids.shape
    if L > cfg.max_position_embeddings:
        raise ValueError(
            f"sequence length {L} exceeds max_position_embeddings "
            f"{cfg.max_position_embeddings}; JAX would silently clamp the "
            "position gather and reuse the last embedding"
        )
    H = cfg.hidden_size
    nh = cfg.num_attention_heads
    hd = H // nh
    eps = cfg.layer_norm_eps

    emb = params["embeddings"]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = (
        emb["word"][input_ids]
        + emb["position"][jnp.arange(L)][None]
        + emb["token_type"][token_type_ids]
    )
    x = _layer_norm(x, emb["ln_w"], emb["ln_b"], eps)

    # additive attention bias
    bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)

    for layer in params["layers"]:
        # self-attention (post-LN, BERT style)
        q = _linear(x, layer["q"], compute_dtype).reshape(B, L, nh, hd)
        k = _linear(x, layer["k"], compute_dtype).reshape(B, L, nh, hd)
        v = _linear(x, layer["v"], compute_dtype).reshape(B, L, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(compute_dtype),
                         v.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(B, L, H)
        attn_out = _linear(ctx, layer["attn_out"], compute_dtype)
        x = _layer_norm(x + attn_out, layer["attn_ln_w"], layer["attn_ln_b"], eps)

        # FFN
        h = _linear(x, layer["ffn_in"], compute_dtype)
        h = jax.nn.gelu(h, approximate=False)
        h = _linear(h, layer["ffn_out"], compute_dtype)
        x = _layer_norm(x + h, layer["ffn_ln_w"], layer["ffn_ln_b"], eps)

    return x


# -- pooling heads ------------------------------------------------------------

def pool_cls(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """CLS-token pooling (BGE, reference bge.py:160-170 uses normalized CLS)."""
    return hidden[:, 0]


def pool_mean(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean pooling over tokens (TCT-ColBERT style)."""
    m = attention_mask[..., None].astype(hidden.dtype)
    return jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def mlm_logits(params, cfg: BertConfig, hidden: jnp.ndarray,
               compute_dtype=jnp.float32) -> jnp.ndarray:
    """MLM head (SPLADE): transform + LN + decoder -> [B, L, V].

    The decoder is the word-embedding transpose when tied (the common
    case); checkpoints with an untied ``cls.predictions.decoder.weight``
    carry their own matrix in ``head["decoder"]``."""
    head = params["mlm"]
    h = _linear(hidden, head["transform"], compute_dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = _layer_norm(h, head["ln_w"], head["ln_b"], cfg.layer_norm_eps)
    decoder = head.get("decoder", params["embeddings"]["word"].T)
    logits = jnp.dot(h.astype(compute_dtype),
                     jnp.asarray(decoder).astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return logits + head["decoder_bias"]


def classifier_logits(params, hidden: jnp.ndarray,
                      compute_dtype=jnp.float32) -> jnp.ndarray:
    """Sequence-classification head on pooler output (cross-encoder score)."""
    pooled = jnp.tanh(_linear(hidden[:, 0], params["pooler"], compute_dtype))
    return _linear(pooled, params["classifier"], compute_dtype)


# =============================================================================
# HF weight conversion
# =============================================================================

def _t(sd, key):
    return np.asarray(sd[key].detach().cpu().numpy() if hasattr(sd[key], "detach") else sd[key])


#: state-dict keys that are buffers/aux, never model weights
_IGNORABLE_SUFFIXES = (
    "position_ids",                 # registered buffer in older HF exports
    "cls.seq_relationship.weight",  # NSP head (unused by any retriever)
    "cls.seq_relationship.bias",
)


def params_from_hf_state_dict(
    sd: Dict[str, Any], cfg: BertConfig, strict: bool = False
) -> Dict[str, Any]:
    """Convert a HF BERT(-ForMaskedLM/-ForSequenceClassification) state_dict.

    Handles real-checkpoint naming drift: the `bert.` prefix,
    linear-weight transposition, `LayerNorm.gamma/beta` (TF-converted
    checkpoints) vs `.weight/.bias`, the optional MLM
    (`cls.predictions.*`, tied OR untied decoder) / classifier heads, and
    buffer keys (`position_ids`). With ``strict=True`` any state-dict key
    that was neither consumed nor known-ignorable raises — the guard that
    makes silent key-mapping drift impossible when a real checkpoint
    flows through (no real BEIR checkpoints ship in this environment, so
    this accounting is the proof surface; reference loads the same
    checkpoints via transformers, src/retrievers/bge.py:31-84).
    """
    keys = list(sd.keys())
    prefix = "bert." if any(k.startswith("bert.") for k in keys) else ""
    consumed = set()

    def take(key):
        consumed.add(key)
        return _t(sd, key)

    def lin(name):
        return {
            "kernel": take(f"{name}.weight").T.astype(np.float32),
            "bias": take(f"{name}.bias").astype(np.float32),
        }

    def ln(name):
        """LayerNorm weights: `.weight/.bias`, or `.gamma/.beta` in
        TF-converted checkpoints."""
        if f"{name}.weight" in sd:
            return (take(f"{name}.weight").astype(np.float32),
                    take(f"{name}.bias").astype(np.float32))
        return (take(f"{name}.gamma").astype(np.float32),
                take(f"{name}.beta").astype(np.float32))

    e = f"{prefix}embeddings"
    emb_ln_w, emb_ln_b = ln(f"{e}.LayerNorm")
    params: Dict[str, Any] = {
        "embeddings": {
            "word": take(f"{e}.word_embeddings.weight").astype(np.float32),
            "position": take(f"{e}.position_embeddings.weight").astype(np.float32),
            "token_type": take(f"{e}.token_type_embeddings.weight").astype(np.float32),
            "ln_w": emb_ln_w,
            "ln_b": emb_ln_b,
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        L = f"{prefix}encoder.layer.{i}"
        attn_ln_w, attn_ln_b = ln(f"{L}.attention.output.LayerNorm")
        ffn_ln_w, ffn_ln_b = ln(f"{L}.output.LayerNorm")
        params["layers"].append({
            "q": lin(f"{L}.attention.self.query"),
            "k": lin(f"{L}.attention.self.key"),
            "v": lin(f"{L}.attention.self.value"),
            "attn_out": lin(f"{L}.attention.output.dense"),
            "attn_ln_w": attn_ln_w,
            "attn_ln_b": attn_ln_b,
            "ffn_in": lin(f"{L}.intermediate.dense"),
            "ffn_out": lin(f"{L}.output.dense"),
            "ffn_ln_w": ffn_ln_w,
            "ffn_ln_b": ffn_ln_b,
        })

    if f"{prefix}pooler.dense.weight" in sd:
        params["pooler"] = lin(f"{prefix}pooler.dense")
    if ("cls.predictions.transform.dense.weight" in sd
            or "cls.predictions.transform.dense.gamma" in sd):
        mlm_ln_w, mlm_ln_b = ln("cls.predictions.transform.LayerNorm")
        params["mlm"] = {
            "transform": lin("cls.predictions.transform.dense"),
            "ln_w": mlm_ln_w,
            "ln_b": mlm_ln_b,
            "decoder_bias": take("cls.predictions.bias").astype(np.float32),
        }
        if "cls.predictions.decoder.weight" in sd:
            dec = take("cls.predictions.decoder.weight")
            consumed.add("cls.predictions.decoder.bias")  # == cls.predictions.bias
            if not np.array_equal(dec, params["embeddings"]["word"]):
                # untied decoder: keep its own matrix, [H, V] layout
                params["mlm"]["decoder"] = dec.T.astype(np.float32)
    if "classifier.weight" in sd:
        params["classifier"] = lin("classifier")

    leftovers = [
        k for k in keys
        if k not in consumed and not k.endswith(_IGNORABLE_SUFFIXES)
    ]
    if leftovers and strict:
        raise ValueError(
            f"unconsumed state-dict keys (naming drift?): {sorted(leftovers)[:8]}"
            + (f" ... +{len(leftovers) - 8} more" if len(leftovers) > 8 else "")
        )
    return params


def _find_vocab_txt(model_name_or_path: str):
    """Resolve a checkpoint's vocab.txt without transformers: direct dir,
    or the HF hub cache layout (~/.cache/huggingface/hub/models--org--name/
    snapshots/<rev>/vocab.txt). -> Path | None."""
    import os
    from pathlib import Path

    p = Path(model_name_or_path)
    if (p / "vocab.txt").exists():
        return p
    cache = Path(os.environ.get(
        "HF_HOME", Path.home() / ".cache" / "huggingface")) / "hub"
    slug = "models--" + model_name_or_path.replace("/", "--")
    snaps = cache / slug / "snapshots"
    if snaps.is_dir():
        for rev in sorted(snaps.iterdir()):
            if (rev / "vocab.txt").exists():
                return rev
    return None


def load_tokenizer(model_name_or_path: str, max_length: int = 256):
    """Checkpoint tokenizer -> plain `text -> List[int]` callable (what the
    encoder heads consume). DEFAULT path: the self-contained WordPiece
    implementation (encoders.wordpiece) driven by the checkpoint's
    vocab.txt — no foreign runtime. Falls back to transformers only when
    no vocab.txt can be located (e.g. non-WordPiece checkpoints)."""
    found = _find_vocab_txt(model_name_or_path)
    if found is not None:
        from qpp_fusion_rag_tpu.encoders.wordpiece import WordPieceTokenizer

        return WordPieceTokenizer.from_pretrained_dir(found, max_length=max_length)
    return load_hf_tokenizer(model_name_or_path, max_length=max_length)


def load_hf_tokenizer(model_name_or_path: str, max_length: int = 256):
    """HF tokenizer -> plain `text -> List[int]` callable (what the encoder
    heads consume). Requires the checkpoint locally, like load_hf_bert.
    Prefer load_tokenizer (self-contained WordPiece) — this fallback pulls
    in the transformers runtime."""
    import transformers

    tok = transformers.AutoTokenizer.from_pretrained(model_name_or_path)

    def tokenize(text: str):
        return tok(text, truncation=True, max_length=max_length)["input_ids"]

    return tokenize


def load_hf_bert(model_name_or_path: str, with_mlm: bool = False,
                 with_classifier: bool = False):
    """Load a HF checkpoint into (params, BertConfig). Requires the weights
    to be available locally (offline environments: pre-populated HF cache)."""
    import transformers

    if with_mlm:
        model = transformers.AutoModelForMaskedLM.from_pretrained(model_name_or_path)
    elif with_classifier:
        model = transformers.AutoModelForSequenceClassification.from_pretrained(model_name_or_path)
    else:
        model = transformers.AutoModel.from_pretrained(model_name_or_path)
    cfg = BertConfig.from_hf(model.config)
    return params_from_hf_state_dict(model.state_dict(), cfg), cfg


def init_bert_params(key, cfg: BertConfig, scale: float = 0.02):
    """Random-init parameter tree in the exact params_from_hf_state_dict
    layout — for offline paths that need a *working* encoder without a
    checkpoint (local embedding transport smoke runs, demos, tests).
    Embeddings/kernels ~ N(0, scale); LayerNorms identity."""
    import jax

    keys = iter(jax.random.split(key, 16 + 8 * cfg.num_hidden_layers))

    def mat(shape):
        return np.asarray(
            jax.random.normal(next(keys), shape, jnp.float32) * scale)

    def lin(n_in, n_out):
        return {"kernel": mat((n_in, n_out)),
                "bias": np.zeros(n_out, np.float32)}

    H, I = cfg.hidden_size, cfg.intermediate_size
    params = {
        "embeddings": {
            "word": mat((cfg.vocab_size, H)),
            "position": mat((cfg.max_position_embeddings, H)),
            "token_type": mat((cfg.type_vocab_size, H)),
            "ln_w": np.ones(H, np.float32),
            "ln_b": np.zeros(H, np.float32),
        },
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append({
            "q": lin(H, H), "k": lin(H, H), "v": lin(H, H),
            "attn_out": lin(H, H),
            "attn_ln_w": np.ones(H, np.float32),
            "attn_ln_b": np.zeros(H, np.float32),
            "ffn_in": lin(H, I), "ffn_out": lin(I, H),
            "ffn_ln_w": np.ones(H, np.float32),
            "ffn_ln_b": np.zeros(H, np.float32),
        })
    return params
