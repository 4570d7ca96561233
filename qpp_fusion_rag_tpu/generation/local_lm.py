"""On-TPU generation: a decoder-only JAX LM behind the client's transport.

The reference (and this framework until round 3) requires an external
OpenAI-compatible HTTP server for RAG evaluation (reference
src/generation.py:92-141). This module closes that last foreign-runtime
dependency: a GPT-2-family causal transformer as a pure-JAX forward
(HF-checkpoint loadable like encoders/bert.py), greedy decoding with a
KV cache inside `lax.fori_loop`, and `LocalLMTransport` — a drop-in for
`generation.client`'s injectable `transport` that answers chat payloads
from the device instead of HTTP. HTTP stays the default; pass
``GenerationOperation(transport=LocalLMTransport(...))`` to go local.

TPU notes: decode is one jit program per (batch, prompt_pad, max_new)
bucket — static shapes, no data-dependent Python control flow; the KV
cache is a preallocated [L, B, T_max, H_kv·hd] buffer updated with
`dynamic_update_slice`; attention masks by position. Weights cast to
bf16 for the MXU; logits/argmax in f32.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class GPTConfig(NamedTuple):
    vocab_size: int = 50257
    n_positions: int = 1024
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    eos_token_id: int = 50256

    @classmethod
    def from_hf(cls, cfg) -> "GPTConfig":
        return cls(
            vocab_size=cfg.vocab_size, n_positions=cfg.n_positions,
            hidden=cfg.n_embd, layers=cfg.n_layer, heads=cfg.n_head,
            eos_token_id=(lambda e: 50256 if e is None else e)(
                getattr(cfg, "eos_token_id", None)),
        )


def init_gpt_params(key: jax.Array, cfg: GPTConfig, scale: float = 0.02) -> Dict:
    """Random GPT-2-shaped params (tests / from-scratch training)."""
    ks = iter(jax.random.split(key, 4 + 12 * cfg.layers))

    def mat(shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    params = {
        "wte": mat((cfg.vocab_size, cfg.hidden)),
        "wpe": mat((cfg.n_positions, cfg.hidden)),
        "ln_f": {"g": jnp.ones(cfg.hidden), "b": jnp.zeros(cfg.hidden)},
        "blocks": [],
    }
    for _ in range(cfg.layers):
        params["blocks"].append({
            "ln_1": {"g": jnp.ones(cfg.hidden), "b": jnp.zeros(cfg.hidden)},
            "attn_qkv": {"w": mat((cfg.hidden, 3 * cfg.hidden)),
                         "b": jnp.zeros(3 * cfg.hidden)},
            "attn_out": {"w": mat((cfg.hidden, cfg.hidden)),
                         "b": jnp.zeros(cfg.hidden)},
            "ln_2": {"g": jnp.ones(cfg.hidden), "b": jnp.zeros(cfg.hidden)},
            "mlp_in": {"w": mat((cfg.hidden, 4 * cfg.hidden)),
                       "b": jnp.zeros(4 * cfg.hidden)},
            "mlp_out": {"w": mat((4 * cfg.hidden, cfg.hidden)),
                        "b": jnp.zeros(cfg.hidden)},
        })
    return params


def params_from_hf_gpt2(sd: Dict, cfg: GPTConfig) -> Dict:
    """Map a HF GPT-2 state dict (transformer.* naming; Conv1D weights are
    stored [in, out] — no transpose needed for x @ w)."""
    t = {k: np.asarray(v) for k, v in sd.items()}

    def pfx(k):
        return t.get("transformer." + k, t.get(k))

    params = {
        "wte": pfx("wte.weight"),
        "wpe": pfx("wpe.weight"),
        "ln_f": {"g": pfx("ln_f.weight"), "b": pfx("ln_f.bias")},
        "blocks": [],
    }
    for i in range(cfg.layers):
        h = f"h.{i}."
        params["blocks"].append({
            "ln_1": {"g": pfx(h + "ln_1.weight"), "b": pfx(h + "ln_1.bias")},
            "attn_qkv": {"w": pfx(h + "attn.c_attn.weight"),
                         "b": pfx(h + "attn.c_attn.bias")},
            "attn_out": {"w": pfx(h + "attn.c_proj.weight"),
                         "b": pfx(h + "attn.c_proj.bias")},
            "ln_2": {"g": pfx(h + "ln_2.weight"), "b": pfx(h + "ln_2.bias")},
            "mlp_in": {"w": pfx(h + "mlp.c_fc.weight"),
                       "b": pfx(h + "mlp.c_fc.bias")},
            "mlp_out": {"w": pfx(h + "mlp.c_proj.weight"),
                        "b": pfx(h + "mlp.c_proj.bias")},
        })
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), params)


def load_hf_gpt2(model_name_or_path: str) -> Tuple[Dict, GPTConfig]:
    """Load a HF GPT-2-family checkpoint (requires local availability,
    like encoders.bert.load_hf_bert)."""
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(model_name_or_path)
    cfg = GPTConfig.from_hf(model.config)
    return params_from_hf_gpt2(model.state_dict(), cfg), cfg


# =============================================================================
# Forward
# =============================================================================

def _ln(x, p):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * p["g"] + p["b"]


def _block(x, blk, heads, kv_cache=None, pos=None, mask=None):
    """One pre-LN transformer block. With kv_cache=(k, v) [B, T_max, H·hd]
    and scalar `pos`, runs a single-token decode step and returns the
    updated cache; otherwise full-sequence causal attention."""
    B = x.shape[0]
    H = heads
    D = x.shape[-1]
    hd = D // H
    h = _ln(x, blk["ln_1"])
    qkv = h @ blk["attn_qkv"]["w"].astype(h.dtype) + blk["attn_qkv"]["b"].astype(h.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_first(t):  # [B, T, D] -> [B, H, T, hd]
        return jnp.transpose(t.reshape(B, -1, H, hd), (0, 2, 1, 3))

    if kv_cache is None:
        T = x.shape[1]
        qh, kh, vh = heads_first(q), heads_first(k), heads_first(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
        causal = jnp.tril(jnp.ones((T, T), bool))
        m = causal[None, None] if mask is None else (
            causal[None, None] & mask[:, None, None, :])
        att = jnp.where(m, att, -1e30)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vh)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, T, D)
        new_cache = (k, v)
    else:
        ck, cv = kv_cache                      # [B, T_max, D]
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, pos, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, pos, 0))
        T_max = ck.shape[1]
        qh = heads_first(q)                    # [B, H, 1, hd]
        kh, vh = heads_first(ck), heads_first(cv)
        att = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
        valid = jnp.arange(T_max)[None, None, None, :] <= pos
        if mask is not None:
            valid = valid & mask[:, None, None, :]
        att = jnp.where(valid, att, -1e30)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vh)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, 1, D)
        new_cache = (ck, cv)

    x = x + out @ blk["attn_out"]["w"].astype(x.dtype) + blk["attn_out"]["b"].astype(x.dtype)
    h = _ln(x, blk["ln_2"])
    h = jax.nn.gelu(h @ blk["mlp_in"]["w"].astype(h.dtype) + blk["mlp_in"]["b"].astype(h.dtype))
    x = x + h @ blk["mlp_out"]["w"].astype(x.dtype) + blk["mlp_out"]["b"].astype(x.dtype)
    return x, new_cache


def gpt_logits(params, cfg: GPTConfig, ids: jnp.ndarray,
               mask: Optional[jnp.ndarray] = None,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """Full-sequence forward -> logits [B, T, V] (f32)."""
    B, T = ids.shape
    x = (params["wte"][ids] + params["wpe"][jnp.arange(T)]).astype(dtype)
    for blk in params["blocks"]:
        x, _ = _block(x, blk, cfg.heads, mask=mask)
    x = _ln(x, params["ln_f"])
    return (x @ params["wte"].T.astype(x.dtype)).astype(jnp.float32)


def _decode(params, cfg: GPTConfig, prompt_ids: jnp.ndarray,
            prompt_len: jnp.ndarray, max_new: int, select, key):
    """Greedy decode -> (tokens [B, max_new] i32, n_generated [B]).

    prompt_ids [B, T_p] right-padded with anything (masked by prompt_len).
    Prefill computes the prompt KV cache in one pass; each new token is a
    single-position step. Stops contributing tokens after EOS (the buffer
    keeps decoding to stay static-shape; post-EOS tokens are masked out
    of n_generated)."""
    B, T_p = prompt_ids.shape
    T_max = T_p + max_new
    dtype = jnp.bfloat16
    pos_mask = jnp.arange(T_p)[None, :] < prompt_len[:, None]

    # prefill: full causal pass; _block's full-sequence branch already
    # returns this layer's (k, v), so the cache costs no extra qkv matmul
    x = (params["wte"][prompt_ids] + params["wpe"][jnp.arange(T_p)]).astype(dtype)
    caches = []
    for blk in params["blocks"]:
        x, (k, v) = _block(x, blk, cfg.heads, mask=pos_mask)
        ck = jnp.zeros((B, T_max, cfg.hidden), dtype).at[:, :T_p].set(
            k.astype(dtype))
        cv = jnp.zeros((B, T_max, cfg.hidden), dtype).at[:, :T_p].set(
            v.astype(dtype))
        caches.append((ck, cv))
    x = _ln(x, params["ln_f"])
    # gather the last prompt position BEFORE the vocab projection: a
    # full [B, T_p, V] logits matmul (~1000x the FLOPs and a ~200 MB
    # intermediate at T_p=1024) only to read one row per batch element
    x_last = jnp.take_along_axis(
        x, (prompt_len - 1)[:, None, None].astype(jnp.int32)
        .repeat(cfg.hidden, -1), axis=1)[:, 0]                  # [B, H]
    logits_last = (x_last @ params["wte"].T.astype(dtype)).astype(jnp.float32)

    mask_full = jnp.concatenate(
        [pos_mask, jnp.zeros((B, max_new), bool)], axis=1)

    def step(i, state):
        tok_buf, cur_tok, caches, mask_full, done, key = state
        key, sub = jax.random.split(key)
        tok = jnp.where(done, cfg.eos_token_id, cur_tok)
        # EOS itself must not land in the buffer (decode would emit a
        # literal '<|endoftext|>'): treat it as done for the write too
        emitted_eos = cur_tok == cfg.eos_token_id
        tok_buf = tok_buf.at[:, i].set(
            jnp.where(done | emitted_eos, -1, cur_tok))
        pos = prompt_len + i                                     # [B]
        # single-token embed at per-row position; caches are updated at a
        # SHARED write index (T_p + i) while attention masks by validity
        widx = T_p + i
        x = (params["wte"][tok[:, None]]
             + jnp.take_along_axis(params["wpe"][None], pos[:, None, None]
                                   .repeat(cfg.hidden, -1), axis=1)).astype(dtype)
        mask_full = mask_full.at[:, widx].set(~done)
        new_caches = []
        for blk, cache in zip(params["blocks"], caches):
            x, cache = _block(x, blk, cfg.heads, kv_cache=cache, pos=widx,
                              mask=mask_full)
            new_caches.append(cache)
        x = _ln(x, params["ln_f"])
        logits = (x[:, 0] @ params["wte"].T.astype(dtype)).astype(jnp.float32)
        nxt = select(logits, sub).astype(jnp.int32)
        done = done | emitted_eos
        return tok_buf, nxt, new_caches, mask_full, done, key

    key, sub0 = jax.random.split(key)
    tok0 = select(logits_last, sub0).astype(jnp.int32)
    tok_buf = jnp.full((B, max_new), -1, jnp.int32)
    done0 = jnp.zeros((B,), bool)
    tok_buf, _, _, _, done, _ = jax.lax.fori_loop(
        0, max_new, step, (tok_buf, tok0, caches, mask_full, done0, key))
    n_gen = jnp.sum(tok_buf >= 0, axis=1)
    return tok_buf, n_gen


@partial(jax.jit, static_argnames=("cfg", "max_new"))
def greedy_generate(params, cfg: GPTConfig, prompt_ids: jnp.ndarray,
                    prompt_len: jnp.ndarray, max_new: int = 64):
    """Greedy decode -> (tokens [B, max_new] i32, n_generated [B]).

    prompt_ids [B, T_p] right-padded with anything (masked by prompt_len).
    Prefill computes the prompt KV cache in one pass; each new token is a
    single-position step; EOS masks the tail (see _decode)."""
    return _decode(params, cfg, prompt_ids, prompt_len, max_new,
                   lambda logits, _key: jnp.argmax(logits, axis=-1),
                   jax.random.PRNGKey(0))


def filtered_sample(logits: jnp.ndarray, key, temperature: float = 0.8,
                    top_p: float = 0.95, top_k: int = 0) -> jnp.ndarray:
    """One sampling step over [B, V] logits: temperature scaling, optional
    top-k truncation, then nucleus (top-p) truncation, categorical draw.
    The reference exposes temperature through its LLM config (reference
    src/generation.py:92-141, config/defaults.yaml llm.temperature);
    top-p/top-k are the standard decoding companions. temperature <= 0
    degenerates to argmax."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    scaled = logits / jnp.float32(temperature)
    sorted_desc = jnp.sort(scaled, axis=-1)[..., ::-1]
    neg = jnp.float32(-1e30)
    if top_k and top_k > 0:
        kth = sorted_desc[..., min(top_k, scaled.shape[-1]) - 1][..., None]
        scaled = jnp.where(scaled >= kth, scaled, neg)
        sorted_desc = jnp.where(
            jnp.arange(sorted_desc.shape[-1]) < top_k, sorted_desc, neg)
    if top_p < 1.0:
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose preceding cumulative mass is < top_p (the
        # first token always survives)
        keep = (cum - probs) < jnp.float32(top_p)
        cutoff = jnp.min(jnp.where(keep, sorted_desc, jnp.inf),
                         axis=-1, keepdims=True)
        scaled = jnp.where(scaled >= cutoff, scaled, neg)
    return jax.random.categorical(key, scaled, axis=-1)


@partial(jax.jit,
         static_argnames=("cfg", "max_new", "temperature", "top_p", "top_k"))
def sample_generate(params, cfg: GPTConfig, prompt_ids: jnp.ndarray,
                    prompt_len: jnp.ndarray, key, max_new: int = 64,
                    temperature: float = 0.8, top_p: float = 0.95,
                    top_k: int = 0):
    """Stochastic decode (same contract as greedy_generate) with
    temperature / nucleus / top-k filtering; `key` makes runs
    reproducible. temperature <= 0 is exact greedy."""
    return _decode(
        params, cfg, prompt_ids, prompt_len, max_new,
        lambda logits, k: filtered_sample(logits, k, temperature=temperature,
                                          top_p=top_p, top_k=top_k),
        key)


# =============================================================================
# Byte-level BPE tokenizer (GPT-2 vocab.json + merges.txt, no foreign deps)
# =============================================================================

def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte<->unicode table."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class BPETokenizer:
    """GPT-2 byte-level BPE from vocab.json + merges.txt."""

    _PAT = None  # compiled lazily (regex is stdlib-re expressible)

    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]]):
        self.vocab = vocab
        self.decoder = {v: k for k, v in vocab.items()}
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_enc = _bytes_to_unicode()
        self.byte_dec = {v: k for k, v in self.byte_enc.items()}

    @classmethod
    def from_pretrained_dir(cls, path) -> "BPETokenizer":
        import json
        from pathlib import Path

        path = Path(path)
        vocab = json.loads((path / "vocab.json").read_text(encoding="utf-8"))
        merges = []
        for ln in (path / "merges.txt").read_text(encoding="utf-8").splitlines():
            if ln.startswith("#") or not ln.strip():
                continue
            a, b = ln.split()
            merges.append((a, b))
        return cls(vocab, merges)

    def _split(self, text: str) -> List[str]:
        import re

        if BPETokenizer._PAT is None:
            # stdlib-re transcription of GPT-2's pattern: \p{L} is
            # [^\W\d_], and the punctuation class [^\s\p{L}\p{N}] must
            # therefore re-admit '_' explicitly (it is \w but not \p{L};
            # a plain [^\s\w] would silently DELETE underscores)
            BPETokenizer._PAT = re.compile(
                r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+"
                r"| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+",
                re.UNICODE)
        return BPETokenizer._PAT.findall(text)

    def _bpe(self, token: str) -> List[str]:
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]): i for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 30))
            if best not in self.ranks:
                break
            merged, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == best:
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        return word

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in self._split(text):
            mapped = "".join(self.byte_enc[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(mapped):
                pid = self.vocab.get(piece)
                if pid is not None:
                    ids.append(pid)
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder.get(int(i), "") for i in ids if int(i) >= 0)
        data = bytes(self.byte_dec[c] for c in text if c in self.byte_dec)
        return data.decode("utf-8", errors="replace")


# =============================================================================
# Transport: answers generation.client chat payloads from the device
# =============================================================================

class LocalLMTransport:
    """Drop-in for generation.client's `transport` argument: an on-TPU
    chat endpoint. `LocalLMTransport(params, cfg, tokenizer)` where
    tokenizer has encode/decode (BPETokenizer or a HF tokenizer).

    Batching note: the RAG harness calls one query at a time (reference
    07_rag_eval.py loop); decode programs are cached per (prompt-bucket,
    max_new) so repeated calls hit the jit cache."""

    def __init__(self, params, cfg: GPTConfig, tokenizer,
                 max_new: int = 64, prompt_buckets=(128, 256, 512, 1024)):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.max_new = max_new
        self.buckets = sorted(prompt_buckets)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def __call__(self, url: str, payload: Dict, timeout: float) -> Dict:
        if url.endswith("/embeddings"):
            raise ValueError(
                "LocalLMTransport serves chat only; use encoders.DenseEncoder "
                "for local embeddings")
        msgs = payload.get("messages", [])
        prompt = "\n\n".join(
            f"{m.get('role', 'user')}: {m.get('content', '')}" for m in msgs
        ) + "\n\nassistant:"
        ids = self.tok.encode(prompt)
        cap = self.cfg.n_positions - self.max_new
        ids = ids[-min(len(ids), cap):]
        bucket = min(self._bucket(len(ids)), cap)
        ids = ids[-bucket:]
        n = len(ids)
        arr = np.zeros((1, bucket), np.int32)
        arr[0, :n] = ids
        max_new = min(int(payload.get("max_tokens") or self.max_new),
                      self.cfg.n_positions - bucket)
        toks, n_gen = greedy_generate(
            self.params, self.cfg, jnp.asarray(arr),
            jnp.asarray([n], np.int32), max_new=max(max_new, 1))
        out = self.tok.decode(np.asarray(toks)[0])
        return {
            "choices": [{"message": {"content": out.strip()}}],
            "model": payload.get("model", "local-jax-lm"),
            "usage": {"prompt_tokens": n,
                      "completion_tokens": int(np.asarray(n_gen)[0])},
        }
