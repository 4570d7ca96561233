"""JAX BERT parity vs torch transformers (tiny random-init models, offline)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from qpp_fusion_rag_tpu.encoders import (

    BertConfig,
    CrossEncoderScorer,
    DenseEncoder,
    SpladeEncoder,
    bert_encode,
    params_from_hf_state_dict,
)

TINY = dict(
    vocab_size=128, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=64, type_vocab_size=2,
)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, size=(3, 10)).astype(np.int32)
    mask = np.ones((3, 10), dtype=np.int32)
    mask[1, 7:] = 0
    mask[2, 5:] = 0
    ids[mask == 0] = 0
    return ids, mask


def _hf_config():
    return transformers.BertConfig(**TINY)


def test_bert_encode_matches_torch(batch):
    ids, mask = batch
    torch.manual_seed(0)
    model = transformers.BertModel(_hf_config()).eval()
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    cfg = BertConfig.from_hf(model.config)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    import jax.numpy as jnp

    out = np.asarray(bert_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    # padded positions may differ (torch masks only attention); compare real tokens
    m = mask.astype(bool)
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-4, atol=2e-5)


def test_splade_encoder_matches_torch(batch):
    ids, mask = batch
    torch.manual_seed(1)
    model = transformers.BertForMaskedLM(_hf_config()).eval()
    with torch.no_grad():
        logits = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).logits.numpy()
    acts = np.log1p(np.maximum(logits, 0.0)) * mask[..., None]
    ref = acts.max(axis=1)

    cfg = BertConfig.from_hf(model.config)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    enc = SpladeEncoder(params, cfg)
    out = enc.impacts_ids(ids, mask)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    top_ids, top_w = enc.top_impacts(ids, mask, k=5)
    assert top_ids.shape == (3, 5)
    np.testing.assert_allclose(top_w[:, 0], out.max(axis=1), rtol=1e-5)


def test_cross_encoder_matches_torch(batch):
    ids, mask = batch
    torch.manual_seed(2)
    model = transformers.BertForSequenceClassification(
        transformers.BertConfig(**TINY, num_labels=1)
    ).eval()
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).logits.numpy()[:, 0]

    cfg = BertConfig.from_hf(model.config)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    scorer = CrossEncoderScorer(params, cfg)
    out = scorer.score_ids(ids, mask)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_dense_encoder_pooling(batch):
    ids, mask = batch
    torch.manual_seed(3)
    model = transformers.BertModel(_hf_config()).eval()
    cfg = BertConfig.from_hf(model.config)
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    enc_cls = DenseEncoder(params, cfg, pooling="cls", normalize=True)
    emb = enc_cls.encode_ids(ids, mask)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)

    enc_mean = DenseEncoder(params, cfg, pooling="mean", normalize=False)
    emb2 = enc_mean.encode_ids(ids, mask)
    assert emb2.shape == (3, 32)
    assert not np.allclose(emb, emb2)


def test_dense_encoder_with_tokenizer():
    torch.manual_seed(4)
    model = transformers.BertModel(_hf_config()).eval()
    cfg = BertConfig.from_hf(model.config)
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    tok = lambda t: [ord(c) % 120 + 1 for c in t][:20]
    enc = DenseEncoder(params, cfg, tokenizer=tok)
    out = enc(["hello world", "ranking"])
    assert out.shape == (2, 32)


def test_dense_encoder_bf16_compute(batch):
    """bf16 compute path runs and stays close to f32 (serving precision)."""
    import jax.numpy as jnp

    ids, mask = batch
    torch.manual_seed(5)
    model = transformers.BertModel(_hf_config()).eval()
    cfg = BertConfig.from_hf(model.config)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    f32 = DenseEncoder(params, cfg, pooling="mean", normalize=True)
    b16 = DenseEncoder(params, cfg, pooling="mean", normalize=True,
                       compute_dtype=jnp.bfloat16)
    a = f32.encode_ids(ids, mask)
    b = b16.encode_ids(ids, mask)
    # normalized embeddings: cosine similarity near 1
    cos = np.sum(a * b, axis=1)
    assert np.all(cos > 0.99), cos


# -- regression: review findings (encoders) ------------------------------------

def test_pad_sequences_buckets_and_zero_guard():
    from qpp_fusion_rag_tpu.encoders.heads import pad_sequences

    ids, mask = pad_sequences([[1, 2, 3], [1] * 20], max_len=256)
    assert ids.shape[1] == 32                   # power-of-two bucket
    ids2, _ = pad_sequences([[1, 2, 3]], max_len=256)
    assert ids2.shape[1] == 16                  # same bucket for short batches
    ids0, mask0 = pad_sequences([[], []], max_len=256)
    assert ids0.shape[1] >= 1                   # all-empty batch stays 2D

def test_cross_encoder_strips_tokenizer_specials():
    """A tokenizer that adds [CLS]/[SEP] must not produce doubled specials
    inside the pair encoding."""
    from qpp_fusion_rag_tpu.encoders.heads import CrossEncoderScorer

    captured = {}

    class Spy(CrossEncoderScorer):
        def score_ids(self, ids, mask, type_ids=None):
            captured["ids"] = ids
            captured["types"] = type_ids
            import numpy as _np
            return _np.zeros(len(ids), _np.float32)

    tok = lambda t: [101] + [1000 + len(w) for w in t.split()] + [102]
    s = Spy.__new__(Spy)
    s.tokenizer = tok
    s.max_len = 64

    class Cfg:
        pad_token_id = 0

    s.cfg = Cfg()
    s.score_pairs([("a bb", "ccc dddd")])
    row = list(captured["ids"][0])
    # exactly one [CLS], exactly two [SEP], no internal duplicates
    assert row.count(101) == 1 and row.count(102) == 2
    assert row[:4] == [101, 1001, 1002, 102]
    t = list(captured["types"][0])
    assert t[:4] == [0, 0, 0, 0] and t[4] == 1  # doc segment starts after first SEP


def test_bert_encode_rejects_overlong_sequences():
    import jax.numpy as jnp
    import pytest as _pytest

    from qpp_fusion_rag_tpu.encoders.bert import BertConfig, bert_encode

    cfg = BertConfig(vocab_size=50, hidden_size=8, num_hidden_layers=0,
                     num_attention_heads=2, intermediate_size=16,
                     max_position_embeddings=4)
    params = {"embeddings": {
        "word": jnp.zeros((50, 8)), "position": jnp.zeros((4, 8)),
        "token_type": jnp.zeros((2, 8)),
        "ln_w": jnp.ones(8), "ln_b": jnp.zeros(8)}, "layers": []}
    with _pytest.raises(ValueError, match="max_position_embeddings"):
        bert_encode(params, cfg, jnp.zeros((1, 8), jnp.int32),
                    jnp.ones((1, 8), jnp.int32))


def test_state_dict_strict_accounting_and_naming_drift(batch):
    """Real-checkpoint protection: strict mode consumes every key; the
    gamma/beta (TF-converted) and untied-decoder variants load correctly."""
    ids, mask = batch
    torch.manual_seed(1)
    model = transformers.BertForMaskedLM(_hf_config()).eval()
    cfg = BertConfig.from_hf(model.config)
    sd = {k: v for k, v in model.state_dict().items()}

    # strict mode: a full MLM checkpoint must be fully consumed
    params = params_from_hf_state_dict(sd, cfg, strict=True)

    # an unknown key (naming drift) must raise in strict mode
    bad = dict(sd)
    bad["bert.encoder.layer.0.attention.self.query_proj.weight"] = (
        sd["bert.encoder.layer.0.attention.self.query.weight"]
    )
    with pytest.raises(ValueError, match="unconsumed"):
        params_from_hf_state_dict(bad, cfg, strict=True)

    # gamma/beta LayerNorm naming (TF-converted checkpoints) loads the same
    renamed = {}
    for k, v in sd.items():
        k2 = k.replace("LayerNorm.weight", "LayerNorm.gamma").replace(
            "LayerNorm.bias", "LayerNorm.beta")
        renamed[k2] = v
    params_tf = params_from_hf_state_dict(renamed, cfg, strict=True)
    np.testing.assert_array_equal(
        params["embeddings"]["ln_w"], params_tf["embeddings"]["ln_w"]
    )

    # tied checkpoint (decoder == word embeddings): no separate matrix kept
    assert "decoder" not in params["mlm"]

    # untied decoder: a distinct matrix must be stored and used. (A torch
    # reference is impossible here: HF's weight tying makes load_state_dict
    # silently propagate a modified decoder back into the embeddings.)
    import jax.numpy as jnp
    from qpp_fusion_rag_tpu.encoders.bert import bert_encode, mlm_logits

    untied = dict(sd)
    dec = sd["cls.predictions.decoder.weight"].clone()
    dec += torch.randn_like(dec) * 0.1
    untied["cls.predictions.decoder.weight"] = dec
    p_untied = params_from_hf_state_dict(untied, cfg, strict=True)
    np.testing.assert_array_equal(
        p_untied["mlm"]["decoder"], dec.numpy().T.astype(np.float32)
    )
    h = bert_encode(p_untied, cfg, jnp.asarray(ids), jnp.asarray(mask))
    got_untied = np.asarray(mlm_logits(p_untied, cfg, h))
    got_tied = np.asarray(mlm_logits(params, cfg, h))
    # the decoder delta must flow through to the logits
    assert np.abs(got_untied - got_tied).max() > 1e-3


def test_checkpoint_dir_round_trip(tmp_path, batch):
    """save_pretrained -> load_hf_bert(dir): the exact on-disk path a user
    with a real downloaded checkpoint hits (safetensors + config.json).
    Proves load_hf_bert / AutoModel.from_pretrained / key mapping work from
    files, not just from an in-memory state_dict.
    (Reference load path: src/retrievers/bge.py:31-84.)"""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.encoders.bert import load_hf_bert

    ids, mask = batch
    torch.manual_seed(6)
    src = transformers.BertModel(_hf_config()).eval()
    ckpt = tmp_path / "tiny-bge"
    src.save_pretrained(str(ckpt))
    assert (ckpt / "config.json").exists()
    # transformers >=4.35 writes safetensors by default; accept either format
    assert (ckpt / "model.safetensors").exists() or (
        ckpt / "pytorch_model.bin"
    ).exists()

    params, cfg = load_hf_bert(str(ckpt))
    with torch.no_grad():
        ref = src(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    out = np.asarray(bert_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    m = mask.astype(bool)
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-4, atol=2e-5)


def test_checkpoint_dir_round_trip_mlm(tmp_path, batch):
    """Same disk round-trip for the MLM (SPLADE) head, including the tied
    decoder that real SPLADE checkpoints ship."""
    from qpp_fusion_rag_tpu.encoders.bert import load_hf_bert

    ids, mask = batch
    torch.manual_seed(7)
    src = transformers.BertForMaskedLM(_hf_config()).eval()
    ckpt = tmp_path / "tiny-splade"
    src.save_pretrained(str(ckpt))

    params, cfg = load_hf_bert(str(ckpt), with_mlm=True)
    with torch.no_grad():
        ref = src(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).logits.numpy()
    enc = SpladeEncoder(params, cfg)
    acts = np.log1p(np.maximum(ref, 0.0)) * mask[..., None]
    np.testing.assert_allclose(
        enc.impacts_ids(ids, mask), acts.max(axis=1), rtol=2e-4, atol=2e-5
    )
