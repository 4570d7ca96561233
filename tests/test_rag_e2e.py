"""RAG end-task closure: the from-scratch LM trainer learns the demo
extraction task, and the committed end-to-end artifact reproduces the
reference's qualitative finding (reference
qpp-fusion-methods.plan..md:136-149: QA quality peaks at small k; fused
rankings beat unweighted fusion downstream). The artifact itself is
produced on hardware by scripts_dev/rag_e2e_demo.py."""

import json
from pathlib import Path

import numpy as np
import pytest

DOCS = Path(__file__).resolve().parent.parent / "docs"


@pytest.mark.slow
def test_lm_trainer_learns_extraction_task():
    """A micro GPT learns the marker->secret extraction objective: the
    masked answer loss falls by >3x within 150 steps (full convergence
    is the artifact script's job — this is the mechanics smoke)."""
    import jax

    from qpp_fusion_rag_tpu.generation import demo_task
    from qpp_fusion_rag_tpu.generation.lm_trainer import train_lm
    from qpp_fusion_rag_tpu.generation.local_lm import (
        GPTConfig,
        init_gpt_params,
    )

    n_markers, n_secrets = 12, 24
    tok = demo_task.build_vocab(n_markers, n_secrets)
    cfg = GPTConfig(vocab_size=len(tok), n_positions=128, hidden=64,
                    layers=2, heads=2, eos_token_id=tok.eos_id)
    params = init_gpt_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    def batch_fn(_):
        exs = [demo_task.sample_example(rng, n_markers, n_secrets,
                                        k_choices=(1,))
               for _ in range(8)]
        return demo_task.encode_batch(tok, exs, 128)

    params, losses = train_lm(params, cfg, batch_fn, steps=150, lr=2e-3,
                              warmup=20, log_every=50)
    assert losses[0] / max(losses[-1], 1e-6) > 3.0, losses


def test_lm_save_load_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.generation.lm_trainer import (
        WordTokenizer,
        load_lm,
        save_lm,
    )
    from qpp_fusion_rag_tpu.generation.local_lm import (
        GPTConfig,
        gpt_logits,
        init_gpt_params,
    )

    tok = WordTokenizer(["alpha", "beta", "gamma"])
    cfg = GPTConfig(vocab_size=len(tok), n_positions=32, hidden=32,
                    layers=1, heads=2, eos_token_id=tok.eos_id)
    params = init_gpt_params(jax.random.PRNGKey(1), cfg)
    save_lm(tmp_path / "lm", params, cfg, tok)
    p2, cfg2, tok2 = load_lm(tmp_path / "lm")
    assert cfg2 == cfg
    assert tok2.words == tok.words
    ids = jnp.asarray([[2, 3, 4]])
    np.testing.assert_allclose(
        np.asarray(gpt_logits(params, cfg, ids)),
        np.asarray(gpt_logits(p2, cfg2, ids)), rtol=1e-5, atol=1e-5)


def test_word_tokenizer_contract():
    from qpp_fusion_rag_tpu.generation.lm_trainer import WordTokenizer

    tok = WordTokenizer(["b", "a", "c"])
    ids = tok.encode("a c unseen b")
    assert ids[2] == tok.unk_id
    # decode skips -1 pads and stops at EOS (local_lm buffer contract)
    assert tok.decode([-1] + ids[:2] + [tok.eos_id, ids[3]]) == "a c"


def test_rag_e2e_artifact_reproduces_reference_finding():
    """docs/rag_e2e_demo.json (committed by scripts_dev/rag_e2e_demo.py)
    must carry the reference's two qualitative findings."""
    path = DOCS / "rag_e2e_demo.json"
    if not path.exists():
        pytest.skip("artifact not yet generated on this machine")
    art = json.loads(path.read_text())
    m = art["methods"]

    def f1_by_k(stem):
        return {int(k): v["f1"] for k, v in m[stem]["metrics_by_k"].items()}

    learned = f1_by_k("learned_multioutput")
    rrf = f1_by_k("rrf")
    best_k = max(learned, key=learned.get)
    # (a) small optimal k: quality peaks by k=3 and decays at k=10
    assert best_k <= 3
    assert learned[best_k] > learned[max(learned)]
    # (b) fused beats unweighted downstream at every k <= 5
    for k in (1, 2, 3, 5):
        assert learned[k] > rrf[k]
    assert art["findings"]["fused_beats_unweighted"] is True
    # the LM actually learned the task before serving (the held-out
    # probe shows ONE relevant doc per context; demo queries carry two,
    # so downstream EM at small k runs higher than this gate)
    assert art["lm"]["heldout_extraction_acc_k2"] >= 0.65
