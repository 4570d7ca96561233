"""Attempt to fetch the reference's real encoder checkpoints (VERDICT r3
task #9). The reference's retrieval quality numbers depend on these HF
checkpoints (reference config/defaults.yaml models.*):

    BAAI/bge-base-en-v1.5                     (BGE dense)
    naver/splade-cocondenser-ensembledistil   (SPLADE)
    castorini/tct_colbert-v2-hnp-msmarco      (TCT-ColBERT)
    cross-encoder/ms-marco-MiniLM-L-6-v2      (MonoT5-slot reranker)
    prajjwal1/bert-tiny                       (smallest smoke candidate)

This environment is zero-egress, so the expected outcome is a clean
failure report — committed so the encoder-weights gap is a DOCUMENTED
environment constraint, not an untested path. If any checkpoint is
present in a local HF cache it is loaded through
encoders.bert.load_hf_bert and smoke-encoded.

Run: python scripts_dev/fetch_weights.py  (writes docs/fetch_weights.json)
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MODELS = [
    "prajjwal1/bert-tiny",
    "BAAI/bge-base-en-v1.5",
    "naver/splade-cocondenser-ensembledistil",
    "castorini/tct_colbert-v2-hnp-msmarco",
    "cross-encoder/ms-marco-MiniLM-L-6-v2",
]


def try_model(name: str, timeout_s: float = 120.0):
    import socket

    socket.setdefaulttimeout(timeout_s)
    t0 = time.time()
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from qpp_fusion_rag_tpu.encoders.bert import load_hf_bert

        params, cfg = load_hf_bert(name)
        import jax.numpy as jnp

        from qpp_fusion_rag_tpu.encoders.bert import bert_encode

        out = bert_encode(params, cfg,
                          jnp.ones((1, 4), jnp.int32),
                          jnp.ones((1, 4), jnp.int32))
        return {"status": "loaded", "hidden": int(out.shape[-1]),
                "layers": cfg.num_hidden_layers,
                "elapsed_s": round(time.time() - t0, 1)}
    except Exception as e:
        return {"status": "failed",
                "error": f"{type(e).__name__}: {str(e)[:240]}",
                "elapsed_s": round(time.time() - t0, 1)}


def main():
    report = {"attempted": {}, "environment": {}}
    import os

    report["environment"]["HF_HOME"] = os.environ.get("HF_HOME", "")
    cache = Path(os.environ.get("HF_HOME", Path.home() / ".cache/huggingface"))
    report["environment"]["hf_cache_exists"] = cache.exists()
    if cache.exists():
        hub = cache / "hub"
        report["environment"]["cached_models"] = sorted(
            p.name for p in hub.glob("models--*")) if hub.exists() else []
    for name in MODELS:
        print(f"[fetch] trying {name} ...", flush=True)
        report["attempted"][name] = try_model(name)
        print(f"[fetch]   -> {report['attempted'][name]['status']}")
    n_ok = sum(1 for v in report["attempted"].values()
               if v["status"] == "loaded")
    report["summary"] = (
        f"{n_ok}/{len(MODELS)} checkpoints loadable; zero-egress "
        "environment -> failures are the expected outcome and document "
        "why encoder tests run against random-init weights "
        "(tests/test_encoders.py)")
    out = REPO / "docs/fetch_weights.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(f"[fetch] wrote {out}")


if __name__ == "__main__":
    main()
