"""Stage 01b (encode) resume logic, stage 07 CLI end-to-end, multihost init."""

import json
from unittest import mock

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier


torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = dict(
    vocab_size=128, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=64, type_vocab_size=2,
)


class FakeTokenizer:
    def __call__(self, text, truncation=True, max_length=256):
        return {"input_ids": [ord(c) % 120 + 1 for c in text][:max_length]}


def _tiny_bert():
    from qpp_fusion_rag_tpu.encoders import BertConfig, params_from_hf_state_dict

    torch.manual_seed(0)
    model = transformers.BertModel(transformers.BertConfig(**TINY)).eval()
    cfg = BertConfig.from_hf(model.config)
    return params_from_hf_state_dict(model.state_dict(), cfg), cfg


def test_encode_cli_and_resume(tmp_path, tmp_dataset):
    from qpp_fusion_rag_tpu.pipeline import encode

    params, cfg = _tiny_bert()
    out = tmp_path / "dense"
    argv = [
        "--corpus", str(tmp_dataset / "corpus.jsonl"),
        "--output", str(out), "--model", "fake", "--chunk-docs", "8",
        "--batch-size", "4", "--max-len", "32",
    ]
    with mock.patch.object(encode, "iter_chunks", wraps=encode.iter_chunks), \
         mock.patch("qpp_fusion_rag_tpu.encoders.load_hf_bert",
                    return_value=(params, cfg)), \
         mock.patch("transformers.AutoTokenizer.from_pretrained",
                    return_value=FakeTokenizer()):
        rc = encode.main(argv)
        assert rc == 0
        parts = sorted((out / "parts").glob("emb_*.npy"))
        assert len(parts) == 3  # 20 docs / 8 per chunk
        emb1 = np.load(out / "embeddings.npy")
        assert emb1.shape == (20, 32)
        docnos = (out / "docnos.txt").read_text().splitlines()
        assert docnos[0] == "d0" and len(docnos) == 20

        # resume: corrupt one part's mtime marker by deleting embeddings.npy,
        # re-run — existing parts must be skipped (content unchanged)
        first_part_before = np.load(parts[0])
        rc = encode.main(argv)
        assert rc == 0
        np.testing.assert_array_equal(np.load(parts[0]), first_part_before)

    # index is loadable by the dense retriever
    from qpp_fusion_rag_tpu.retrievers.dense import DenseIndex

    idx = DenseIndex.load(out)
    assert idx.num_docs == 20


def test_rag_eval_cli(tmp_path, tmp_dataset, monkeypatch):
    from qpp_fusion_rag_tpu.data.loaders import write_run_file
    from qpp_fusion_rag_tpu.generation import client as gen_client
    from qpp_fusion_rag_tpu.pipeline import rag_eval

    run = {str(i): [(f"d{i}", 2.0), (f"d{i + 5}", 1.0)] for i in range(1, 6)}
    run_path = tmp_path / "fused.res"
    write_run_file(run, run_path, tag="fused")

    def fake_transport(url, payload, timeout):
        return {"choices": [{"message": {"content": "body text answer"}}],
                "model": payload["model"]}

    monkeypatch.setattr(gen_client, "_default_transport", fake_transport)
    out_dir = tmp_path / "results"
    rc = rag_eval.main([
        "--dataset-dir", str(tmp_dataset),
        "--fused-run", str(run_path),
        "--output-dir", str(out_dir),
        "--dataset", "nq",
        "--k-shots", "0", "1", "2",
        "--model-name", "testmodel",
    ])
    assert rc == 0
    results = list(out_dir.glob("fused__testmodel.json"))
    assert len(results) == 1
    data = json.loads(results[0].read_text())
    assert data["n_queries"] == 5
    # rank-1 doc is the relevant one -> k=1 diagnostics perfect
    assert data["diagnostics_by_k"]["1"]["reciprocal_rank"] == 1.0
    assert data["results"]["1"]["by_k"]["2"]["answer"] == "body text answer"


def test_multihost_single_process():
    from qpp_fusion_rag_tpu.parallel.multihost import (
        host_local_corpus_slice,
        init_distributed,
    )

    # single-process: must not raise (ValueError path) and slice covers all
    init_distributed()
    start, stop = host_local_corpus_slice(1000)
    assert (start, stop) == (0, 1000)


def test_host_local_corpus_slice_with_mesh():
    """Mesh-aware slice: a single-process virtual mesh owns the WHOLE
    corpus axis, so the host range must be [0, N) regardless of
    process_count-based splitting."""
    from qpp_fusion_rag_tpu.parallel.mesh import build_mesh
    from qpp_fusion_rag_tpu.parallel.multihost import host_local_corpus_slice

    mesh = build_mesh(2, 4)
    start, stop = host_local_corpus_slice(1000, mesh=mesh)
    assert (start, stop) == (0, 1000)
