"""QA/FV evaluators, generation client (fake transport), RAG harness, 07/08 CLIs."""

import json

import numpy as np
import pytest

from qpp_fusion_rag_tpu.evaluation.base import (
    FactVerificationGoldLabel,
    FactVerificationPrediction,
    TaskType,
    get_task_type,
)
from qpp_fusion_rag_tpu.evaluation.fact_verification import (
    FactVerificationEvaluator,
    parse_verdict,
)
from qpp_fusion_rag_tpu.evaluation.qa_evaluator import (
    QAEvaluator,
    compute_qa_metrics_batch,
    exact_match,
    normalize_answer,
    rouge_l,
    token_f1,
)


# -- QA metrics ---------------------------------------------------------------

def test_normalize_answer():
    assert normalize_answer("The  Quick, Brown Fox!") == "quick brown fox"
    assert normalize_answer("A dog.") == "dog"


def test_em_f1():
    assert exact_match("The answer is Paris.", ["the answer is paris"]) == 1.0
    assert exact_match("Paris", ["London"]) == 0.0
    assert token_f1("Paris France", ["Paris"]) == pytest.approx(2 / 3)
    assert token_f1("", [""]) == 1.0
    assert token_f1("x", [""]) == 0.0


def test_rouge_l():
    assert rouge_l("the cat sat on the mat", ["the cat sat on the mat"]) == 1.0
    assert rouge_l("cat mat", ["the cat sat on the mat"]) > 0.4


def test_qa_evaluator_batch():
    agg = compute_qa_metrics_batch(
        ["Paris", "Berlin is the capital"],
        [["Paris"], ["Berlin"]],
    )
    assert agg["em"] == 0.5
    assert 0 < agg["f1"] <= 1.0
    assert agg["containment"] == 1.0


# -- FV metrics ---------------------------------------------------------------

def test_label_normalization():
    n = FactVerificationGoldLabel.normalize_label
    assert n("supports") == "SUPPORT"
    assert n("REFUTES") == "CONTRADICT"
    assert n("not enough info") == "NOT_ENOUGH_INFO"
    assert n("nei") == "NOT_ENOUGH_INFO"
    assert n("banana") is None


def test_parse_verdict():
    assert parse_verdict("Blah.\nVerdict: SUPPORT") == "SUPPORT"
    assert parse_verdict("the evidence CONTRADICTS the claim") == "CONTRADICT"
    assert parse_verdict("no idea") is None


def test_fv_evaluator():
    golds = {
        "1": FactVerificationGoldLabel("1", "SUPPORT", ["d1"]),
        "2": FactVerificationGoldLabel("2", "CONTRADICT", ["d2"]),
        "3": FactVerificationGoldLabel("3", "NOT_ENOUGH_INFO"),
    }
    preds = [
        FactVerificationPrediction("1", "supports", evidence_doc_ids=["d1", "d9"]),
        FactVerificationPrediction("2", "SUPPORT"),
        FactVerificationPrediction("3", "NEI"),
    ]
    r = FactVerificationEvaluator().evaluate(preds, golds)
    assert r["accuracy"] == pytest.approx(2 / 3)
    assert r["n_evaluated"] == 3
    assert r["per_class"]["SUPPORT"]["recall"] == 1.0
    assert r["per_class"]["CONTRADICT"]["recall"] == 0.0
    # q1: pred {d1,d9} vs gold {d1} -> 0.5; q2: empty prediction -> 0.0
    assert r["evidence"]["precision"] == pytest.approx(0.25)


def test_task_typing():
    assert get_task_type("scifact") == TaskType.FACT_VERIFICATION
    assert get_task_type("nq") == TaskType.QA


# -- generation client with fake transport ------------------------------------

def fake_transport_factory(reply="The answer is 42."):
    calls = []

    def transport(url, payload, timeout):
        calls.append((url, payload))
        if url.endswith("/embeddings"):
            return {"data": [{"embedding": [float(len(t) % 7), 1.0, 0.0]}
                             for t in payload["input"]]}
        return {"choices": [{"message": {"content": reply}}],
                "model": payload["model"], "usage": {"total_tokens": 10}}

    transport.calls = calls
    return transport


def test_generation_operation():
    from qpp_fusion_rag_tpu.generation.client import GenerationOperation

    t = fake_transport_factory()
    op = GenerationOperation(transport=t)
    res = op.execute("sys", "user")
    assert res.text == "The answer is 42."
    assert t.calls[0][1]["messages"][0]["role"] == "system"


def test_generation_error_surface():
    from qpp_fusion_rag_tpu.generation.client import (
        GenerationError,
        GenerationOperation,
    )

    def bad(url, payload, timeout):
        raise ConnectionError("refused")

    with pytest.raises(GenerationError):
        GenerationOperation(transport=bad).execute("s", "u")


def test_qa_generator_prompt_contains_context():
    from qpp_fusion_rag_tpu.generation.client import GenerationOperation, QAGenerator

    t = fake_transport_factory()
    g = QAGenerator(GenerationOperation(transport=t))
    g.generate("what is x?", ["ctx one", "ctx two"])
    user_msg = t.calls[0][1]["messages"][1]["content"]
    assert "ctx one" in user_msg and "what is x?" in user_msg


def test_fv_generator_parses_verdict():
    from qpp_fusion_rag_tpu.generation.client import (
        FactVerificationGenerator,
        GenerationOperation,
    )

    t = fake_transport_factory(reply="Because reasons.\nVerdict: CONTRADICT")
    g = FactVerificationGenerator(GenerationOperation(transport=t))
    out = g.generate("claim", ["evidence"])
    assert out.label == "CONTRADICT"
    assert "Because reasons" in out.rationale


def test_validate_operation():
    from qpp_fusion_rag_tpu.generation.client import ValidateOperation

    v = ValidateOperation()
    r = v.validate("I cannot answer.", ["some context"])
    assert r["is_refusal"]
    r2 = v.validate("grounded words here", ["the grounded words here appear"])
    assert r2["context_overlap"] > 0.9
    assert not r2["likely_hallucination"]


# -- RAG harness + CLIs -------------------------------------------------------

@pytest.fixture()
def rag_world(tmp_path):
    corpus = {f"d{i}": f"passage text number {i} with answer fact{i}" for i in range(20)}
    queries = {"1": "what is fact one", "2": "what is fact two"}
    qrels = {"1": {"d1": 1}, "2": {"d2": 1}}
    run = {"1": [("d1", 3.0), ("d5", 2.0), ("d6", 1.0)],
           "2": [("d7", 3.0), ("d2", 2.0), ("d8", 1.0)]}
    return corpus, queries, qrels, run


def test_rag_harness(tmp_path, rag_world):
    from qpp_fusion_rag_tpu.generation.client import GenerationOperation, QAGenerator
    from qpp_fusion_rag_tpu.generation.rag_harness import RAGEvaluationHarness

    corpus, queries, qrels, run = rag_world
    g = QAGenerator(GenerationOperation(transport=fake_transport_factory("fact1")))
    ckpt = tmp_path / "ckpt.json"
    h = RAGEvaluationHarness(g, corpus, qrels, k_shots=[0, 1, 2],
                             checkpoint_path=ckpt, checkpoint_every=1)
    out = h.run(queries, run)
    assert out["n_queries"] == 2
    d1 = out["results"]["1"]["by_k"]
    assert d1["1"]["diagnostics"]["hit"] == 1.0        # d1 at rank 1
    assert d1["1"]["diagnostics"]["reciprocal_rank"] == 1.0
    d2 = out["results"]["2"]["by_k"]
    assert d2["1"]["diagnostics"]["hit"] == 0.0        # d2 at rank 2, k=1 misses
    assert d2["2"]["diagnostics"]["reciprocal_rank"] == 0.5
    assert ckpt.exists()

    # resume: harness with a failing generator must not re-run completed queries
    class Boom:
        def generate(self, *a, **k):
            raise RuntimeError("no LLM")

    h2 = RAGEvaluationHarness(Boom(), corpus, qrels, k_shots=[0, 1, 2],
                              checkpoint_path=ckpt)
    out2 = h2.run(queries, run)
    assert out2["n_queries"] == 2
    assert out2["results"]["1"]["by_k"]["1"]["answer"] == "fact1"


def test_qa_metrics_cli(tmp_path, rag_world, monkeypatch):
    from qpp_fusion_rag_tpu.generation.client import GenerationOperation, QAGenerator
    from qpp_fusion_rag_tpu.generation.rag_harness import RAGEvaluationHarness
    from qpp_fusion_rag_tpu.pipeline.qa_metrics import main as qa_main

    corpus, queries, qrels, run = rag_world
    g = QAGenerator(GenerationOperation(transport=fake_transport_factory("fact1")))
    h = RAGEvaluationHarness(g, corpus, qrels, k_shots=[1, 2])
    out = h.run(queries, run)
    results_path = tmp_path / "fused__model.json"
    results_path.write_text(json.dumps(out))
    gold_path = tmp_path / "gold.json"
    gold_path.write_text(json.dumps({"1": ["fact1"], "2": ["fact2"]}))

    rc = qa_main(["--results", str(results_path), "--gold-answers", str(gold_path)])
    assert rc == 0
    data = json.loads(results_path.read_text())
    assert data["metrics_by_k"]["1"]["em"] == 0.5   # q1 exact, q2 wrong
    assert data["results"]["1"]["by_k"]["1"]["metrics"]["em"] == 1.0


def test_qa_metrics_cli_semantic_and_judge(tmp_path, rag_world):
    """--semantic and --judge paths with the fake transport injected."""
    from unittest import mock

    from qpp_fusion_rag_tpu.generation.client import GenerationOperation, QAGenerator
    from qpp_fusion_rag_tpu.generation.rag_harness import RAGEvaluationHarness
    from qpp_fusion_rag_tpu.pipeline import qa_metrics as qm

    corpus, queries, qrels, run = rag_world
    g = QAGenerator(GenerationOperation(transport=fake_transport_factory("fact1")))
    h = RAGEvaluationHarness(g, corpus, qrels, k_shots=[1])
    out = h.run(queries, run)
    results_path = tmp_path / "f__m.json"
    results_path.write_text(json.dumps(out))
    gold_path = tmp_path / "gold.json"
    gold_path.write_text(json.dumps({"1": ["fact1"], "2": ["fact2"]}))

    fake = fake_transport_factory("4")
    with mock.patch(
        "qpp_fusion_rag_tpu.generation.client._default_transport", fake
    ):
        rc = qm.main([
            "--results", str(results_path), "--gold-answers", str(gold_path),
            "--semantic", "--judge",
        ])
    assert rc == 0
    data = json.loads(results_path.read_text())
    m = data["metrics_by_k"]["1"]
    assert "semantic" in m and -1.0 - 1e-9 <= m["semantic"] <= 1.0 + 1e-9
    assert m["llm_judge"] == 4.0


# -- regression: client/harness edge cases -------------------------------------

def test_null_content_raises_generation_error():
    """'content': null must surface as GenerationError, not AttributeError."""
    from qpp_fusion_rag_tpu.generation.client import (
        GenerationError,
        GenerationOperation,
    )

    def null_content(url, payload, timeout):
        return {"choices": [{"message": {"content": None}}]}

    with pytest.raises(GenerationError):
        GenerationOperation(transport=null_content).execute("s", "u")


def test_unparseable_fv_verdict_not_retried_forever(tmp_path, rag_world):
    """An FV reply with no parseable verdict is a completed call: the raw
    text is kept as the answer (so the empty-answer retry queue skips it)
    and the parse failure is visible as label=None."""
    from qpp_fusion_rag_tpu.generation.client import (
        FactVerificationGenerator,
        GenerationOperation,
    )
    from qpp_fusion_rag_tpu.generation.rag_harness import RAGEvaluationHarness

    corpus, queries, qrels, run = rag_world
    g = FactVerificationGenerator(
        GenerationOperation(transport=fake_transport_factory("no idea at all"))
    )
    ckpt = tmp_path / "fv.json"
    h = RAGEvaluationHarness(g, corpus, qrels, k_shots=[1], checkpoint_path=ckpt)
    out = h.run(queries, run)
    rec = out["results"]["1"]["by_k"]["1"]
    assert rec["answer"] == "no idea at all"
    assert rec["label"] is None
    # the checkpoint's retry queue must be empty -> a resume re-runs nothing
    data = json.loads(ckpt.read_text())
    assert data["retry"] == []


def test_max_queries_zero_means_zero(rag_world):
    from qpp_fusion_rag_tpu.generation.client import GenerationOperation, QAGenerator
    from qpp_fusion_rag_tpu.generation.rag_harness import RAGEvaluationHarness

    corpus, queries, qrels, run = rag_world
    g = QAGenerator(GenerationOperation(transport=fake_transport_factory()))
    out = RAGEvaluationHarness(g, corpus, qrels, k_shots=[1]).run(
        queries, run, max_queries=0
    )
    assert out["n_queries"] == 0


def test_build_context_fetched_once_per_query(rag_world):
    """Each doc text is fetched once per query even with several k values."""
    from qpp_fusion_rag_tpu.generation.client import GenerationOperation, QAGenerator
    from qpp_fusion_rag_tpu.generation.rag_harness import RAGEvaluationHarness

    corpus, queries, qrels, run = rag_world
    fetches = []

    class CountingCorpus(dict):
        def get(self, key, default=""):
            fetches.append(key)
            return super().get(key, default)

    g = QAGenerator(GenerationOperation(transport=fake_transport_factory()))
    h = RAGEvaluationHarness(g, CountingCorpus(corpus), qrels, k_shots=[1, 2, 3])
    h.run({"1": queries["1"]}, run)
    assert len(fetches) == len(set(fetches)) == 3  # top-3 docs, once each


@pytest.mark.slow
def test_qa_metrics_cli_semantic_local(tmp_path, rag_world):
    """Stage 08 fully offline: --semantic with the on-device random-init
    encoder (generation/local_embed.py) — no HTTP transport anywhere
    (VERDICT r3 task #6; reference needs LM Studio here, 08:138-172)."""
    from qpp_fusion_rag_tpu.generation.client import (
        GenerationOperation, QAGenerator)
    from qpp_fusion_rag_tpu.generation.rag_harness import RAGEvaluationHarness
    from qpp_fusion_rag_tpu.pipeline import qa_metrics as qm

    corpus, queries, qrels, run = rag_world
    g = QAGenerator(GenerationOperation(transport=fake_transport_factory("fact1")))
    h = RAGEvaluationHarness(g, corpus, qrels, k_shots=[1])
    out = h.run(queries, run)
    results_path = tmp_path / "f__m.json"
    results_path.write_text(json.dumps(out))
    gold_path = tmp_path / "gold.json"
    gold_path.write_text(json.dumps({"1": ["fact1"], "2": ["fact2"]}))

    rc = qm.main([
        "--results", str(results_path), "--gold-answers", str(gold_path),
        "--semantic", "--semantic-backend", "local-random",
    ])
    assert rc == 0
    data = json.loads(results_path.read_text())
    m = data["metrics_by_k"]["1"]
    assert "semantic" in m and -1.0 - 1e-9 <= m["semantic"] <= 1.0 + 1e-9
    # q1's answer string equals its gold -> identical embeddings, cos = 1
    assert data["results"]["1"]["by_k"]["1"]["metrics"]["semantic"] == \
        pytest.approx(1.0, abs=1e-5)


@pytest.mark.slow
def test_local_embedding_operation_contract():
    from qpp_fusion_rag_tpu.generation.local_embed import (
        LocalEmbeddingOperation, make_embedding_op)

    op = LocalEmbeddingOperation.from_random(seed=0, batch_size=2)
    vecs = op.embed(["alpha beta", "gamma", "alpha beta"])
    assert len(vecs) == 3
    v = np.asarray(vecs)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(v[0], v[2], rtol=1e-6)   # deterministic
    assert abs(float(v[0] @ v[1])) < 0.9999             # distinct texts differ
    assert isinstance(make_embedding_op("local-random"),
                      LocalEmbeddingOperation)
    with pytest.raises(ValueError):
        make_embedding_op("local")          # needs a checkpoint path
    with pytest.raises(ValueError):
        make_embedding_op("nope")
