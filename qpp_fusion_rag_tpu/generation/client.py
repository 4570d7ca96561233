"""LLM generation client + task generators (host-side HTTP).

Mirrors the reference's generation layer (reference src/generation.py):
  * `GenerationOperation` — OpenAI-compatible chat call (LM Studio at
    localhost:1234/v1 by default) with a strict error surface (:38-141),
  * `QAGenerator` / `FactVerificationGenerator` — config-templated prompts
    (:244-404) incl. FV verdict/rationale parsing,
  * `ValidateOperation` — heuristic answer validation
    (hallucination/completeness/citation, :144-237),
  * `EmbeddingOperation` — /v1/embeddings batch call (used by the QA
    semantic-similarity metric, reference scripts/08:138-172).

The HTTP transport is injectable for tests and offline use.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

from qpp_fusion_rag_tpu.config import config
from qpp_fusion_rag_tpu.evaluation.fact_verification import parse_verdict


class GenerationError(RuntimeError):
    """Raised on any transport / API failure (strict error surface —
    the reference refuses to silently continue, generation.py:118-141)."""


@dataclass
class GenerationResult:
    text: str
    latency_ms: float
    model: str
    usage: Dict = field(default_factory=dict)


_session = None


def _default_transport(url: str, payload: Dict, timeout: float) -> Dict:
    """Pooled-connection POST (reference scripts/08 keeps a connection pool
    for the batched embedding calls, :138-172)."""
    global _session
    import requests

    if _session is None:
        _session = requests.Session()
    resp = _session.post(url, json=payload, timeout=timeout)
    if resp.status_code != 200:
        raise GenerationError(f"LLM server returned {resp.status_code}: {resp.text[:500]}")
    return resp.json()


class GenerationOperation:
    """Chat-completion call against an OpenAI-compatible server."""

    def __init__(
        self,
        base_url: Optional[str] = None,
        model: Optional[str] = None,
        temperature: Optional[float] = None,
        max_tokens: Optional[int] = None,
        timeout: Optional[float] = None,
        transport: Optional[Callable[[str, Dict, float], Dict]] = None,
    ):
        llm = config.models.llm
        self.base_url = (base_url or str(llm.base_url)).rstrip("/")
        self.model = model or str(llm.default_model)
        self.temperature = temperature if temperature is not None else float(config.generation.temperature)
        self.max_tokens = max_tokens if max_tokens is not None else int(config.generation.max_tokens)
        self.timeout = timeout if timeout is not None else float(llm.timeout_seconds)
        self.transport = transport or _default_transport

    def execute(self, system: str, user: str) -> GenerationResult:
        payload = {
            "model": self.model,
            "messages": [
                {"role": "system", "content": system},
                {"role": "user", "content": user},
            ],
            "temperature": self.temperature,
            "max_tokens": self.max_tokens,
        }
        t0 = time.perf_counter()
        try:
            data = self.transport(f"{self.base_url}/chat/completions", payload, self.timeout)
        except GenerationError:
            raise
        except Exception as e:
            raise GenerationError(f"LLM request failed: {e}") from e
        ms = (time.perf_counter() - t0) * 1000.0
        try:
            text = data["choices"][0]["message"]["content"]
        except (KeyError, IndexError, TypeError) as e:
            raise GenerationError(f"Malformed LLM response: {data}") from e
        if not isinstance(text, str):  # e.g. "content": null
            raise GenerationError(f"LLM response has non-string content: {text!r}")
        return GenerationResult(
            text=text.strip(), latency_ms=ms,
            model=data.get("model", self.model), usage=data.get("usage", {}),
        )


class EmbeddingOperation:
    """Batch /v1/embeddings call (semantic-similarity metric transport)."""

    def __init__(self, base_url: Optional[str] = None, model: Optional[str] = None,
                 timeout: Optional[float] = None, transport=None):
        llm = config.models.llm
        self.base_url = (base_url or str(llm.base_url)).rstrip("/")
        self.model = model or str(llm.embed_model)
        self.timeout = timeout if timeout is not None else float(llm.timeout_seconds)
        self.transport = transport or _default_transport

    def embed(self, texts: Sequence[str]) -> List[List[float]]:
        payload = {"model": self.model, "input": list(texts)}
        try:
            data = self.transport(f"{self.base_url}/embeddings", payload, self.timeout)
            # the API carries an explicit per-item index because list
            # order is not contractually guaranteed
            items = sorted(data["data"], key=lambda d: d.get("index", 0))
            return [d["embedding"] for d in items]
        except GenerationError:
            raise
        except Exception as e:
            raise GenerationError(f"Embedding request failed: {e}") from e


# =============================================================================
# Task generators (config-templated prompts, reference generation.py:244-404)
# =============================================================================

class QAGenerator:
    def __init__(self, op: Optional[GenerationOperation] = None):
        self.op = op or GenerationOperation()
        p = config.generation.prompts.qa
        self.system = str(p.system)
        self.user_template = str(p.user_template)

    def generate(self, query: str, contexts: Sequence[str]) -> GenerationResult:
        context = "\n\n".join(
            f"[{i + 1}] {c}" for i, c in enumerate(contexts)
        ) if contexts else "(no context provided)"
        user = self.user_template.format(context=context, query=query)
        return self.op.execute(self.system, user)


@dataclass
class FVResult:
    label: Optional[str]
    rationale: str
    raw: GenerationResult


class FactVerificationGenerator:
    def __init__(self, op: Optional[GenerationOperation] = None):
        self.op = op or GenerationOperation()
        p = config.generation.prompts.fact_verification
        self.system = str(p.system)
        self.user_template = str(p.user_template)

    def generate(self, claim: str, contexts: Sequence[str]) -> FVResult:
        context = "\n\n".join(f"[{i + 1}] {c}" for i, c in enumerate(contexts))
        user = self.user_template.format(context=context, claim=claim)
        raw = self.op.execute(self.system, user)
        label = parse_verdict(raw.text)
        rationale = raw.text.split("Verdict:")[0].strip() if "Verdict:" in raw.text else raw.text
        return FVResult(label=label, rationale=rationale, raw=raw)


def get_generator(task_type, op: Optional[GenerationOperation] = None):
    """Task-type dispatch (reference generation.py get_generator)."""
    from qpp_fusion_rag_tpu.evaluation.base import TaskType

    t = TaskType(task_type) if not isinstance(task_type, TaskType) else task_type
    if t == TaskType.FACT_VERIFICATION:
        return FactVerificationGenerator(op)
    return QAGenerator(op)


# =============================================================================
# Heuristic answer validation (reference generation.py:144-237)
# =============================================================================

class ValidateOperation:
    """Cheap no-LLM answer checks: refusal/empty detection, context overlap
    (hallucination proxy), completeness, citation presence."""

    REFUSALS = ("i cannot answer", "i can't answer", "cannot answer",
                "no answer", "i don't know")

    def validate(self, answer: str, contexts: Sequence[str]) -> Dict:
        a = answer.strip()
        lowered = a.lower()
        is_refusal = any(r in lowered for r in self.REFUSALS)
        tokens = set(lowered.split())
        ctx_tokens = set()
        for c in contexts:
            ctx_tokens.update(c.lower().split())
        overlap = len(tokens & ctx_tokens) / len(tokens) if tokens else 0.0
        return {
            "is_empty": len(a) == 0,
            "is_refusal": is_refusal,
            "context_overlap": overlap,
            "likely_hallucination": (not is_refusal) and bool(tokens) and overlap < 0.3,
            "is_complete": a.endswith((".", "!", "?")) or len(a.split()) <= 8,
            "has_citation": "[" in a and "]" in a,
            "length_tokens": len(a.split()),
        }
