"""RAG end-task evaluation harness (stage 07 core).

Mirrors the reference's k-shot harness (reference scripts/07_rag_eval.py):
for each query and each k in `k_shots`, build the top-k context from the
corpus, prompt the LLM, and record the answer plus retrieval diagnostics
(hit / recall@k / reciprocal rank vs qrels, :93-113). Monolithic JSON
checkpoint with completed-set + empty-answer retry queue (:165-210);
`{fusion}__{model}.json` result naming (:359-413).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

from qpp_fusion_rag_tpu.config import config


def check_relevance(
    doc_ids: Sequence[str], qrels_q: Dict[str, int], k: int
) -> Dict[str, float]:
    """Retrieval diagnostics for the top-k context
    (reference 07_rag_eval.py:93-113)."""
    rel = {d for d, r in qrels_q.items() if r > 0}
    top = list(doc_ids)[:k]
    hits = [d for d in top if d in rel]
    rr = 0.0
    for rank, d in enumerate(top, 1):
        if d in rel:
            rr = 1.0 / rank
            break
    return {
        "hit": float(bool(hits)),
        "recall_at_k": len(set(hits)) / len(rel) if rel else 0.0,
        "reciprocal_rank": rr,
        "n_relevant_in_context": len(hits),
    }


class RAGEvaluationHarness:
    def __init__(
        self,
        generator,                    # QAGenerator / FactVerificationGenerator
        corpus,                       # mapping docno -> text (dict or LazyCorpus)
        qrels: Dict[str, Dict[str, int]],
        k_shots: Optional[Sequence[int]] = None,
        checkpoint_path: Optional[os.PathLike] = None,
        checkpoint_every: int = 10,
    ):
        self.generator = generator
        self.corpus = corpus
        self.qrels = qrels
        self.k_shots = list(k_shots or config.evaluation.default_k_shots)
        self.checkpoint_path = Path(checkpoint_path) if checkpoint_path else None
        self.checkpoint_every = checkpoint_every

    # -- context ------------------------------------------------------
    def _doc_text(self, docno: str) -> str:
        from qpp_fusion_rag_tpu.data.loaders import doc_text

        return doc_text(self.corpus, docno)

    def build_context(self, doc_ids: Sequence[str], k: int) -> List[str]:
        """Top-k passage texts (reference 07:74-90)."""
        return [self._doc_text(d) for d in list(doc_ids)[:k]]

    # -- checkpointing ------------------------------------------------
    def _load_checkpoint(self) -> Tuple[Dict, set]:
        if self.checkpoint_path and self.checkpoint_path.exists():
            data = json.loads(self.checkpoint_path.read_text())
            completed = data.get("completed", {})
            retry = set(data.get("retry", []))
            # requeue empty answers (reference 07:178-199)
            for qid in list(retry):
                completed.pop(qid, None)
            return completed, retry
        return {}, set()

    def _save_checkpoint(self, completed: Dict) -> None:
        if not self.checkpoint_path:
            return
        retry = [
            qid for qid, rec in completed.items()
            if any(not r.get("answer") for r in rec["by_k"].values())
        ]
        self.checkpoint_path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.checkpoint_path.with_suffix(".tmp")
        tmp.write_text(json.dumps({"completed": completed, "retry": retry}))
        tmp.replace(self.checkpoint_path)

    # -- per-query ----------------------------------------------------
    def evaluate_query(
        self, qid: str, query: str, run_docs: Sequence[str]
    ) -> Dict:
        qrels_q = self.qrels.get(qid, {})
        by_k = {}
        # fetch the largest context once; each k is a prefix of it
        max_context = self.build_context(run_docs, max(self.k_shots, default=0))
        for k in self.k_shots:
            contexts = max_context[:k]
            t0 = time.perf_counter()
            try:
                result = self.generator.generate(query, contexts)
                answer = getattr(result, "text", None)
                if answer is None:  # FVResult
                    # An unparseable verdict (label=None) is a completed call,
                    # not a transport failure: keep the raw text as the answer
                    # so the retry queue (which keys on empty answers) does not
                    # re-spend the query forever; record label separately.
                    answer = result.label or result.raw.text
                    extra = {"rationale": result.rationale, "label": result.label}
                else:
                    extra = {}
                error = None
            except Exception as e:
                answer, extra, error = "", {}, str(e)
            ms = (time.perf_counter() - t0) * 1000.0
            by_k[str(k)] = {
                "answer": answer,
                "latency_ms": ms,
                "error": error,
                "diagnostics": check_relevance(run_docs, qrels_q, k),
                **extra,
            }
        return {"query": query, "by_k": by_k}

    # -- batch --------------------------------------------------------
    def run(
        self,
        queries: Dict[str, str],
        fused_run: Dict[str, List],     # qid -> [(docno, score)] or [docno]
        max_queries: Optional[int] = None,
    ) -> Dict:
        completed, _retry = self._load_checkpoint()
        pending = [q for q in queries if q not in completed]
        if max_queries is not None:
            pending = pending[:max_queries]

        for i, qid in enumerate(pending):
            entries = fused_run.get(qid, [])
            docs = [e[0] if isinstance(e, (tuple, list)) else e for e in entries]
            completed[qid] = self.evaluate_query(qid, queries[qid], docs)
            if (i + 1) % self.checkpoint_every == 0:
                self._save_checkpoint(completed)
        self._save_checkpoint(completed)
        return {
            "results": completed,
            "k_shots": self.k_shots,
            "n_queries": len(completed),
            "diagnostics_by_k": self.aggregate_diagnostics(completed),
        }

    @staticmethod
    def aggregate_diagnostics(completed: Dict) -> Dict[str, Dict[str, float]]:
        agg: Dict[str, Dict[str, List[float]]] = {}
        for rec in completed.values():
            for k, r in rec["by_k"].items():
                d = r.get("diagnostics", {})
                bucket = agg.setdefault(k, {})
                for m, v in d.items():
                    bucket.setdefault(m, []).append(float(v))
        return {
            k: {m: sum(v) / len(v) for m, v in ms.items() if v}
            for k, ms in agg.items()
        }
