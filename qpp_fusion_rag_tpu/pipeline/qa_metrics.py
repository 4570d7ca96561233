"""Stage 08 — QA metric post-processing CLI.

`python -m qpp_fusion_rag_tpu.pipeline.qa_metrics --results
 data/<ds>/results/learned__model.json --gold-answers data/<ds>/gold.json
 [--semantic] [--judge]`

Reference: scripts/08_compute_qa_metrics.py — update a stage-07 results
JSON in place with EM/F1/containment per answer, optional semantic
similarity (batched embedding cosine via the embeddings endpoint,
:138-172) and optional LLM-judge 1-5 rating (:179-232), plus per-k
aggregates.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Dict, List


def cosine(a, b) -> float:
    import numpy as np

    a, b = np.asarray(a), np.asarray(b)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0


JUDGE_SYSTEM = (
    "You are an impartial judge. Rate how well the candidate answer matches "
    "the reference answer(s) for the question, on a scale of 1 (completely "
    "wrong) to 5 (perfect). Respond with ONLY the number."
)


def judge_rating(op, query: str, answer: str, references: List[str]):
    """-> rating in [1, 5], or None when the judge's reply contains no
    parseable in-range number (refusals/verbose output) — a 0.0 here
    would drag the aggregated mean below the scale floor."""
    user = (
        f"Question: {query}\nReference answer(s): {'; '.join(references)}\n"
        f"Candidate answer: {answer}\nRating:"
    )
    text = op.execute(JUDGE_SYSTEM, user).text
    for tok in text.replace("/", " ").split():
        try:
            v = float(tok)
            if 1.0 <= v <= 5.0:
                return v
        except ValueError:
            continue
    return None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Compute QA metrics over RAG results")
    ap.add_argument("--results", required=True, help="stage-07 results JSON (updated in place)")
    ap.add_argument("--gold-answers", required=True, help="{qid: [answers]} JSON")
    ap.add_argument("--semantic", action="store_true", help="embedding cosine similarity")
    ap.add_argument("--semantic-backend", default="http",
                    choices=["http", "local", "local-random"],
                    help="embedding transport: LM-Studio-compatible HTTP "
                         "(reference 08:138-172), an on-device JAX BERT "
                         "checkpoint, or a random-init on-device encoder "
                         "(offline smoke only)")
    ap.add_argument("--embed-model", default=None,
                    help="checkpoint path for --semantic-backend=local")
    ap.add_argument("--judge", action="store_true", help="LLM-judge 1-5 rating")
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.evaluation.qa_evaluator import QAEvaluator

    path = Path(args.results)
    data = json.loads(path.read_text())
    gold_raw = json.loads(Path(args.gold_answers).read_text())
    gold: Dict[str, List[str]] = {}
    for qid, v in gold_raw.items():
        if isinstance(v, list):
            gold[qid] = [str(x) for x in v]
        elif isinstance(v, dict):
            ans = v.get("answers") or v.get("answer") or []
            gold[qid] = [str(x) for x in (ans if isinstance(ans, list) else [ans])]
        else:
            gold[qid] = [str(v)]

    ev = QAEvaluator()
    embed_op = judge_op = None
    if args.semantic:
        from qpp_fusion_rag_tpu.generation.local_embed import make_embedding_op

        embed_op = make_embedding_op(args.semantic_backend,
                                     model=args.embed_model)
    if args.judge:
        from qpp_fusion_rag_tpu.generation.client import GenerationOperation

        judge_op = GenerationOperation()

    per_k: Dict[str, List[Dict[str, float]]] = {}
    for qid, rec in data.get("results", {}).items():
        refs = gold.get(qid)
        if not refs:
            continue
        for k, r in rec["by_k"].items():
            answer = r.get("answer", "") or ""
            metrics = ev.evaluate_single(answer, refs)
            if embed_op is not None and answer:
                embs = embed_op.embed([answer] + refs)
                metrics["semantic"] = max(
                    cosine(embs[0], e) for e in embs[1:]
                ) if len(embs) > 1 else 0.0
            if judge_op is not None and answer:
                rating = judge_rating(judge_op, rec["query"], answer, refs)
                if rating is not None:
                    metrics["llm_judge"] = rating
            r["metrics"] = metrics
            per_k.setdefault(k, []).append(metrics)

    data["metrics_by_k"] = {
        k: ev.aggregate(items) for k, items in per_k.items()
    }
    # carry aggregated extras (semantic/judge) too
    for k, items in per_k.items():
        for extra in ("semantic", "llm_judge"):
            vals = [i[extra] for i in items if extra in i]
            if vals:
                data["metrics_by_k"][k][extra] = sum(vals) / len(vals)

    path.write_text(json.dumps(data, indent=2))
    for k in sorted(data["metrics_by_k"], key=int):
        m = data["metrics_by_k"][k]
        print(f"[qa_metrics] k={k}: EM={m['em']:.3f} F1={m['f1']:.3f} "
              f"containment={m['containment']:.3f}")
    print(f"[qa_metrics] updated {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
