"""Oracle baseline: per-query best-ranker selection (upper bound).

Reference scripts/10_oracle_baseline.py:117-202 — compute the per-query
per-ranker metric, build the oracle run by taking each query's best
ranker's list, report the upper bound and the selection histogram. The
per-query metric matrix comes from the vectorized device metrics
(evaluation.ir_evaluator.per_query_metric), one call per retriever instead
of one ir_measures iter_calc per (query, ranker).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Dict, Optional, Sequence

import numpy as np

from qpp_fusion_rag_tpu.data.runtensor import RunTensor
from qpp_fusion_rag_tpu.evaluation.ir_evaluator import IREvaluator, per_query_metric


def oracle_selection(
    rt: RunTensor,
    qrels: Dict[str, Dict[str, int]],
    metric: str = "nDCG@10",
) -> Dict:
    """-> {selection [Q] int, per_query [R, Q], histogram, oracle_metric,
    per_retriever_metric}."""
    quality = per_query_metric(rt, qrels, metric=metric)   # [R, Q]
    selection = np.argmax(quality, axis=0)                 # [Q]
    judged = np.array([q in qrels for q in rt.qids])

    hist = {
        rt.retrievers[r]: int(np.sum(selection[judged] == r))
        for r in range(rt.R)
    }
    oracle_vals = quality[selection, np.arange(rt.Q)]
    denom = max(int(judged.sum()), 1)
    return {
        "selection": selection,
        "per_query": quality,
        "histogram": hist,
        "oracle_metric": float(oracle_vals[judged].sum() / denom),
        "per_retriever_metric": {
            rt.retrievers[r]: float(quality[r][judged].sum() / denom)
            for r in range(rt.R)
        },
        "metric": metric,
    }


def oracle_run(rt: RunTensor, selection: np.ndarray, name: str = "oracle") -> RunTensor:
    """Assemble the oracle RunTensor: query qi takes retriever selection[qi]'s
    list (reference 10_oracle_baseline.py:152-202)."""
    doc_ids = rt.doc_ids[selection, np.arange(rt.Q)][None]   # [1, Q, K]
    scores = rt.scores[selection, np.arange(rt.Q)][None]
    return RunTensor(doc_ids, scores, rt.qids, [name], rt.vocab)


def oracle_report(
    rt: RunTensor,
    qrels: Dict[str, Dict[str, int]],
    metric: str = "nDCG@10",
    extra_metrics: Optional[Sequence[str]] = None,
) -> Dict:
    """Full stage-10 report: upper bound + histogram + oracle-run eval."""
    sel = oracle_selection(rt, qrels, metric=metric)
    orun = oracle_run(rt, sel["selection"])
    metrics = list(extra_metrics or [metric, "RR@10", "R@100"])
    ev = IREvaluator(metrics)
    oracle_eval = ev.evaluate(orun, qrels)
    best_single = max(sel["per_retriever_metric"].values())
    return {
        "metric": metric,
        "oracle": oracle_eval,
        "oracle_metric": sel["oracle_metric"],
        "per_retriever": sel["per_retriever_metric"],
        "best_single": best_single,
        "headroom": sel["oracle_metric"] - best_single,
        "selection_histogram": sel["histogram"],
        "selection": sel["selection"],
    }
