"""QPP evaluation workflow: predictors × correlation metrics × retrievers.

Re-expresses the reference's experiments package driver (reference
experiments/QPPEvaluator.java, TRECDLQPPEvaluator.java,
QPPOnPreRetrievedResults.java): for every retriever, correlate each QPP
method's per-query predictions with the true per-query retrieval quality,
across a configurable set of correlation metrics. This is the analysis
behind the reference paper's "RSD is the best single predictor" finding
(Architecture/qpp-fusion-methods.plan..md:57-64).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from qpp_fusion_rag_tpu.config import config
from qpp_fusion_rag_tpu.data.runtensor import RunTensor
from qpp_fusion_rag_tpu.evaluation.ir_evaluator import per_query_metric
from qpp_fusion_rag_tpu.qpp.correlation import LOWER_IS_BETTER, evaluate_correlations
from qpp_fusion_rag_tpu.qpp.engine import compute_qpp_for_runtensor


def evaluate_qpp_methods(
    rt: RunTensor,
    qrels: Dict[str, Dict[str, int]],
    qpp: Optional[np.ndarray] = None,       # [R, Q, n_methods]; computed if None
    target_metric: str = "nDCG@10",
    correlation_metrics: Sequence[str] = ("pearson", "spearman", "kendall", "smare", "pairwise_accuracy"),
    query_texts: Optional[Dict[str, str]] = None,
) -> Dict:
    """-> {retriever: {qpp_method: {corr_metric: value}}, plus "_mean" over
    retrievers and "_target" per-query truth}."""
    if qpp is None:
        qpp = compute_qpp_for_runtensor(rt, query_texts=query_texts)
    method_names = list(config.qpp.methods)
    quality = per_query_metric(rt, qrels, metric=target_metric)      # [R, Q]
    judged = np.array([q in qrels for q in rt.qids])

    out: Dict = {"_target": target_metric}
    acc: Dict[str, Dict[str, list]] = {}
    for r, rname in enumerate(rt.retrievers):
        truth = quality[r][judged]
        per_method = {}
        for mi, mname in enumerate(method_names):
            pred = qpp[r, judged, mi]
            scores = evaluate_correlations(pred, truth, metrics=correlation_metrics)
            per_method[mname] = scores
            for cm, v in scores.items():
                acc.setdefault(mname, {}).setdefault(cm, []).append(v)
        out[rname] = per_method
    out["_mean"] = {
        mname: {cm: float(np.mean(vs)) for cm, vs in cms.items()}
        for mname, cms in acc.items()
    }
    return out


def best_predictor(report: Dict, correlation: str = "pearson") -> str:
    """QPP method with the best mean score across retrievers — highest for
    correlations, lowest for error metrics (smare/rmse)."""
    mean = report["_mean"]
    select = min if correlation in LOWER_IS_BETTER else max
    return select(mean, key=lambda m: mean[m][correlation])
