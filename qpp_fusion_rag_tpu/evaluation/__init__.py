"""Evaluation: IR metrics, QA/FV end-task metrics, fairness, benchmarks."""

from qpp_fusion_rag_tpu.evaluation.base import (
    FactVerificationGoldLabel,
    FactVerificationPrediction,
    QAGoldLabel,
    QAPrediction,
    TaskType,
    get_task_type,
)
from qpp_fusion_rag_tpu.evaluation.fact_verification import FactVerificationEvaluator
from qpp_fusion_rag_tpu.evaluation.ir_evaluator import (
    IREvaluator,
    compute_ndcg,
    per_query_metric,
)
from qpp_fusion_rag_tpu.evaluation.qa_evaluator import (
    QAEvaluator,
    compute_qa_metrics_batch,
)

__all__ = [
    "TaskType", "get_task_type", "QAGoldLabel", "QAPrediction",
    "FactVerificationGoldLabel", "FactVerificationPrediction",
    "IREvaluator", "per_query_metric", "compute_ndcg",
    "QAEvaluator", "compute_qa_metrics_batch", "FactVerificationEvaluator",
]
