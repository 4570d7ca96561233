"""Learned-fusion training: QPP features → per-retriever quality soft targets.

Stage-04 equivalent (reference scripts/04_train_fusion.py):
  * X = flattened QPP feature matrix per query (13 × R),
  * Y = per-query per-retriever nDCG@10 row-normalized to sum 1 — computed
    here as one vectorized device metric pass per retriever
    (reference computes one ir_measures call per (query, retriever),
    scripts/04_train_fusion.py:76-105),
  * 80/20 sequential split (:246-250),
  * train per_retriever / multioutput GBDT + MLP,
  * report uniform vs learned vs oracle fused nDCG@10 (:108-157).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from qpp_fusion_rag_tpu.config import config
from qpp_fusion_rag_tpu.data.runtensor import RunTensor
from qpp_fusion_rag_tpu.evaluation.ir_evaluator import IREvaluator, per_query_metric
from qpp_fusion_rag_tpu.fusion.engine import combsum
from qpp_fusion_rag_tpu.models import (
    BaseFusionModel,
    build_features,
    compute_targets,
    get_model_class,
)


def build_training_data(
    rt: RunTensor,
    qpp_data: Dict[str, Dict[str, List[float]]],
    qrels: Dict[str, Dict[str, int]],
    target_metric: str = "nDCG@10",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[str]]:
    """-> (X [Q, 13R], Y [Q, R] soft targets, quality [R, Q], qids).

    Only queries present in qrels AND qpp_data are kept (the reference skips
    queries without either, scripts/04_train_fusion.py:85-97).
    """
    keep = [q for q in rt.qids if q in qrels and q in qpp_data]
    rt_k = rt.select_queries(keep)
    quality = per_query_metric(rt_k, qrels, metric=target_metric)   # [R, Q]
    X, _ = build_features(qpp_data, rt_k.retrievers, qids=keep)
    Y = compute_targets(quality)
    return X, Y, quality, keep


def evaluate_weights(
    rt: RunTensor,
    qids: Sequence[str],
    weights: np.ndarray,     # [Q, R]
    qrels: Dict[str, Dict[str, int]],
    metric: str = "nDCG@10",
) -> float:
    """Fused quality under given per-query weights (weighted CombSUM),
    reference evaluate_model semantics (scripts/04_train_fusion.py:108-157)."""
    rt_sel = rt.select_queries(list(qids))
    fused = combsum(rt_sel, weights=np.asarray(weights, np.float32).T)
    ev = IREvaluator([metric])
    return ev.evaluate(fused, qrels)[metric]


def train_fusion_models(
    rt: RunTensor,
    qpp_data: Dict[str, Dict[str, List[float]]],
    qrels: Dict[str, Dict[str, int]],
    model_types: Sequence[str] = ("per_retriever", "multioutput", "mlp"),
    train_ratio: Optional[float] = None,
    target_metric: str = "nDCG@10",
    output_dir: Optional[Path] = None,
    seed: int = 0,
) -> Dict[str, Dict]:
    """Full stage-04 run. Returns {model_type: {model, metrics...}} plus
    uniform/oracle baselines under key "_baselines"."""
    train_ratio = train_ratio if train_ratio is not None else config.training.train_ratio
    X, Y, quality, qids = build_training_data(rt, qpp_data, qrels, target_metric)
    n = len(qids)
    n_train = int(n * train_ratio)          # sequential split (:246-250)
    te = slice(n_train, n)
    test_qids = qids[n_train:]

    R = rt.R
    uniform_w = np.full((len(test_qids), R), 1.0 / R, dtype=np.float32)
    oracle_w = compute_targets(quality[:, n_train:])
    baselines = {
        "uniform": evaluate_weights(rt, test_qids, uniform_w, qrels, target_metric),
        "oracle": evaluate_weights(rt, test_qids, oracle_w, qrels, target_metric),
        "n_train": n_train,
        "n_test": len(test_qids),
    }

    # Early-stopping validation comes out of the TRAIN portion (last 20%);
    # the test slice is never seen before final evaluation. (The reference
    # validates on its test slice, scripts/04_train_fusion.py:252-260 — that
    # leaks model selection into the reported metric, so we deviate here.)
    if n_train < 1:
        raise ValueError(
            f"{n} queries with train_ratio={train_ratio} leaves no "
            "training queries; lower the ratio or add queries")
    n_val = max(int(n_train * 0.2), 1) if n_train >= 5 else 0
    fit = slice(0, n_train - n_val)
    # no val carve-out (tiny n): pass NO validation rather than aliasing
    # the fit slice — 'early stopping' on in-sample loss is silent
    # train-as-val model selection
    va = slice(n_train - n_val, n_train) if n_val else None

    results: Dict[str, Dict] = {"_baselines": baselines}
    for mtype in model_types:
        cls = get_model_class(mtype)
        model: BaseFusionModel = cls(rt.retrievers, seed=seed)
        train_info = model.train(
            X[fit], Y[fit],
            X[va] if va else None, Y[va] if va else None)
        W = model.predict(X[te])
        fused_metric = evaluate_weights(rt, test_qids, W, qrels, target_metric)
        results[mtype] = {
            "model": model,
            "train_info": train_info,
            f"fused_{target_metric}": fused_metric,
        }
        if output_dir is not None:
            path = Path(output_dir) / f"fusion_{mtype}.pkl"
            model.save(path)
            results[mtype]["path"] = str(path)
    return results
