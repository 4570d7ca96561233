"""Precision-heavy stochastic QPP evaluation.

Port of the reference workflow experiments/QPPPrecHeavyEvaluator.java
(:26-97): the QPP estimates stay FIXED while the per-query target-metric
values are resampled NUM_RANKINGS times under a stochastic tie-breaker
(±delta noise by default) — measuring how stable a predictor's measured
quality (Kendall tau, nDCG-of-ranking correlation, SARE) is to metric
ties rather than to ranking perturbations (the complementary axis to
qpp.stochastic, which perturbs the rankings themselves).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from qpp_fusion_rag_tpu.qpp.correlation import (
    kendall,
    ndcg_correlation,
    sare,
)


def _noise_matrix(values: np.ndarray, n_rankings: int, delta: float,
                  rng: np.random.Generator) -> np.ndarray:
    """[n_rankings, Q] resampled metric values (reference
    NoisePerturbationTieBreaker.transform: each row = values ± U(0, delta),
    clipped to [0, 1])."""
    noise = rng.uniform(-delta, delta, (n_rankings, len(values)))
    return np.clip(values[None, :] + noise, 0.0, 1.0)


def prec_heavy_evaluation(
    qpp_estimates: np.ndarray,     # [Q] fixed predictor outputs
    metric_values: np.ndarray,     # [Q] per-query target metric (e.g. P@k)
    n_rankings: int = 500,
    delta: float = 0.05,
    seed: int = 0,
    metric_matrix: Optional[np.ndarray] = None,  # [n, Q] override rows
) -> Dict:
    """-> {tau_mean, ndcg_mean, mean_sare [Q], samples: [(tau, ndcg)]}.

    Defaults mirror the reference constants DELTA=0.05, NUM_RANKINGS=500
    (QPPPrecHeavyEvaluator.java:27-28); pass `metric_matrix` to plug a
    different tie-breaker's transform (e.g. sampled tie permutations).
    """
    qpp_estimates = np.asarray(qpp_estimates, dtype=np.float64)
    metric_values = np.asarray(metric_values, dtype=np.float64)
    if metric_matrix is None:
        rng = np.random.default_rng(seed)
        metric_matrix = _noise_matrix(metric_values, n_rankings, delta, rng)

    taus, ndcgs = [], []
    sare_sum = np.zeros(len(metric_values))
    for row in metric_matrix:
        taus.append(kendall(qpp_estimates, row))
        ndcgs.append(ndcg_correlation(qpp_estimates, row))
        sare_sum += sare(qpp_estimates, row)
    n = len(metric_matrix)
    return {
        "tau_mean": float(np.mean(taus)),
        "tau_std": float(np.std(taus)),
        "ndcg_mean": float(np.mean(ndcgs)),
        "ndcg_std": float(np.std(ndcgs)),
        "mean_sare": (sare_sum / max(n, 1)).tolist(),
        "samples": list(zip(map(float, taus), map(float, ndcgs))),
    }


def prec_heavy_report(
    per_method_estimates: Dict[str, np.ndarray],
    metric_values: np.ndarray,
    out_path=None,
    **kwargs,
) -> Dict[str, Dict]:
    """Run prec_heavy_evaluation per QPP method; optionally write the
    reference's `<method>.tsv`-style rows (tau \\t ndcg per sample) into
    one TSV keyed by method (QPPPrecHeavyEvaluator.java:67-73)."""
    out = {m: prec_heavy_evaluation(est, metric_values, **kwargs)
           for m, est in per_method_estimates.items()}
    if out_path is not None:
        with open(out_path, "w") as f:
            f.write("method\ttau\tndcg\n")
            for m, bundle in out.items():
                for tau, nd in bundle["samples"]:
                    f.write(f"{m}\t{tau:.4f}\t{nd:.4f}\n")
    return out
