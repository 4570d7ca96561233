"""Sampled RSD / UEF predictor variants (deterministic keys).

The reference's index-aware RSD and UEF wrap a base predictor with
document sampling (reference qpp/RSDSpecificity.java:18-52 — 10 shuffled
top-doc samples, RBO(full, sample)-weighted dispersion of the base QPP;
qpp/UEFSpecificity.java:24-65 — 10 samples, relevance-model rerank, UEF =
(N / avgRankDist) · baseQPP). The bridge the reference actually invokes
uses closed forms (implemented in ops.qpp for parity); these sampled
variants are provided as options with fixed seeds per SURVEY §7
("deterministic sampling QPP variants").
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from qpp_fusion_rag_tpu.qpp.correlation import rank_distance, rbo


def _base_nqc(scores: np.ndarray) -> float:
    s = np.asarray(scores, np.float64)
    return float(np.var(s)) if len(s) else 0.0


def sampled_rsd(
    scores: np.ndarray,            # per-query desc-sorted score list
    n_samples: int = 10,
    sample_frac: float = 0.67,
    base_qpp: Callable[[np.ndarray], float] = _base_nqc,
    seed: int = 0,
) -> float:
    """RBO-weighted dispersion of the base QPP over shuffled sub-samples.

    RSD intuition: a robust (easy) query keeps a similar base-QPP value on
    sub-sampled rankings; dispersion (weighted std / weighted mean) is the
    predictor (reference RSDSpecificity semantics, closed over score lists
    instead of Lucene TopDocs).
    """
    s = np.asarray(scores, np.float64)
    n = len(s)
    if n < 3:
        return 0.0
    rng = np.random.default_rng(seed)
    m = max(int(round(sample_frac * n)), 2)
    full = list(range(n))
    vals, weights = [], []
    for _ in range(n_samples):
        idx = np.sort(rng.choice(n, size=m, replace=False))
        sample_ranking = [int(i) for i in np.argsort(-s[idx])]
        w = rbo(full[:m], [int(idx[i]) for i in sample_ranking])
        vals.append(base_qpp(np.sort(s[idx])[::-1]))
        weights.append(max(w, 1e-6))
    vals = np.asarray(vals)
    weights = np.asarray(weights)
    weights = weights / weights.sum()
    mean = float(np.sum(weights * vals))
    var = float(np.sum(weights * (vals - mean) ** 2))
    return float(np.sqrt(var) / mean) if mean > 0 else 0.0


def sampled_uef(
    scores: np.ndarray,
    n_samples: int = 10,
    delta: float = 0.05,
    base_qpp: Callable[[np.ndarray], float] = _base_nqc,
    seed: int = 0,
) -> float:
    """UEF = baseQPP / (1 + avg rank distance under perturbation-rerank).

    The reference reranks samples with a relevance model and measures rank
    distance to the original (UEFSpecificity.java:24-65); without an index
    the rerank is modeled as score perturbation — a stable ranking (low
    rank distance) keeps the base predictor's value, an unstable one
    attenuates it. rank_distance is already length-normalized, so no
    additional N scaling applies.
    """
    s = np.asarray(scores, np.float64)
    n = len(s)
    if n < 2:
        return 0.0
    rng = np.random.default_rng(seed)
    full = list(range(n))
    dists = []
    for _ in range(n_samples):
        noisy = s + rng.uniform(-delta, delta, n) * max(s.std(), 1e-9)
        reranked = [int(i) for i in np.argsort(-noisy)]
        dists.append(rank_distance(full, reranked))
    avg_dist = float(np.mean(dists))
    return float(base_qpp(s) / (1.0 + avg_dist))


def odds_ratio(
    scores: np.ndarray,
    p: float = 0.2,
    max_idf: float = 1.0,
) -> float:
    """OddsRatio QPP: mean(top-p scores) / mean(bottom-p scores) · maxIDF
    (reference qpp/OddsRatioSpecificity.java:1-27 — without an index
    maxIDF defaults to 1, matching the bridge's convention)."""
    s = np.sort(np.asarray(scores, np.float64))[::-1]
    n = len(s)
    if n < 2:
        return 0.0
    m = max(int(round(p * n)), 1)
    top = float(np.mean(s[:m]))
    bottom = float(np.mean(s[-m:]))
    if bottom == 0:
        return 0.0
    return top / bottom * max_idf
