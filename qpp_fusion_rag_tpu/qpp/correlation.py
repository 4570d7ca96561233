"""QPP correlation metrics: how well predictors track true performance.

Re-expresses the reference's correlation package (reference
src/qpp/java/org/correlation/*: Pearson/Spearman/Kendall/RMSE, SARE —
scaled absolute rank error, PairwiseAccuracyMetric — concordant-pair
accuracy, quantized-class agreement, and OverlapStats' RBO + rank distance,
the primitive inside the sampled RSD/UEF variants) as vectorized numpy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np


def _rankdata(x: np.ndarray) -> np.ndarray:
    """Average-rank tie handling (scipy.stats.rankdata semantics)."""
    x = np.asarray(x, dtype=np.float64)
    order = np.argsort(x, kind="stable")
    ranks = np.empty(len(x))
    sx = x[order]
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def pearson(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if len(a) < 2 or a.std() == 0 or b.std() == 0:
        return 0.0
    return float(np.corrcoef(a, b)[0, 1])


def spearman(a, b) -> float:
    return pearson(_rankdata(a), _rankdata(b))


def kendall(a, b) -> float:
    """Kendall tau-b (tie-corrected), O(n^2) pair scan."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    n = len(a)
    if n < 2:
        return 0.0
    da = np.sign(a[:, None] - a[None, :])
    db = np.sign(b[:, None] - b[None, :])
    iu = np.triu_indices(n, 1)
    da, db = da[iu], db[iu]
    conc = float(np.sum(da * db > 0))
    disc = float(np.sum(da * db < 0))
    ties_a = float(np.sum((da == 0) & (db != 0)))
    ties_b = float(np.sum((db == 0) & (da != 0)))
    denom = np.sqrt((conc + disc + ties_a) * (conc + disc + ties_b))
    return float((conc - disc) / denom) if denom > 0 else 0.0


def rmse(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def pairwise_accuracy(pred, true) -> float:
    """Fraction of query pairs ordered concordantly (reference
    PairwiseAccuracyMetric)."""
    pred = np.asarray(pred, np.float64)
    true = np.asarray(true, np.float64)
    n = len(pred)
    if n < 2:
        return 0.0
    dp = np.sign(pred[:, None] - pred[None, :])
    dt = np.sign(true[:, None] - true[None, :])
    iu = np.triu_indices(n, 1)
    dp, dt = dp[iu], dt[iu]
    valid = dt != 0
    if not valid.any():
        return 0.0
    return float(np.mean(dp[valid] == dt[valid]))


def sare(pred, true) -> np.ndarray:
    """Scaled Absolute Rank Error per query (reference SARE.java):
    |rank_pred(q) - rank_true(q)| / n. Lower is better."""
    pred = np.asarray(pred, np.float64)
    true = np.asarray(true, np.float64)
    n = len(pred)
    rp = _rankdata(-pred)
    rt = _rankdata(-true)
    return np.abs(rp - rt) / max(n, 1)


def smare(pred, true) -> float:
    """Mean SARE (scaled mean absolute rank error)."""
    return float(np.mean(sare(pred, true))) if len(pred) else 0.0


def quantized_class_accuracy(pred, true, n_classes: int = 4) -> float:
    """Agreement after quantile-bucketing both sequences into n classes
    (reference QuantizedClassAccuracy)."""
    pred = np.asarray(pred, np.float64)
    true = np.asarray(true, np.float64)
    if len(pred) == 0:
        return 0.0

    def bucket(x):
        qs = np.quantile(x, np.linspace(0, 1, n_classes + 1)[1:-1])
        return np.searchsorted(qs, x, side="right")

    return float(np.mean(bucket(pred) == bucket(true)))


def _quantize_unit(x: np.ndarray, n_intervals: int) -> np.ndarray:
    """Min-max normalize to [0, 1] and quantize into n intervals
    (reference QuantizedSimCorrelation.quantizeInUnitInterval)."""
    x = np.asarray(x, np.float64)
    lo, hi = x.min(), x.max()
    unit = (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)
    return (unit / (1.0 / n_intervals)).astype(int)


def quantized_sim(pred, true, n_intervals: int = 5) -> float:
    """1 − normalized L1 distance of the quantized unit-interval bins
    (reference QuantizedSimCorrelation.correlation, 'qsim')."""
    pred, true = np.asarray(pred), np.asarray(true)
    if len(pred) == 0:
        return 0.0
    qa = _quantize_unit(pred, n_intervals)
    qb = _quantize_unit(true, n_intervals)
    max_dist = n_intervals * len(qa)
    return float(1.0 - np.abs(qa - qb).sum() / max_dist)


def quantized_strict_match(pred, true, n_intervals: int = 5) -> float:
    """Fraction of positions whose quantized bins match exactly
    (reference QuantizedStrictMatchCorrelation, 'qsim_strict')."""
    pred, true = np.asarray(pred), np.asarray(true)
    if len(pred) == 0:
        return 0.0
    return float(np.mean(
        _quantize_unit(pred, n_intervals) == _quantize_unit(true, n_intervals)
    ))


def ndcg_correlation(pred, true, exp_scaling: bool = True) -> float:
    """NDCG of the predictor-induced ordering with the true values as
    gains (reference NDCGCorrelation.computeNDCG)."""
    pred = np.asarray(pred, np.float64)
    true = np.asarray(true, np.float64)
    if len(pred) == 0:
        return 0.0
    gain = (np.power(2.0, true) - 1.0) if exp_scaling else true
    disc = 1.0 / np.log2(np.arange(2, len(pred) + 2))
    dcg = float(gain[np.argsort(-pred, kind="stable")] @ disc)
    idcg = float(gain[np.argsort(-true, kind="stable")] @ disc)
    return dcg / idcg if idcg != 0 else 0.0


# =============================================================================
# Ranked-list overlap primitives (reference OverlapStats)
# =============================================================================

def rbo(list_a: Sequence, list_b: Sequence, p: float = 0.9) -> float:
    """Rank-Biased Overlap (extrapolated) between two ranked lists."""
    a, b = list(list_a), list(list_b)
    if not a or not b:
        return 0.0
    k = min(len(a), len(b))
    seen_a, seen_b = set(), set()
    overlap = 0
    s = 0.0
    for d in range(1, k + 1):
        seen_a.add(a[d - 1])
        seen_b.add(b[d - 1])
        overlap = len(seen_a & seen_b)
        s += (p ** (d - 1)) * overlap / d
    agreement_k = overlap / k
    return float((1 - p) * s + agreement_k * (p ** k))


def rank_distance(list_a: Sequence, list_b: Sequence) -> float:
    """Mean absolute rank displacement of shared items (reference
    OverlapStats rank-dist, used by UEF); items missing from one list get
    the max displacement len(list)."""
    pos_b = {d: i for i, d in enumerate(list_b)}
    n = max(len(list_a), 1)
    total = 0.0
    for i, d in enumerate(list_a):
        total += abs(i - pos_b[d]) if d in pos_b else float(len(list_b) or n)
    return total / n


# =============================================================================
# Utility classes of the reference correlation/ package
# =============================================================================

def polyfit_predict(x: Sequence, y: Sequence, degree: int = 2,
                    at: Optional[Sequence] = None) -> np.ndarray:
    """Least-squares polynomial fit + evaluation (reference
    correlation/PolynomialRegression.java: commons-math
    PolynomialCurveFitter.create(degree) over observed (x, y) points).
    Returns the coefficients (ascending order, commons-math convention)
    when `at` is None, else the fitted polynomial evaluated at `at`."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    coeff = np.polynomial.polynomial.polyfit(x, y, degree)
    if at is None:
        return coeff
    return np.polynomial.polynomial.polyval(np.asarray(at, np.float64), coeff)


@dataclass
class RankScore:
    """(id, rank, score) tuple ordered by score (reference
    correlation/RankScore.java — the sortable carrier inside the
    quantized/pairwise metrics)."""
    id: int
    rank: int
    score: float

    def __lt__(self, other: "RankScore") -> bool:
        return self.score < other.score

    def __str__(self) -> str:
        return f"({self.id}-> {self.rank}, {self.score})"


def cross_product(groups: Dict[float, Sequence[int]]) -> List[List[int]]:
    """Cartesian product over a {key: candidate-ids} map (reference
    correlation/CrossProduct.java: enumerate every way of picking one id
    per tied score group — used to enumerate tie-break permutations).
    Key order follows dict insertion order."""
    result: List[List[int]] = [[]]
    for key in groups:
        result = [tup + [v] for tup in result for v in groups[key]]
    return result


# Metrics where LOWER means a better predictor (errors, not correlations).
LOWER_IS_BETTER = frozenset({"rmse", "smare"})

CORRELATION_METRICS = {
    "pearson": pearson,
    "spearman": spearman,
    "kendall": kendall,
    "rmse": rmse,
    "pairwise_accuracy": pairwise_accuracy,
    "smare": smare,
    "quantized_accuracy": quantized_class_accuracy,
    "qsim": quantized_sim,
    "qsim_strict": quantized_strict_match,
    "ndcg": ndcg_correlation,
}


def evaluate_correlations(
    pred: np.ndarray, true: np.ndarray, metrics: Sequence[str] = ("pearson", "spearman", "kendall")
) -> Dict[str, float]:
    return {m: CORRELATION_METRICS[m](pred, true) for m in metrics}
