"""Experiments layer: .properties registries + train/test grid workflows.

Re-expresses the reference's experiments package drivers:

* :class:`SettingsRegistry` — the `.properties` -> registry pattern of
  reference experiments/SettingsLoader.java:10-86 (correlation-metric and
  QPP-method registries keyed by short names, plus the retrieve/qpp
  numeric settings).
* :func:`train_test_grid` — the TRECDL train/test hyperparameter grid of
  reference experiments/TRECDLQPPEvaluator.java:86-150: grid over
  (num_variants, lambda) for the KNN-variant-smoothed predictor on a
  train split (selection by Kendall's tau), apply the best setting to the
  test split, report tau + sMARE.
* :class:`PreComputedPredictor` — qpp/PreComputedPredictor.java:17-67:
  per-query scores loaded from a whitespace `qid score` file; unknown
  qids predict 0.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from qpp_fusion_rag_tpu.qpp import correlation as C
from qpp_fusion_rag_tpu.qpp.variants import query_knn, variant_qpp


# =============================================================================
# .properties registries (SettingsLoader.java)
# =============================================================================

def load_properties(path) -> Dict[str, str]:
    """Minimal Java .properties parser: `key=value` / `key: value` lines,
    `#`/`!` comments, trailing-backslash continuations."""
    props: Dict[str, str] = {}
    pending = ""
    for raw in Path(path).read_text().splitlines():
        line = pending + raw.strip()
        pending = ""
        if not line or line[0] in "#!":
            continue
        if line.endswith("\\"):
            pending = line[:-1]
            continue
        # Java Properties: the FIRST separator in scan order wins
        # ('=' before ':' by position, not by preference — a value like
        # 'jdbc:mysql://h/db?x=1' must not split at its '=')
        pos = [p for p in (line.find("="), line.find(":")) if p >= 0]
        if pos:
            cut = min(pos)
            props[line[:cut].strip()] = line[cut + 1:].strip()
        else:
            props[line.strip()] = ""
    return props


class SettingsRegistry:
    """Short-name registries for correlation metrics and QPP methods,
    configured from a properties mapping (reference SettingsLoader)."""

    #: name -> callable(pred, truth) -> float
    CORRELATIONS: Dict[str, Callable] = {
        "r": C.pearson,
        "rho": C.spearman,
        "tau": C.kendall,
        "pairacc": C.pairwise_accuracy,
        "sare": C.smare,
    }

    def __init__(self, props: Optional[Dict[str, str]] = None):
        self.props = dict(props or {})
        n_int = int(self.props.get("qsim.numintervals", "5"))
        self._corr = dict(self.CORRELATIONS)
        self._corr["qsim"] = partial(C.quantized_sim, n_intervals=n_int)
        self._corr["qsim_strict"] = partial(
            C.quantized_strict_match, n_intervals=n_int)
        self._corr["ndcg"] = C.ndcg_correlation

    @classmethod
    def from_properties(cls, path) -> "SettingsRegistry":
        return cls(load_properties(path))

    # -- numeric settings (SettingsLoader getters) ---------------------
    @property
    def num_wanted(self) -> int:
        return int(self.props.get("retrieve.num_wanted", "1000"))

    @property
    def qpp_top_k(self) -> int:
        return int(self.props.get("qpp.numtopdocs", "50"))

    # -- registries ----------------------------------------------------
    def correlation_metric(self, name: Optional[str] = None) -> Callable:
        key = name or self.props.get("qpp.metric", "tau")
        if key not in self._corr:
            raise KeyError(f"unknown correlation metric '{key}' "
                           f"(have {sorted(self._corr)})")
        return self._corr[key]

    def qpp_method(self, name: Optional[str] = None) -> Callable:
        """-> callable(scores [Q, K], n_valid [Q], text_feats [Q, 4]) -> [Q].

        Names are the 13 kernel columns (config.qpp.methods contract,
        ops.qpp.METHOD_NAMES) — e.g. 'nqc', 'avgidf', 'UEF'."""
        from qpp_fusion_rag_tpu.ops import qpp as Q

        key = name or self.props.get("qpp.method", "nqc")
        lower = [m.lower() for m in Q.METHOD_NAMES]
        if key.lower() not in lower:
            raise KeyError(f"unknown QPP method '{key}' (have {Q.METHOD_NAMES})")
        col = lower.index(key.lower())
        cutoff = self.qpp_top_k

        def predict(scores, n_valid, text_feats):
            out = Q.qpp_kernel(
                np.asarray(scores, np.float32),
                np.asarray(n_valid, np.int32),
                np.asarray(text_feats, np.float32),
                cutoff=cutoff,
            )
            return np.asarray(out)[:, col]

        return predict


# =============================================================================
# PreComputedPredictor (qpp/PreComputedPredictor.java)
# =============================================================================

class PreComputedPredictor:
    """Per-query QPP scores from a `qid score` whitespace file; missing
    qids predict 0 (reference computeSpecificity, java:59-66)."""

    def __init__(self, name: str, k: int = 50):
        self.name = name
        self.k = int(k)
        self.qpp_map: Dict[str, float] = {}

    def set_data_source(self, path) -> None:
        path = Path(path)
        if not path.exists():
            return
        for line in path.read_text().splitlines():
            tokens = line.split()
            if len(tokens) >= 2:
                self.qpp_map[tokens[0]] = float(tokens[1])

    def compute(self, qid: str) -> float:
        return self.qpp_map.get(str(qid), 0.0)

    def compute_batch(self, qids: Sequence[str]) -> np.ndarray:
        return np.array([self.compute(q) for q in qids], dtype=np.float32)

    def __str__(self) -> str:  # reference name(): "<name>@k<k>"
        return f"{self.name}@k{self.k}"


# =============================================================================
# TRECDL-style train/test grid (TRECDLQPPEvaluator.java)
# =============================================================================

def train_test_grid(
    base_train: np.ndarray,     # [Qtr] base predictor on train queries
    truth_train: np.ndarray,    # [Qtr] target metric (e.g. AP/nDCG) per query
    emb_train: np.ndarray,      # [Qtr, D] train query embeddings (KNN space)
    base_test: np.ndarray,
    truth_test: np.ndarray,
    emb_test: np.ndarray,
    max_variants: int = 5,
    lambdas: Optional[Sequence[float]] = None,
    select_metric: Callable = C.kendall,
) -> Dict:
    """Grid-search (num_variants, lambda) for KNN-variant smoothing on the
    train split, apply the argmax to the test split.

    Mirrors TRECDLQPPEvaluator.trainAndTest: selection by Kendall's tau
    (``select_metric``), reporting tau + sMARE on test. ``lambdas`` are
    BASE weights (variant_qpp's convention: lam·base + (1−lam)·variants);
    the reference's VariantSpecificity weights the VARIANT part
    (java:66-68: λ·variant + (1−λ)·base) and its grid passes λ = l/2 for
    l in 0..1 step .2 — the equivalent default base-weight grid is
    therefore [1.0, 0.9, 0.8, 0.7, 0.6, 0.5].
    """
    if lambdas is None:
        lambdas = [1.0 - l / 2 for l in np.arange(0.0, 1.0001, 0.2)]

    # precompute the largest-k neighbor lists once per split, slice down
    sims_tr, idx_tr = query_knn(emb_train, k=max_variants)
    sims_te, idx_te = query_knn(emb_test, k=max_variants)

    return grid_search_variants(
        lambda nv, lam: variant_qpp(base_train, idx_tr[:, :nv],
                                    sims_tr[:, :nv], lam=lam),
        lambda nv, lam: variant_qpp(base_test, idx_te[:, :nv],
                                    sims_te[:, :nv], lam=lam),
        truth_train, truth_test, max_variants, lambdas, select_metric)


def grid_search_variants(
    predict_train: Callable,   # (num_variants, lam) -> pred [Qtr]
    predict_test: Callable,    # (num_variants, lam) -> pred [Qte]
    truth_train: np.ndarray,
    truth_test: np.ndarray,
    max_variants: int,
    lambdas: Sequence[float],
    select_metric: Callable = C.kendall,
) -> Dict:
    """Shared (num_variants, lambda) grid scaffold for the variant-QPP
    workflows (KNN variants here; generated variants in qpp.gen_variants):
    argmax `select_metric` on train, apply on test, report tau + sMARE.
    One implementation — the two workflows must not drift."""
    best = {"tau": -np.inf, "lambda": None, "num_variants": None}
    grid = []
    for nv in range(1, max_variants + 1):
        for lam in lambdas:
            tau = float(select_metric(predict_train(nv, lam), truth_train))
            grid.append({"num_variants": nv, "lambda": float(lam),
                         "train_tau": tau})
            if tau > best["tau"]:
                best = {"tau": tau, "lambda": float(lam), "num_variants": nv}

    pred_test = predict_test(best["num_variants"], best["lambda"])
    return {
        "best": best,
        "test": {
            "tau": float(C.kendall(pred_test, truth_test)),
            "smare": float(C.smare(pred_test, truth_test)),
        },
        "grid": grid,
    }
