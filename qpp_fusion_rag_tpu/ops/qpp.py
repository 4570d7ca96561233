"""QPP statistics as one fused device reduction: scores[Q, K] -> qpp[Q, 13].

Re-expresses the reference's JSON-over-stdio JVM bridge
(reference src/qpp/java/qpp/QPPBridge.java:134-453) as a single jitted,
vmappable kernel. Every formula reproduces the bridge's closed form exactly,
including its edge conditions (empty list -> 0, <2 scores -> 0 for
SigmaMax/SigmaX/dense-qpp, <3 -> 0 for RSD) and its avgIDF=1.0 convention.

The O(k^2) prefix statistics (SigmaMax over growing windows,
cumulative NQC over prefixes, QPPBridge.java:269-293/:400-410) are
reformulated with prefix sums of s and s^2 — O(k) and fully vectorized.

Output column order is the ``config.qpp.methods`` contract:
[nqc, smv, wig, SigmaMax, SigmaX, RSD, UEF, MaxIDF, avgidf, cumnqc, snqc,
 dense-qpp, dense-qpp-m].

Query-text statistics enter as a dense feature tensor built host-side by
:func:`text_features` (num_terms, num_unique, max_term_len, avg_term_len) —
the only part of a query the bridge ever inspects.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

N_METHODS = 13
DEFAULT_CUTOFF = 50  # QPPBridge.java:141 — k = min(50, |scores|)


# =============================================================================
# Host-side query text features (QPPBridge.java:247-262, :368-393)
# =============================================================================

def text_features(query_text: str) -> Tuple[float, float, float, float]:
    """(num_terms, num_unique, max_term_len, avg_term_len).

    Term split matches Java ``text.toLowerCase().split("\\\\s+")`` — an empty
    string yields one empty term (numTerms=1, maxLen=0, avgLen=0).
    """
    terms = query_text.lower().split()
    if not terms:
        terms = [""]
    unique = set(terms)
    num_terms = float(len(terms))
    num_unique = float(len(unique))
    max_len = float(max(len(t) for t in unique))
    avg_len = float(sum(len(t) for t in terms) / len(terms))
    return num_terms, num_unique, max_len, avg_len


def text_features_batch(query_texts: Sequence[str]) -> np.ndarray:
    return np.array([text_features(t) for t in query_texts], dtype=np.float32)


# =============================================================================
# Device kernel
# =============================================================================

@partial(jax.jit, static_argnames=("cutoff",))
def qpp_kernel(
    scores: jnp.ndarray,   # [Q, K] desc-sorted, padding value irrelevant (masked)
    n_valid: jnp.ndarray,  # [Q] int32 count of real scores
    text_feats: jnp.ndarray,  # [Q, 4] (num_terms, num_unique, max_len, avg_len)
    cutoff: int = DEFAULT_CUTOFF,
) -> jnp.ndarray:
    """-> qpp [Q, 13] raw (un-normalized) statistics."""
    Q, K = scores.shape
    s = scores.astype(jnp.float32)
    m = jnp.minimum(n_valid.astype(jnp.int32), cutoff)  # [Q] used count
    idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    mask = idx < m[:, None]                              # [Q, K]
    mf = mask.astype(jnp.float32)
    sm = jnp.where(mask, s, 0.0)
    mf_sum = jnp.maximum(m.astype(jnp.float32), 1.0)     # safe divisor

    num_terms = jnp.maximum(text_feats[:, 0], 1.0)
    num_unique = text_feats[:, 1]
    max_len = text_feats[:, 2]
    avg_len = text_feats[:, 3]

    mean = jnp.sum(sm, axis=1) / mf_sum
    var = jnp.sum(jnp.where(mask, (s - mean[:, None]) ** 2, 0.0), axis=1) / mf_sum
    std = jnp.sqrt(var)

    # 1. NQC — variance * avgIDF(=1) (QPPBridge.java:202-216)
    nqc = jnp.where(m > 0, var, 0.0)

    # 2. SMV — mean over k of s*|log(s/muHat)| for s>0 (:223-239)
    mu_hat = jnp.where(mean > 0, mean, 1.0)
    pos = mask & (s > 0)
    smv_terms = jnp.where(pos, s * jnp.abs(jnp.log(jnp.where(pos, s, 1.0) / mu_hat[:, None])), 0.0)
    smv = jnp.where(m > 0, jnp.sum(smv_terms, axis=1) / mf_sum, 0.0)

    # 3. WIG — sum(s - 1/max(0.01, mean)) / (numTerms * k) (:247-262)
    baseline = 1.0 / jnp.maximum(0.01, mean)
    wig_sum = jnp.sum(jnp.where(mask, s - baseline[:, None], 0.0), axis=1)
    wig = jnp.where(m > 0, wig_sum / (num_terms * mf_sum), 0.0)

    # Prefix sums for prefix-window statistics
    c1 = jnp.cumsum(sm, axis=1)            # sum of first j+1 scores
    c2 = jnp.cumsum(sm * sm, axis=1)
    j = (idx + 1).astype(jnp.float32)      # prefix length at position idx
    pref_mean = c1 / j
    pref_var = jnp.maximum(c2 / j - pref_mean**2, 0.0)
    pref_sigma = jnp.sqrt(pref_var)

    # 4. SigmaMax — max prefix std (prefix len >= 2, len <= m) / sqrt(numTerms) (:269-293)
    pref_ok = (idx >= 1) & mask
    sigma_max = jnp.max(jnp.where(pref_ok, pref_sigma, 0.0), axis=1)
    sigma_max = jnp.where(m >= 2, sigma_max / jnp.sqrt(jnp.maximum(1.0, num_terms)), 0.0)

    # 5. SigmaX — std of scores >= 0.5*top1; 0 unless >=2 qualify (:299-319)
    top1 = sm[:, 0]
    thresh = 0.5 * top1
    fsel = mask & (s >= thresh[:, None])
    fc = jnp.sum(fsel.astype(jnp.float32), axis=1)
    fmean = jnp.sum(jnp.where(fsel, s, 0.0), axis=1) / jnp.maximum(fc, 1.0)
    fvar = jnp.sum(jnp.where(fsel, (s - fmean[:, None]) ** 2, 0.0), axis=1) / jnp.maximum(fc, 1.0)
    sigma_x = jnp.where((m >= 2) & (fc >= 2), jnp.sqrt(fvar), 0.0)

    # 6. RSD — population skewness; 0 if m<3 or std<1e-10 (:324-342)
    z3 = jnp.where(mask, ((s - mean[:, None]) / jnp.maximum(std[:, None], 1e-30)) ** 3, 0.0)
    skew = jnp.sum(z3, axis=1) / mf_sum
    rsd = jnp.where((m >= 3) & (std >= 1e-10), skew, 0.0)

    # 7. UEF — DCG-weighted mean of top-min(20, m) scores (:349-363)
    k_uef = jnp.minimum(m, 20)
    uef_mask = idx < k_uef[:, None]
    w = 1.0 / (jnp.log(j + 1.0) / jnp.log(2.0))  # 1/log2(i+2), i 0-based
    uef_num = jnp.sum(jnp.where(uef_mask, s * w, 0.0), axis=1)
    uef_den = jnp.sum(jnp.where(uef_mask, w, 0.0), axis=1)
    uef = jnp.where(m > 0, uef_num / jnp.maximum(uef_den, 1e-30), 0.0)

    # 8. MaxIDF proxy — log(1+unique) + 0.5*log(1+maxTermLen) (:368-380)
    max_idf = jnp.log(1.0 + num_unique) + 0.5 * jnp.log(1.0 + max_len)
    max_idf = jnp.broadcast_to(max_idf, (Q,))

    # 9. avgidf proxy — log(1+avgTermLen) * (unique/terms) (:385-393)
    avgidf = jnp.log(1.0 + avg_len) * (num_unique / num_terms)

    # 10. cumnqc — mean over prefixes k=2..m of NQC(prefix k) (:400-410)
    cum_ok = (idx >= 1) & mask
    cumnqc_sum = jnp.sum(jnp.where(cum_ok, pref_var, 0.0), axis=1)
    cumnqc = jnp.where(m >= 2, cumnqc_sum / jnp.maximum(m.astype(jnp.float32) - 1.0, 1.0), 0.0)

    # 11. snqc — mean over k of (((s-mean)^2/s)^beta)^gamma for s>0, 0 if mean<=0 (:417-438)
    beta_gamma = 0.33 * 0.33
    f2 = jnp.where(pos, (s - mean[:, None]) ** 2 / jnp.where(pos, s, 1.0), 0.0)
    snqc_terms = jnp.where(pos, jnp.power(jnp.maximum(f2, 0.0), beta_gamma), 0.0)
    snqc = jnp.where((m > 0) & (mean > 0), jnp.sum(snqc_terms, axis=1) / mf_sum, 0.0)

    # 12/13. dense-qpp proxies — log(1 + 1/(max-min)), 0 if m<2 or range==0 (:444-453)
    smax = jnp.max(jnp.where(mask, s, -jnp.inf), axis=1)
    smin = jnp.min(jnp.where(mask, s, jnp.inf), axis=1)
    rng = smax - smin
    dense = jnp.where((m >= 2) & (rng > 0), jnp.log(1.0 + 1.0 / jnp.where(rng > 0, rng, 1.0)), 0.0)

    out = jnp.stack(
        [nqc, smv, wig, sigma_max, sigma_x, rsd, uef, max_idf, avgidf, cumnqc, snqc, dense, dense],
        axis=1,
    )
    return jnp.where((m > 0)[:, None], out, 0.0)


# =============================================================================
# Cross-query normalization (reference src/qpp.py:340-374)
# =============================================================================

@partial(jax.jit, static_argnames=("method",))
def normalize_qpp(qpp: jnp.ndarray, method: str = "minmax") -> jnp.ndarray:
    """Normalize each method column across queries. minmax: (v-min)/(max-min)
    (range 1.0 if degenerate -> column of zeros after shift); zscore:
    (v-mean)/std (std 1.0 if zero)."""
    if method == "minmax":
        vmin = jnp.min(qpp, axis=0, keepdims=True)
        vmax = jnp.max(qpp, axis=0, keepdims=True)
        scale = jnp.where(vmax > vmin, vmax - vmin, 1.0)
        return (qpp - vmin) / scale
    if method == "zscore":
        mean = jnp.mean(qpp, axis=0, keepdims=True)
        std = jnp.std(qpp, axis=0, keepdims=True)
        return (qpp - mean) / jnp.where(std > 0, std, 1.0)
    return qpp


def minmax_extrema(qpp: jnp.ndarray):
    """Per-(retriever, statistic) extrema over the query axis of
    [R, B, M] raw QPP -> (vmin [R, 1, M], vmax [R, 1, M]). The sharded
    serving path pmin/pmaxes these over the data mesh axis to recover
    whole-batch semantics."""
    return (jnp.min(qpp, axis=1, keepdims=True),
            jnp.max(qpp, axis=1, keepdims=True))


def apply_minmax(qpp: jnp.ndarray, vmin: jnp.ndarray, vmax: jnp.ndarray):
    """(v - min)/(max - min) per retriever × statistic (reference
    src/qpp.py:340-374 semantics); degenerate columns get 0.5 — all-zero
    weights would make every fused contribution vanish."""
    scale = jnp.where(vmax > vmin, vmax - vmin, 1.0)
    return jnp.where(vmax > vmin, (qpp - vmin) / scale, 0.5)


def qpp_calibration_stats(qpp_raw: jnp.ndarray) -> jnp.ndarray:
    """Freeze normalization statistics from a calibration batch of RAW
    (unnormalized) [R, B, M] QPP values -> stats [R, 2, M] (min, max).

    Serving batches normalized against frozen stats are batch-size
    INVARIANT and match the reference's whole-query-set normalization
    (src/qpp.py:340-374) when the calibration set is the query set —
    docs/qpp_norm_sensitivity.json quantifies the in-batch drift these
    stats eliminate."""
    vmin, vmax = minmax_extrema(qpp_raw)
    return jnp.stack([vmin[:, 0, :], vmax[:, 0, :]], axis=1)


def normalize_qpp_with(qpp_raw: jnp.ndarray, stats) -> jnp.ndarray:
    """Normalize raw [R, B, M] QPP: against frozen calibration `stats`
    [R, 2, M] when given (clipped to [0, 1] — unseen queries may exceed
    the calibration range), else in-batch min-max."""
    if stats is not None:
        vmin = stats[:, 0][:, None, :]
        vmax = stats[:, 1][:, None, :]
        return jnp.clip(apply_minmax(qpp_raw, vmin, vmax), 0.0, 1.0)
    vmin, vmax = minmax_extrema(qpp_raw)
    return apply_minmax(qpp_raw, vmin, vmax)


METHOD_NAMES: List[str] = [
    "nqc", "smv", "wig", "SigmaMax", "SigmaX", "RSD", "UEF",
    "MaxIDF", "avgidf", "cumnqc", "snqc", "dense-qpp", "dense-qpp-m",
]
