"""Stochastic QPP: predictor robustness under ranking perturbations.

Re-expresses the reference's stochastic_qpp package (reference
stochastic_qpp/RankSwapper.java — swap relevant/non-relevant docs to
generate permuted rankings; NoisePerturbationTieBreaker — ±δ score noise;
StochasticQPPEvaluation.java — correlation distribution over sampled
perturbations at several cutoffs) with vectorized numpy + fixed PRNG keys,
so every experiment is reproducible.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from qpp_fusion_rag_tpu.data.runtensor import RunTensor


def swap_rank_pairs(
    doc_ids: np.ndarray,     # [Q, K]
    scores: np.ndarray,      # [Q, K]
    rel_mask: np.ndarray,    # [Q, K] bool — doc at (q, k) is relevant
    swap_frac: float = 0.2,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """RankSwapper: for a fraction of (relevant, non-relevant) position
    pairs per query, swap the docs (scores keep their positions, so the
    score distribution is unchanged but the ranking degrades)."""
    rng = rng or np.random.default_rng(0)
    doc_ids = doc_ids.copy()
    Q, K = doc_ids.shape
    for qi in range(Q):
        rel_pos = np.flatnonzero(rel_mask[qi])
        non_pos = np.flatnonzero(~rel_mask[qi] & (doc_ids[qi] >= 0))
        n_swaps = int(round(swap_frac * min(len(rel_pos), len(non_pos))))
        if n_swaps == 0:
            continue
        a = rng.choice(rel_pos, n_swaps, replace=False)
        b = rng.choice(non_pos, n_swaps, replace=False)
        # only DEGRADING swaps (relevant doc moves down, RankSwapper
        # semantics); an a > b pair would *improve* the ranking
        keep = a < b
        a, b = a[keep], b[keep]
        doc_ids[qi, a], doc_ids[qi, b] = doc_ids[qi, b], doc_ids[qi, a].copy()
    return doc_ids, scores


def perturb_scores(
    scores: np.ndarray,
    delta: float = 0.05,
    rng: Optional[np.random.Generator] = None,
    resort: bool = True,
) -> np.ndarray:
    """NoisePerturbationTieBreaker: add uniform ±delta noise to scores
    (optionally re-sorting each row descending, which permutes near-ties)."""
    rng = rng or np.random.default_rng(0)
    noisy = scores + rng.uniform(-delta, delta, scores.shape).astype(scores.dtype)
    if resort:
        noisy = -np.sort(-noisy, axis=-1)
    return noisy


def _relevance_mask(rt: RunTensor, qrels: Dict[str, Dict[str, int]]) -> np.ndarray:
    """[R, Q, K] bool — doc at (r, q, k) is judged relevant for query q."""
    mask = np.zeros(rt.doc_ids.shape, bool)
    for qi, qid in enumerate(rt.qids):
        rel_ids = [
            rt.vocab.id_of(d) for d, rel in qrels.get(qid, {}).items()
            if rel > 0 and d in rt.vocab
        ]
        if rel_ids:
            mask[:, qi] = np.isin(rt.doc_ids[:, qi], rel_ids)
    return mask


def stochastic_qpp_evaluation(
    rt: RunTensor,
    qrels: Dict[str, Dict[str, int]],
    n_samples: int = 10,
    delta: float = 0.05,
    swap_frac: float = 0.2,
    cutoffs: Sequence[int] = (10, 20, 50),
    target_metric: str = "nDCG@10",
    correlation: str = "pearson",
    seed: int = 0,
    query_texts: Optional[Dict[str, str]] = None,
) -> Dict:
    """Correlation distribution of every QPP method under ranking + score
    perturbations × cutoffs -> {cutoff: {method: {mean, std, samples}}}.

    Reference semantics (StochasticQPPEvaluation.java): each sample perturbs
    the RANKINGS (RankSwapper relevant/non-relevant swaps + score noise),
    recomputes QPP, and RE-MEASURES predictor quality on the perturbed run;
    a robust predictor has low variance across samples. Each cutoff is
    seeded independently so cutoff results differ only by cutoff, not by
    noise realization; the host-side text features are hoisted out of the
    sample loop (they are perturbation-invariant).
    """
    from qpp_fusion_rag_tpu.config import config
    from qpp_fusion_rag_tpu.evaluation.ir_evaluator import per_query_metric
    from qpp_fusion_rag_tpu.ops import qpp as Q
    from qpp_fusion_rag_tpu.qpp.correlation import CORRELATION_METRICS
    from qpp_fusion_rag_tpu.qpp.engine import compute_qpp_for_runtensor

    corr_fn = CORRELATION_METRICS[correlation]
    method_names = list(config.qpp.methods)
    judged = np.array([q in qrels for q in rt.qids])
    rel_mask = _relevance_mask(rt, qrels)
    texts = query_texts or {}
    feats = Q.text_features_batch([texts.get(q, q) for q in rt.qids])

    out: Dict = {}
    for cutoff in cutoffs:
        # SAME seed for every cutoff: results across cutoffs must differ
        # only by the cutoff, not by the perturbation draws (the
        # documented invariant)
        rng = np.random.default_rng(seed)
        per_method: Dict[str, list] = {m: [] for m in method_names}
        for _s in range(n_samples):
            swapped = np.stack([
                swap_rank_pairs(rt.doc_ids[r], rt.scores[r], rel_mask[r],
                                swap_frac=swap_frac, rng=rng)[0]
                for r in range(rt.R)
            ])
            noisy = perturb_scores(rt.scores, delta=delta, rng=rng)
            rt_s = RunTensor(swapped, noisy.astype(np.float32), rt.qids,
                             rt.retrievers, rt.vocab)
            quality_s = per_query_metric(rt_s, qrels, metric=target_metric)
            qpp = compute_qpp_for_runtensor(rt_s, features=feats, cutoff=cutoff)
            for mi, mname in enumerate(method_names):
                cs = [
                    corr_fn(qpp[r, judged, mi], quality_s[r][judged])
                    for r in range(rt.R)
                ]
                per_method[mname].append(float(np.mean(cs)))
        out[cutoff] = {
            m: {
                "mean": float(np.mean(v)),
                "std": float(np.std(v)),
                "samples": v,
            }
            for m, v in per_method.items()
        }
    return out


def attribute_swap_permutations(
    doc_ids: np.ndarray,        # [K] one query's ranked docs
    attr_mask: np.ndarray,      # [K] bool — protected-attribute group A at rank k
    known_mask: Optional[np.ndarray] = None,   # [K] bool — attribute known
    max_perms: Optional[int] = None,
) -> np.ndarray:
    """AttributeValueBasedSwapper (reference stochastic_qpp/
    AttributeValueBasedSwapper.java:21-53): one permutation per
    (group-A, group-B) position pair where the group-A doc ranks BELOW
    the group-B doc, each permutation swapping exactly that pair; the
    identity permutation comes first. Docs with unknown attribute are
    skipped (the reference's null metadata check).

    -> [n_perms, K] permuted doc-id rows (row 0 = identity).
    """
    doc_ids = np.asarray(doc_ids)
    attr_mask = np.asarray(attr_mask, dtype=bool)
    known = (np.asarray(known_mask, dtype=bool)
             if known_mask is not None else np.ones_like(attr_mask))
    valid = known & (doc_ids >= 0)
    a_pos = np.flatnonzero(valid & attr_mask)
    b_pos = np.flatnonzero(valid & ~attr_mask)
    perms = [doc_ids.copy()]
    for ra in a_pos:
        for rb in b_pos:
            if ra > rb:
                row = doc_ids.copy()
                row[ra], row[rb] = row[rb], row[ra]
                perms.append(row)
                if max_perms and len(perms) > max_perms:
                    return np.stack(perms[: max_perms + 1])
    return np.stack(perms)
