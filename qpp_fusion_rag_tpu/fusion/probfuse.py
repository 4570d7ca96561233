"""ProbFuse: segment-probability fusion (Lillis et al. 2006).

Reference ProbFuse.py:33-160 — split each ranker's top-L into x equal
segments; on a training split estimate P(rel | segment, ranker) either over
judged docs only ("judged") or over all docs ("all"); fuse test runs by
summing each doc's segment probabilities across rankers. Here the
probability tables are estimated with vectorized tensor ops over the
RunTensor + aligned relevance gains, and fusion reuses the shared
segmented-aggregation kernel.
"""

from __future__ import annotations

from typing import Dict, Literal, Sequence

import numpy as np

from qpp_fusion_rag_tpu.data.runtensor import RunTensor
from qpp_fusion_rag_tpu.ops.metrics import align_relevance


def _segment_index(K: int, x: int) -> np.ndarray:
    """rank position (0-based) -> segment id 0..x-1.

    Matches the reference's ceil(pos*x/L) on 1-based positions
    (ProbFuse.py:33-42): seg = ceil((i+1)*x/K) - 1. Identical to the
    floor formula when K % x == 0, but boundary ranks differ otherwise.
    """
    seg = -(-(np.arange(K) + 1) * x // K) - 1
    return np.minimum(np.maximum(seg, 0), x - 1)


class ProbFuse:
    def __init__(self, x: int = 25, depth: int = 100,
                 variant: Literal["judged", "all"] = "judged"):
        self.x = x
        self.depth = depth
        self.variant = variant
        self.probs: Dict[str, np.ndarray] = {}   # ranker -> [x] P(rel | seg)

    # -- training ------------------------------------------------------
    def train(self, rt: RunTensor, qrels: Dict[str, Dict[str, int]]) -> Dict[str, np.ndarray]:
        """Estimate per-ranker segment probabilities on the given queries."""
        K = min(self.depth, rt.K)
        seg = _segment_index(K, self.x)                     # [K]
        judged_q = np.array([q in qrels for q in rt.qids])
        # judged-doc mask: retrieved doc has ANY judgment (rel or explicit
        # non-rel) in qrels — the denominator of the "judged" variant.
        # drop docs absent from the run vocab (id_of -> -1): -1 is ALSO
        # the pad sentinel in doc_ids, so keeping it would count every
        # pad slot as "judged" and deflate P(rel|segment)
        judged_ids = {
            qi: {rt.vocab.id_of(d) for d in qrels[q]} - {-1}
            for qi, q in enumerate(rt.qids) if q in qrels
        }
        for r, name in enumerate(rt.retrievers):
            gains, _n_rel, _ideal = align_relevance(
                rt.doc_ids[r][:, :K], rt.qids, qrels, rt.vocab
            )
            rel = gains[judged_q] > 0                        # [Qj, K]
            doc_ids = rt.doc_ids[r][judged_q, :K]
            valid = doc_ids >= 0
            judged_mask = np.zeros_like(valid)
            for row, qi in enumerate(np.flatnonzero(judged_q)):
                ids = judged_ids.get(int(qi), set())
                judged_mask[row] = np.isin(doc_ids[row], list(ids))
            judged_mask &= valid
            p = np.zeros(self.x, dtype=np.float64)
            for s in range(self.x):
                cols = seg == s
                if self.variant == "judged":
                    # P = rel / judged-in-segment (unjudged docs excluded,
                    # reference "judged" variant)
                    denom = judged_mask[:, cols].sum()
                else:
                    # "all": every retrieved doc counts in the denominator
                    denom = valid[:, cols].sum()
                num = rel[:, cols].sum()
                p[s] = num / denom if denom > 0 else 0.0
            self.probs[name] = p
        return self.probs

    # -- fusion --------------------------------------------------------
    def fuse(self, rt: RunTensor, k_out: int = 100, name: str = "probfuse") -> RunTensor:
        """Fused score(d) = sum_r P_r(rel | segment of d in r's list) / k
        where k is the 1-based segment number — the Lillis et al. rank
        discount (reference ProbFuse.py:179, contribution = prob / float(k))."""
        if not self.probs:
            raise RuntimeError("ProbFuse.train() first")
        from qpp_fusion_rag_tpu.ops import fusion as F

        K = min(self.depth, rt.K)
        seg = _segment_index(K, self.x)
        # per-(retriever, rank) contribution = P(rel | seg) / (seg+1) —
        # constant over queries, so feed it as the "scores" tensor with
        # uniform weights.
        contrib = np.zeros((rt.R, rt.Q, K), dtype=np.float32)
        discount = (seg + 1).astype(np.float64)
        for r, rname in enumerate(rt.retrievers):
            contrib[r, :, :] = (self.probs[rname][seg] / discount)[None, :]
        valid = rt.doc_ids[:, :, :K] >= 0
        contrib = np.where(valid, contrib, -np.inf).astype(np.float32)

        ids, scores = F.fuse(
            rt.doc_ids[:, :, :K], contrib,
            weights=np.ones((rt.R, rt.Q), np.float32),
            method="combsum", minmax_norm=False,
            k_out=min(k_out, rt.R * K),
        )
        return RunTensor(
            np.asarray(ids)[None], np.asarray(scores)[None],
            rt.qids, [name], rt.vocab,
        )


def probfuse_experiment(
    rt: RunTensor,
    qrels: Dict[str, Dict[str, int]],
    train_qids: Sequence[str],
    test_qids: Sequence[str],
    x: int = 25,
    depth: int = 100,
    variant: str = "judged",
    metric: str = "nDCG@10",
) -> Dict:
    """Train on train_qids, fuse+evaluate on test_qids (reference flow)."""
    from qpp_fusion_rag_tpu.evaluation.ir_evaluator import IREvaluator

    pf = ProbFuse(x=x, depth=depth, variant=variant)  # type: ignore[arg-type]
    pf.train(rt.select_queries(list(train_qids)), qrels)
    fused = pf.fuse(rt.select_queries(list(test_qids)))
    ev = IREvaluator([metric])
    return {
        "probs": {k: v.tolist() for k, v in pf.probs.items()},
        metric: ev.evaluate(fused, qrels)[metric],
        "fused": fused,
    }
