"""Generated-query-variant QPP: the gen-variants evaluation workflow.

Counterpart of the reference's
experiments/TRECDLQPPEvaluatorWithGenVariants.java:1-258 — variant QPP
where a query's variants come from a FILE of generated paraphrases
(`qid\\t<orig text>\\tvariant1\\tvariant2...`, parsed exactly as
retrieval/KNNRelModel.java:150-186) instead of KNN lookups in a query
index. The workflow:

  1. each variant is retrieved as its own query (any registry retriever,
     batched on device),
  2. variant similarity = RBO between the original's and the variant's
     run lists (KNNRelModel.computeRBO, java:139-148) or uniform 1.0,
  3. the base QPP statistic computed on each variant's run smooths the
     original's (VariantSpecificity combination),
  4. a (num_variants, lambda) grid is searched on the train split by
     Kendall's tau and the argmax applied to the test split
     (TRECDLQPPEvaluatorWithGenVariants.trainAndTest, java:67-124).

Also here: the MsMarcoNNQueriesWriter equivalent (write_nn_queries_file,
reference retrieval/MsMarcoNNQueriesWriter.java:1-32 +
KNNRelModel.findKNNOfQueriesAndComputeRBO java:432-444).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from qpp_fusion_rag_tpu.qpp import correlation as C


def load_variants_file(path) -> Dict[str, List[str]]:
    """Parse a generated-variants TSV: qid, original text, then one
    column per variant (KNNRelModel.constructKNNMap(variantsFile)
    semantics: columns [2:] are the variants; lines may repeat a qid,
    appending variants). -> {qid: [variant texts]}."""
    out: Dict[str, List[str]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            tokens = line.split("\t")
            if len(tokens) < 3:
                continue
            out.setdefault(tokens[0], []).extend(
                t for t in tokens[2:] if t)
    return out


def rbo_sims(
    orig_ids: np.ndarray,      # [Q, K] original run doc ids (-1 pad)
    variant_ids: np.ndarray,   # [Q, V, K] per-variant run doc ids
    p: float = 0.9,
) -> np.ndarray:
    """RBO(original run, variant run) per (query, variant) -> [Q, V].
    The gen-variants analogue of KNNRelModel.computeRBO (similarity of a
    variant = run-list overlap with the original, not text similarity)."""
    Q, V = variant_ids.shape[:2]
    sims = np.zeros((Q, V), np.float32)
    for i in range(Q):
        a = [int(d) for d in orig_ids[i] if d >= 0]
        for v in range(V):
            b = [int(d) for d in variant_ids[i, v] if d >= 0]
            sims[i, v] = C.rbo(a, b, p=p) if a and b else 0.0
    return sims


def gen_variant_qpp(
    base: np.ndarray,           # [Q] base QPP on the original queries
    variant_base: np.ndarray,   # [Q, V] base QPP on each variant's run
    sims: Optional[np.ndarray] = None,   # [Q, V]; None = uniform
    lam: float = 0.9,
    num_variants: Optional[int] = None,
) -> np.ndarray:
    """lam·base + (1−lam)·sim-weighted mean of the top-`num_variants`
    variants (sorted by sim desc, as the reference sorts under useRBO).
    Variants with sim <= 0 (or missing, NaN) get zero weight; a query
    with no usable variants keeps its base value."""
    base = np.asarray(base, np.float64)
    vb = np.asarray(variant_base, np.float64)
    Q, V = vb.shape
    w = np.ones((Q, V), np.float64) if sims is None else np.asarray(
        sims, np.float64).copy()
    w[~np.isfinite(vb)] = 0.0
    w = np.maximum(w, 0.0)
    vb = np.nan_to_num(vb)
    if num_variants is not None and num_variants < V:
        order = np.argsort(-w, axis=1, kind="stable")
        keep = order[:, :num_variants]
        mask = np.zeros((Q, V), bool)
        np.put_along_axis(mask, keep, True, axis=1)
        w = w * mask
    denom = w.sum(axis=1)
    smoothed = np.where(denom > 0, (w * vb).sum(axis=1) / np.maximum(denom, 1e-12), base)
    return (lam * base + (1 - lam) * smoothed).astype(np.float32)


def train_test_grid_gen_variants(
    base_train: np.ndarray,          # [Qtr]
    variant_base_train: np.ndarray,  # [Qtr, V]
    sims_train: Optional[np.ndarray],
    truth_train: np.ndarray,         # [Qtr] target metric per query
    base_test: np.ndarray,
    variant_base_test: np.ndarray,
    sims_test: Optional[np.ndarray],
    truth_test: np.ndarray,
    max_variants: int = 5,
    lambdas: Optional[Sequence[float]] = None,
    select_metric: Callable = C.kendall,
) -> Dict:
    """Grid-search (num_variants, lambda) on train by Kendall's tau, apply
    the argmax on test (TRECDLQPPEvaluatorWithGenVariants.trainAndTest).
    The reference grid steps lambda 0..1 by QPP_COREL_LAMBDA_STEPS=0.2 on
    the VARIANT weight; `lambdas` here are BASE weights, defaulting to
    the equivalent [1.0, 0.8, 0.6, 0.4, 0.2, 0.0]."""
    from qpp_fusion_rag_tpu.qpp.experiments import grid_search_variants

    if lambdas is None:
        lambdas = [round(1.0 - l, 1) for l in np.arange(0.0, 1.0001, 0.2)]
    max_variants = min(max_variants, variant_base_train.shape[1])

    return grid_search_variants(
        lambda nv, lam: gen_variant_qpp(base_train, variant_base_train,
                                        sims_train, lam=lam, num_variants=nv),
        lambda nv, lam: gen_variant_qpp(base_test, variant_base_test,
                                        sims_test, lam=lam, num_variants=nv),
        truth_train, truth_test, max_variants, lambdas, select_metric)


def write_nn_queries_file(
    path,
    qids: Sequence[str],
    texts: Sequence[str],
    nn_idx: np.ndarray,        # [Q, K] neighbor indices into qids (-1 pad)
    nn_sims: np.ndarray,       # [Q, K] RBO similarities
) -> int:
    """Write the nearest-neighbor-queries file of MsMarcoNNQueriesWriter
    (reference retrieval/MsMarcoNNQueriesWriter.java + KNNRelModel.
    findKNNOfQueriesAndComputeRBO java:440-442):
        qid  Q0  nn_qid  rank  sim  "orig| neighbor"
    Returns the number of records written. Neighbors typically come from
    qpp.variants.query_knn over query embeddings, sims from rbo_sims over
    their runs."""
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for i, qid in enumerate(qids):
            rank = 1
            for j, sim in zip(nn_idx[i], nn_sims[i]):
                if j < 0:
                    continue
                f.write("%s\tQ0\t%s\t%d\t%.4f\t%s\n" % (
                    qid, qids[int(j)], rank, float(sim),
                    f"{texts[i]}| {texts[int(j)]}"))
                rank += 1
                n += 1
    return n
