"""QPP engine host API: run files / RunTensors in, .qpp artifacts out.

Replaces the reference's subprocess driver (reference src/qpp.py:245-374):
no JVM, no JSON-over-stdio — scores go straight to the fused device kernel.
File outputs keep the reference's ``<R>.res.mmnorm.qpp`` naming, numeric-qid
sort and 6-decimal format so artifacts interoperate.
"""

from __future__ import annotations

import os
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from qpp_fusion_rag_tpu.config import config
from qpp_fusion_rag_tpu.data.loaders import qid_sort_key, write_qpp_file
from qpp_fusion_rag_tpu.data.runtensor import RunTensor
from qpp_fusion_rag_tpu.ops import qpp as Q


def compute_qpp(
    scores_by_qid: Dict[str, List[float]],
    query_texts: Optional[Dict[str, str]] = None,
    top_k: Optional[int] = None,
    normalize: Optional[str] = None,
    cutoff: Optional[int] = None,
    index=None,
) -> Dict[str, List[float]]:
    """Compute the 13 statistics for {qid: [scores]} -> {qid: [13 floats]}.

    Scores are sorted desc and truncated to ``top_k`` before the kernel's own
    min(50, n) cutoff, mirroring the reference driver (src/qpp.py:292-305).
    When a query's text is unavailable its qid string is used, matching the
    reference's batch-mode behavior (src/qpp.py:311-317).

    ``index`` (a SparseIndex) opts into the index-aware column family: the
    4 true-IDF columns (qpp.index_aware, reference NQCSpecificity.java:44-65,
    BaseIDFSpecificity.java:59-105) are APPENDED after the 13 parity columns,
    normalized the same way.
    """
    top_k = top_k or config.processing.retrieval.top_k
    normalize = normalize if normalize is not None else config.qpp.normalization
    cutoff = cutoff or config.qpp.cutoff_k
    query_texts = query_texts or {}

    qids = sorted(scores_by_qid.keys(), key=qid_sort_key)
    rows = [sorted(scores_by_qid[q], reverse=True)[:top_k] for q in qids]
    K = max([len(r) for r in rows] + [1])  # >=1 even when all lists are empty
    mat = np.zeros((len(qids), K), dtype=np.float32)
    n_valid = np.zeros((len(qids),), dtype=np.int32)
    for i, r in enumerate(rows):
        mat[i, : len(r)] = r
        n_valid[i] = len(r)

    feats = Q.text_features_batch([query_texts.get(q, q) for q in qids])
    raw = np.asarray(Q.qpp_kernel(mat, n_valid, feats, cutoff=cutoff))
    if index is not None:
        from qpp_fusion_rag_tpu.qpp.index_aware import COLUMNS, IndexAwareQPP

        ia = IndexAwareQPP(index, cutoff=cutoff)
        cols = ia.compute([query_texts.get(q, q) for q in qids], mat, n_valid)
        raw = np.concatenate(
            [raw] + [cols[name][:, None] for name in COLUMNS], axis=1
        ).astype(np.float32)
    if normalize and normalize != "none" and len(qids) > 0:
        raw = np.asarray(Q.normalize_qpp(raw, method=normalize))
    return {qid: raw[i].tolist() for i, qid in enumerate(qids)}


def compute_qpp_for_res_file(
    res_path: os.PathLike,
    output_path: Optional[os.PathLike] = None,
    top_k: Optional[int] = None,
    normalize: Optional[str] = None,
    queries_path: Optional[os.PathLike] = None,
) -> Dict[str, List[float]]:
    """Reference driver semantics (src/qpp.py:245-337): parse a .res file,
    compute + normalize, optionally write ``.mmnorm.qpp``."""
    import json

    if not os.path.exists(res_path):
        raise FileNotFoundError(f"Run file not found: {res_path}")

    query_texts: Dict[str, str] = {}
    if queries_path and os.path.exists(queries_path):
        with open(queries_path) as f:
            for line in f:
                q = json.loads(line)
                query_texts[str(q["_id"])] = q["text"]

    runs: Dict[str, List[float]] = defaultdict(list)
    with open(res_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 5:
                runs[parts[0]].append(float(parts[4]))
    if not runs:
        raise ValueError(f"No valid entries in run file: {res_path}")

    results = compute_qpp(dict(runs), query_texts, top_k=top_k, normalize=normalize)
    if output_path:
        write_qpp_file(results, output_path)
    return results


def compute_qpp_for_runtensor(
    rt: RunTensor,
    query_texts: Optional[Dict[str, str]] = None,
    normalize: Optional[str] = None,
    cutoff: Optional[int] = None,
    features: Optional[np.ndarray] = None,
) -> np.ndarray:
    """All-device path: RunTensor -> qpp [R, Q, 13] (normalized per retriever
    across queries). Feeds weighted fusion without any file round-trip.

    `features` lets callers that evaluate many perturbations of the same
    query set (qpp.stochastic) hoist the host-side text-feature pass."""
    normalize = normalize if normalize is not None else config.qpp.normalization
    cutoff = cutoff or config.qpp.cutoff_k
    query_texts = query_texts or {}
    feats = features if features is not None else Q.text_features_batch(
        [query_texts.get(q, q) for q in rt.qids]
    )

    # scores are already rank-ordered; treat -inf padding via n_valid
    scores = np.where(rt.valid_mask, rt.scores, 0.0).astype(np.float32)
    n_valid = rt.valid_counts
    out = np.zeros((rt.R, rt.Q, Q.N_METHODS), dtype=np.float32)
    for r in range(rt.R):
        raw = Q.qpp_kernel(scores[r], n_valid[r], feats, cutoff=cutoff)
        if normalize and normalize != "none":
            raw = Q.normalize_qpp(raw, method=normalize)
        out[r] = np.asarray(raw)
    return out


def qpp_tensor_to_dict(
    qpp: np.ndarray, qids: Sequence[str], retrievers: Sequence[str]
) -> Dict[str, Dict[str, List[float]]]:
    """[R, Q, 13] -> {qid: {retriever: [scores]}} (fusion-engine input shape)."""
    return {
        qid: {retrievers[r]: qpp[r, qi].tolist() for r in range(len(retrievers))}
        for qi, qid in enumerate(qids)
    }


def compute_qpp_dir(
    runs_dir: os.PathLike,
    qpp_dir: os.PathLike,
    queries_path: Optional[os.PathLike] = None,
    top_k: Optional[int] = None,
    normalize: Optional[str] = None,
    skip_existing: bool = True,
) -> List[Path]:
    """Stage-03 equivalent (reference scripts/03_qpp.py): one .mmnorm.qpp per
    non-normalized .res in runs_dir. No process pool needed — the kernel
    batches all queries of a file in one device call."""
    runs_dir, qpp_dir = Path(runs_dir), Path(qpp_dir)
    qpp_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for res in sorted(runs_dir.glob("*.res")):
        if res.name.endswith(".norm.res"):
            continue
        out = qpp_dir / f"{res.name}.mmnorm.qpp"
        if skip_existing and out.exists():
            continue
        compute_qpp_for_res_file(res, out, top_k=top_k, normalize=normalize, queries_path=queries_path)
        written.append(out)
    return written


def _self_test() -> None:
    """Fixed-input self test (reference `python src/qpp.py --test`,
    src/qpp.py:393-404: compute QPP on a canned 10-score list)."""
    scores = [0.95, 0.87, 0.82, 0.76, 0.71, 0.65, 0.58, 0.52, 0.47, 0.41]
    out = compute_qpp({"q1": scores}, {"q1": "sample test query"}, normalize="none")
    names = list(config.qpp.methods)
    print("[qpp --test] 10-score fixed input:")
    for name, val in zip(names, out["q1"]):
        print(f"[qpp --test]   {name:12s} {val:.6f}")
    assert all(abs(v) < 1e6 for v in out["q1"])
    print("[qpp --test] OK")


if __name__ == "__main__":
    import sys

    if "--test" in sys.argv:
        _self_test()
    else:
        print(__doc__)
