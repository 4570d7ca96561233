"""Index-aware QPP: true IDF statistics from the sparse index.

The invoked reference bridge approximates MaxIDF/avgidf from query text
alone (QPPBridge.java:368-393) — those proxies stay the 13-column parity
default (ops.qpp). This module is the opt-in *index-aware* family the
reference's Lucene-backed classes implement, with document frequencies
read from the native CSR index instead of an IndexReader:

  * idfs(q):   per distinct query term, idf = ln(N / df), df==0 -> df=1
               (reference BaseIDFSpecificity.idfs, java:84-105)
  * avgidf:    sum of ln(N/df) over terms with df>0, / |distinct terms|
               (AvgIDFSpecificity.averageIDF, java:44-63)
  * MaxIDF:    max ln(N/df) over terms with df>0, else 0
               (BaseIDFSpecificity.maxIDF, java:59-81)
  * NQC:       Var(top-k RSVs) * mean(idfs(q))
               (NQCSpecificity.computeNQC, java:44-65)
  * WIG:       sum_{i<k}(rsv_i - 1/MaxIDF) / (|distinct terms| * k)
               (WIGSpecificity.computeSpecificity, java:38-51; when
               MaxIDF==0 the Java form degenerates to -inf — here the
               baseline clamps to 0 so scores stay finite)

Host side resolves term ids + dfs once per query batch; the per-query
scalars then feed a small jitted kernel over the score matrix.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

COLUMNS = ["nqc-idx", "wig-idx", "MaxIDF-idx", "avgidf-idx"]


def idf_stats_from_dfs(
    dfs: np.ndarray,        # [B, Tq] document frequencies (-1 = pad slot)
    n_docs: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (mean_idf, max_idf, avg_idf, n_terms) per query, reference edge
    conventions (see module docstring)."""
    valid = dfs >= 0
    n_terms = valid.sum(axis=1).astype(np.float32)
    N = float(max(n_docs, 1))
    # idfs(): df==0 counts as 1 -> idf = ln(N)
    df_floor = np.where(valid, np.maximum(dfs, 1), 1).astype(np.float64)
    idfs = np.log(N / df_floor)
    mean_idf = np.where(
        n_terms > 0, np.where(valid, idfs, 0.0).sum(axis=1) / np.maximum(n_terms, 1), 1.0
    )
    # maxIDF()/averageIDF(): df==0 terms are skipped in the aggregation
    seen = valid & (dfs > 0)
    idf_seen = np.where(seen, idfs, 0.0)
    max_idf = np.where(seen.any(axis=1), np.where(seen, idfs, -np.inf).max(axis=1), 0.0)
    avg_idf = np.where(n_terms > 0, idf_seen.sum(axis=1) / np.maximum(n_terms, 1), 0.0)
    return (
        mean_idf.astype(np.float32),
        max_idf.astype(np.float32),
        avg_idf.astype(np.float32),
        n_terms,
    )


@partial(jax.jit, static_argnames=("cutoff",))
def index_aware_kernel(
    scores: jnp.ndarray,    # [Q, K] desc-sorted retrieval scores
    n_valid: jnp.ndarray,   # [Q] int32
    mean_idf: jnp.ndarray,  # [Q] mean of idfs(q) (df==0 -> 1 convention)
    max_idf: jnp.ndarray,   # [Q] max ln(N/df) over seen terms, 0 if none
    avg_idf: jnp.ndarray,   # [Q] averageIDF (seen terms only / all terms)
    n_terms: jnp.ndarray,   # [Q] distinct query term count
    cutoff: int = 50,
) -> jnp.ndarray:
    """-> [Q, 4] columns in COLUMNS order."""
    Q, K = scores.shape
    s = scores.astype(jnp.float32)
    m = jnp.minimum(n_valid.astype(jnp.int32), cutoff)
    idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    mask = idx < m[:, None]
    mf = jnp.maximum(m.astype(jnp.float32), 1.0)
    sm = jnp.where(mask, s, 0.0)

    mean = jnp.sum(sm, axis=1) / mf
    var = jnp.sum(jnp.where(mask, (s - mean[:, None]) ** 2, 0.0), axis=1) / mf
    nqc = jnp.where(m > 0, var * mean_idf, 0.0)

    baseline = jnp.where(max_idf > 0, 1.0 / jnp.where(max_idf > 0, max_idf, 1.0), 0.0)
    wig_sum = jnp.sum(jnp.where(mask, s - baseline[:, None], 0.0), axis=1)
    wig = jnp.where(m > 0, wig_sum / (jnp.maximum(n_terms, 1.0) * mf), 0.0)

    out = jnp.stack(
        [nqc, wig, jnp.broadcast_to(max_idf, (Q,)), jnp.broadcast_to(avg_idf, (Q,))],
        axis=1,
    )
    return jnp.where((m > 0)[:, None], out, 0.0)


class IndexAwareQPP:
    """Compute the index-aware QPP column family for a query batch.

    Wraps a SparseIndex (or anything exposing ``encode_queries``,
    ``offsets`` and ``num_docs``): term dfs come from the CSR offsets the
    same way Lucene's ``reader.docFreq(t)`` serves the reference classes.
    """

    def __init__(self, index, cutoff: int = 50):
        self.index = index
        self.cutoff = int(cutoff)
        self._dfs = np.diff(np.asarray(index.offsets, dtype=np.int64))

    def query_dfs(self, queries: Sequence[str]) -> np.ndarray:
        """-> dfs [B, Tq] with -1 in pad slots (unknown terms have df 0)."""
        term_ids, _w = self.index.encode_queries(queries)
        dfs = np.full(term_ids.shape, -1, dtype=np.int64)
        valid = term_ids >= 0
        dfs[valid] = self._dfs[term_ids[valid]]
        return dfs

    def compute(
        self,
        queries: Sequence[str],
        scores: np.ndarray,       # [Q, K] desc-sorted
        n_valid: np.ndarray,      # [Q]
    ) -> Dict[str, np.ndarray]:
        """-> {column name: [Q] array} for COLUMNS."""
        dfs = self.query_dfs(queries)
        mean_idf, max_idf, avg_idf, n_terms = idf_stats_from_dfs(
            dfs, self.index.num_docs
        )
        cols = index_aware_kernel(
            jnp.asarray(scores), jnp.asarray(n_valid, dtype=jnp.int32),
            mean_idf, max_idf, avg_idf, n_terms, cutoff=self.cutoff,
        )
        cols = np.asarray(cols)
        return {name: cols[:, i] for i, name in enumerate(COLUMNS)}
