"""Term-weighting formulas (retrieval/TermWtUtil.java:1-21 equivalents).

Vectorized over numpy arrays (scalars broadcast), used by the research
tools (SupervisedRLM, doc-vector export re-weighting) and available as a
public utility surface. Formulas match the reference exactly:

    bm25_weight  = f·(k+1) / (f + k·(1−b + b·len/avg_len) · bm25_idf)
    bm25_idf     = ln(1 + (N − n + 0.5)/(n + 0.5))
    tfidf_weight = f · ln(N / n)
    lmjm_weight  = ln(1 + λ/(1−λ) · f/len · N/cf)

NOTE the reference's bm25_weight really multiplies the IDF inside the
denominator's length-normalization term (TermWtUtil.java:6-8) — an
idiosyncrasy preserved verbatim (`faithful=True`); `faithful=False`
gives the textbook idf · f·(k+1)/(f + k·(1−b+b·len/avg)) instead.
"""

from __future__ import annotations

import numpy as np


def bm25_idf(n_docs, df):
    """ln(1 + (N − df + 0.5)/(df + 0.5)) — TermWtUtil.bm25IDF."""
    n_docs = np.asarray(n_docs, np.float64)
    df = np.asarray(df, np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_weight(tf, n_docs, df, doc_len, avg_len, k1=0.9, b=0.4,
                faithful=True):
    """TermWtUtil.bm25Weight — see module docstring for the `faithful`
    denominator quirk."""
    tf = np.asarray(tf, np.float64)
    idf = bm25_idf(n_docs, df)
    norm = 1.0 - b + b * np.asarray(doc_len, np.float64) / avg_len
    if faithful:
        return tf * (k1 + 1.0) / (tf + k1 * norm * idf)
    return idf * tf * (k1 + 1.0) / (tf + k1 * norm)


def tfidf_weight(tf, n_docs, df):
    """f · ln(N/df) — TermWtUtil.tfIdfWeight."""
    return np.asarray(tf, np.float64) * np.log(
        np.asarray(n_docs, np.float64) / np.asarray(df, np.float64))


def lmjm_weight(tf, n_docs, cf, doc_len, lam=0.9):
    """Jelinek-Mercer LM weight — TermWtUtil.lmjmWeight."""
    tf = np.asarray(tf, np.float64)
    return np.log(1.0 + lam / (1.0 - lam) * tf
                  / np.asarray(doc_len, np.float64)
                  * np.asarray(n_docs, np.float64)
                  / np.asarray(cf, np.float64))
