"""Relevance-model feedback (RM1/RM3) + KL-divergence reranking.

Re-expresses the reference's fdbk package (reference
fdbk/RelevanceModelIId.java:21-47 — i.i.d. term weighting over top-k
feedback docs with Dirichlet-smoothed language models;
fdbk/KLDivReranker.java — rerank by cross entropy against the relevance
model; retrieval/Constants.java — λ=0.9, 20 docs / 20 terms, μ=1000).
Operates on raw doc texts through the native tokenizer, so it needs no
Lucene index.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Reference defaults (retrieval/Constants.java)
MU = 1000.0            # Dirichlet smoothing
FB_DOCS = 20
FB_TERMS = 20
LAMBDA_ODQE = 0.9      # RM3 original-query weight


class RelevanceModel:
    """RM1/RM3 estimated from the top feedback documents of one query."""

    def __init__(self, tokenizer=None):
        # tokenizer: str -> list[str]
        self.tokenize = tokenizer or _host_tokenize

    # -- estimation -----------------------------------------------------
    def rm1(
        self,
        query: str,
        doc_texts: Sequence[str],
        doc_scores: Optional[Sequence[float]] = None,
        fb_terms: int = FB_TERMS,
        mu: float = MU,
        fb_docs: int = FB_DOCS,
    ) -> Dict[str, float]:
        """P(t|R) ∝ Σ_d P(t|d) · P(q|d), truncated to fb_terms, normalized.
        fb_docs caps the feedback set (callers passing more doc_texts get
        exactly what they pass up to this cap — pass fb_docs=len(texts)
        to use them all)."""
        docs = [Counter(self.tokenize(t)) for t in doc_texts[:fb_docs]]
        if not docs:
            return {}
        # collection stats over the feedback set (proxy for the collection LM)
        coll = Counter()
        for d in docs:
            coll.update(d)
        coll_len = max(sum(coll.values()), 1)
        q_terms = self.tokenize(query)

        def p_t_d(t: str, d: Counter, dl: int) -> float:
            return (d.get(t, 0) + mu * coll.get(t, 0) / coll_len) / (dl + mu)

        # P(q|d): product of query-term likelihoods (log-sum for stability)
        weights = []
        for d in docs:
            dl = max(sum(d.values()), 1)
            lp = sum(np.log(max(p_t_d(t, d, dl), 1e-12)) for t in q_terms)
            weights.append(lp)
        if doc_scores is not None:
            # optionally blend retrieval scores (rank evidence)
            ranks = np.asarray(doc_scores[: len(docs)], dtype=np.float64)
            weights = np.asarray(weights) + np.log(np.maximum(ranks - ranks.min() + 1e-6, 1e-6))
        w = np.exp(np.asarray(weights) - np.max(weights))
        w = w / w.sum()

        scores: Dict[str, float] = {}
        for wi, d in zip(w, docs):
            dl = max(sum(d.values()), 1)
            for t in d:
                scores[t] = scores.get(t, 0.0) + wi * p_t_d(t, d, dl)
        top = sorted(scores.items(), key=lambda kv: -kv[1])[:fb_terms]
        z = sum(v for _, v in top)
        return {t: v / z for t, v in top} if z > 0 else {}

    def rm3(
        self,
        query: str,
        doc_texts: Sequence[str],
        doc_scores: Optional[Sequence[float]] = None,
        fb_terms: int = FB_TERMS,
        mu: float = MU,
        lam: float = LAMBDA_ODQE,
        fb_docs: int = FB_DOCS,
    ) -> Dict[str, float]:
        """RM3 = λ · MLE(q) + (1−λ) · RM1 (reference RelevanceModelConditional)."""
        rm1 = self.rm1(query, doc_texts, doc_scores, fb_terms=fb_terms, mu=mu,
                       fb_docs=fb_docs)
        q_terms = self.tokenize(query)
        q_mle = Counter(q_terms)
        qn = max(sum(q_mle.values()), 1)
        out: Dict[str, float] = {t: (1 - lam) * v for t, v in rm1.items()}
        for t, c in q_mle.items():
            out[t] = out.get(t, 0.0) + lam * c / qn
        return out

    # -- reranking ------------------------------------------------------
    def kl_rerank(
        self,
        rel_model: Dict[str, float],
        doc_texts: Sequence[str],
        mu: float = MU,
    ) -> np.ndarray:
        """score(d) = Σ_t P(t|R) · log P(t|d) (cross entropy; higher = better),
        reference KLDivReranker semantics."""
        docs = [Counter(self.tokenize(t)) for t in doc_texts]
        coll = Counter()
        for d in docs:
            coll.update(d)
        coll_len = max(sum(coll.values()), 1)
        out = np.zeros(len(docs))
        for di, d in enumerate(docs):
            dl = max(sum(d.values()), 1)
            s = 0.0
            for t, pt in rel_model.items():
                ptd = (d.get(t, 0) + mu * coll.get(t, 0) / coll_len) / (dl + mu)
                s += pt * np.log(max(ptd, 1e-12))
            out[di] = s
        return out


def _host_tokenize(text: str) -> List[str]:
    """Lowercase alnum tokenization matching the native pipeline's splitter
    (stemming/stopwords omitted: relevance models operate on surface forms
    in the reference as well)."""
    out, tok = [], []
    for ch in text.lower():
        if ch.isalnum():
            tok.append(ch)
        elif tok:
            out.append("".join(tok))
            tok = []
    if tok:
        out.append("".join(tok))
    return out


def rm3_rerank_candidates(
    query: str,
    candidates: List[Tuple[str, str]],   # (docno, text) rank-ordered
    fb_docs: int = FB_DOCS,
    fb_terms: int = FB_TERMS,
    lam: float = LAMBDA_ODQE,
) -> List[Tuple[str, float]]:
    """One-call RM3 pseudo-relevance-feedback rerank of a candidate list."""
    rm = RelevanceModel()
    texts = [t for _, t in candidates]
    model = rm.rm3(query, texts[:fb_docs], fb_terms=fb_terms, lam=lam)
    scores = rm.kl_rerank(model, texts)
    order = np.argsort(-scores)
    return [(candidates[i][0], float(scores[i])) for i in order]


def feedback_term_stats(
    queries: Dict[str, str],                 # qid -> text
    runs: Dict[str, List[str]],              # qid -> rank-ordered docnos
    corpus,                                  # dict/LazyCorpus: docno -> text
    num_top_docs: int = FB_DOCS,
    fb_terms: int = FB_TERMS,
    tokenizer=None,
) -> Dict[str, List[Tuple[str, float]]]:
    """Per-query feedback-term weights from a run's top docs — the
    FdbkTermStats workflow (reference retrieval/FdbkTermStats.java:24-66:
    RelevanceModelConditional over the run's top-`num_top_docs`, term
    weights sorted desc). -> {qid: [(term, weight) desc]}.

    `corpus[docno]` may be raw text or a {"text": ...} record (LazyCorpus
    contract). Queries missing from `runs` are skipped, mirroring the
    reference's discard of unmatched qids."""
    rm = RelevanceModel(tokenizer=tokenizer)
    out: Dict[str, List[Tuple[str, float]]] = {}
    for qid, text in queries.items():
        docnos = runs.get(qid)
        if not docnos:
            continue
        doc_texts = []
        for d in docnos[:num_top_docs]:
            rec = corpus[d] if d in corpus else None
            if rec is None:
                continue
            doc_texts.append(rec["text"] if isinstance(rec, dict) else str(rec))
        if not doc_texts:
            continue
        model = rm.rm3(text, doc_texts, fb_terms=fb_terms,
                       fb_docs=num_top_docs)
        out[qid] = sorted(model.items(), key=lambda kv: -kv[1])
    return out
