"""Research-extras from the reference's retrieval/ package.

Three standalone tools the reference ships but never wires into the
invoked pipeline — complete here for inventory parity:

* :class:`SupervisedRLM` — a supervised relevance language model
  (reference retrieval/SupervisedRLM.java:20-270 +
  TermDistribution.java): per-query-term co-occurrence distributions
  accumulated from judged-relevant documents' IDF-weighted LM vectors,
  pruned to the top co-occurring terms, used to rerank by
  ``cos(P(w|q), doc) * original score``.
* :func:`query_rbo_nn` — rescore query nearest-neighbor variants by the
  Rank-Biased Overlap of their result lists with the original query's
  (reference retrieval/QueryRBO_NN.java:31-45).
* :class:`BigramsFinder` — unordered query term-pair frequency counts
  (reference retrieval/BigramsFinder.java:10-48).

Host-side by design (dictionary-shaped sparse statistics over judged
docs — thousands of short vectors, not a device workload); the retrieval
calls they make go through the device kernels via SparseIndex.
"""

from __future__ import annotations

import math
from collections import Counter
from pathlib import Path
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

LAMBDA = 0.9                      # retrieval/Constants.java:27
LAMBDA_ODDS = LAMBDA / (1 - LAMBDA)
NUM_TOP_TERMS = 5                 # Constants.java:29
DELIM = "^"


def _l2norm(wts: Dict[str, float]) -> float:
    return math.sqrt(sum(v * v for v in wts.values()))


class TermDistribution:
    """P(w | query term): co-occurrence weights accumulated over the
    query's relevant docs (reference TermDistribution.java)."""

    def __init__(self, query_term: str):
        self.query_term = query_term
        self.cooccur: Dict[str, float] = {}

    def update(self, qterm: str, doc_term_wts: Dict[str, float]) -> None:
        p_q_d = doc_term_wts.get(qterm, 0.0)
        if p_q_d <= 0:
            return
        for w, p_w_d in doc_term_wts.items():
            p_w_q = p_q_d * p_w_d
            if p_w_q > 0:
                self.cooccur[w] = self.cooccur.get(w, 0.0) + p_w_q

    def prune(self, top: int = NUM_TOP_TERMS) -> None:
        kept = sorted(self.cooccur.items(), key=lambda e: -e[1])[:top]
        self.cooccur = dict(kept)

    def cosine_sim(self, term_wts: Dict[str, float]) -> float:
        if not self.cooccur:
            return 0.0
        return sum(self.cooccur.get(w, 0.0) * v for w, v in term_wts.items())


class SupervisedRLM:
    """Supervised RLM over a SparseIndex + tokenized corpus access.

    ``doc_terms(docno) -> List[str]`` supplies a document's analyzed
    terms (the reference reads Lucene term vectors); ``df(term)`` and
    ``num_docs`` come from the index for the IDF weighting.
    """

    def __init__(
        self,
        doc_terms: Callable[[str], Sequence[str]],
        df: Callable[[str], int],
        num_docs: int,
    ):
        self.doc_terms = doc_terms
        self.df = df
        self.num_docs = max(int(num_docs), 1)
        self.term_distributions: Dict[str, TermDistribution] = {}

    # -- the LM doc vector (SupervisedRLM.makeLMTermWts, java:75-125) --
    def make_lm_term_wts(self, docno: str, idf_weighting: bool = True) -> Dict[str, float]:
        tf = Counter(self.doc_terms(docno))
        if not tf:
            return {}
        sum_tf = float(sum(tf.values()))
        if idf_weighting:
            wts = {}
            for t, f in tf.items():
                d = max(self.df(t), 1)
                wts[t] = math.log(
                    1.0 + LAMBDA_ODDS * (f / sum_tf) * (self.num_docs / d)
                )
        else:
            wts = {t: float(f) for t, f in tf.items()}
        norm = _l2norm(wts)
        return {t: v / norm for t, v in wts.items()} if norm > 0 else wts

    # -- training (fit, java:146-183) ----------------------------------
    def fit(
        self,
        queries: Dict[str, str],
        qrels: Dict[str, Dict[str, int]],
        tokenize_query: Optional[Callable[[str], Sequence[str]]] = None,
    ) -> None:
        tok = tokenize_query or (lambda s: s.lower().split())
        for qid, qtext in queries.items():
            rel = qrels.get(qid)
            if not rel:
                continue
            qterms = list(tok(qtext))
            for docno, gain in rel.items():
                if gain <= 0:
                    continue
                term_wts = self.make_lm_term_wts(docno)
                for q in qterms:
                    td = self.term_distributions.setdefault(q, TermDistribution(q))
                    td.update(q, term_wts)
        self.prune()

    def prune(self, top: int = NUM_TOP_TERMS) -> None:
        for td in self.term_distributions.values():
            td.prune(top)

    # -- persistence (saveToDisk/loadFromDisk, java:198-233) -----------
    def save(self, path) -> None:
        lines = []
        for td in self.term_distributions.values():
            pairs = " ".join(f"{w}{DELIM}{v}" for w, v in td.cooccur.items())
            lines.append(f"{td.query_term}\t{pairs}")
        Path(path).write_text("\n".join(lines) + "\n")

    @classmethod
    def load(cls, path, doc_terms, df, num_docs) -> "SupervisedRLM":
        rlm = cls(doc_terms, df, num_docs)
        for line in Path(path).read_text().splitlines():
            parts = line.split("\t")
            if len(parts) < 2:
                continue
            td = TermDistribution(parts[0])
            for token in parts[1].split():
                w, _, v = token.partition(DELIM)
                if v:
                    td.cooccur[w] = float(v)
            td.prune()
            rlm.term_distributions[parts[0]] = td
        return rlm

    # -- rerank (java:236-262) -----------------------------------------
    def rerank(
        self,
        query_text: str,
        docnos: Sequence[str],
        scores: Sequence[float],
        tokenize_query: Optional[Callable[[str], Sequence[str]]] = None,
    ) -> List[Tuple[str, float]]:
        """score'(d) = (sum_q cos(P(.|q), d)) * score(d), sorted desc."""
        tok = tokenize_query or (lambda s: s.lower().split())
        qterms = list(tok(query_text))
        out = []
        for docno, score in zip(docnos, scores):
            wts = self.make_lm_term_wts(docno)
            p_r_d = sum(
                self.term_distributions[q].cosine_sim(wts)
                for q in qterms if q in self.term_distributions
            )
            out.append((docno, p_r_d * score))
        return sorted(out, key=lambda e: -e[1])


def query_rbo_nn(
    orig_runs: Dict[str, Sequence[str]],       # qid -> ranked doc ids (top-20)
    nn_runs: Dict[str, Dict[str, Sequence[str]]],  # qid -> {nn_qid: ranked ids}
    p: float = 0.9,
) -> Dict[str, List[Tuple[str, float]]]:
    """Rescore each query's NN variants by RBO(original run, variant run)
    (reference QueryNN.process, java:31-45). -> {qid: [(nn_qid, rbo)...]}
    in input order (the reference writes rank by input order too)."""
    from qpp_fusion_rag_tpu.qpp.correlation import rbo

    out: Dict[str, List[Tuple[str, float]]] = {}
    for qid, orig in orig_runs.items():
        nns = nn_runs.get(qid, {})
        out[qid] = [(nn_qid, float(rbo(list(orig), list(run), p=p)))
                    for nn_qid, run in nns.items()]
    return out


class BigramsFinder:
    """Unordered query term-pair frequencies (BigramsFinder.java)."""

    def __init__(self, queries: Iterable[Sequence[str]]):
        self.bigram_freqs: Counter = Counter()
        for terms in queries:
            terms = list(terms)
            for i in range(len(terms) - 1):
                for j in range(i + 1, len(terms)):
                    self.bigram_freqs[f"{terms[i]}{DELIM}{terms[j]}"] += 1

    def frequent_bigrams(self, top: int = 100) -> Dict[str, int]:
        return dict(self.bigram_freqs.most_common(top))
