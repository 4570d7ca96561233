"""Empirically solve Terrier's query-time stopword list from the committed
real SciFact artifacts.

Oracle: per-query raw skewness (RSD) targets recovered from the committed
BM25.res.mmnorm.qpp — skewness is scale/shift invariant, so a query's value
depends only on WHICH tokens matched. Start from a seed list, then for each
mismatching query try single-token toggles (drop a kept token / keep a
dropped one); a toggle that lands the query exactly on its target is a vote
for flipping that word globally. Iterate until fixed point.

Run: python scripts_dev/solve_stopwords.py
"""

import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/data/scifact")
sys.path.insert(0, str(REPO))

from qpp_fusion_rag_tpu.index.terrier import (  # noqa: E402
    TerrierIndex, porter_stem, sanitize_terrier_query, terrier_tokenize)
from qpp_fusion_rag_tpu.data.loaders import load_qpp_file, load_queries  # noqa: E402

# seed: the round-3 empirical list (73% exact rows)
SEED = set("""
a about above after again against all almost alone along already also
although always am among an and another any are around as at be became
because become becomes been before behind below between both but by came
cannot certain could did do does done down during each either enough etc
even ever every far few fewer for from further had has have having he
her here hers herself him himself his how however if in into is it its
itself just least less let many me might more most mostly much must my
myself necessary neither never no nobody none nor not nothing now
nowhere of off often oh on one or other others otherwise our ours
ourselves out over per perhaps rather same seemed seeming seems serious
several shall she should since six so some somehow something sometime
sometimes somewhere still such ten than that the their theirs them
themselves then there therefore these they this those through thus to
together too toward two under until up upon very via was we well were
what when where whether which while whole whom whose why will with
within without would yet you your yours yourself yourselves
""".split()) | set("abcdefghijklmnopqrstuvwxyz") | {"available","different","make","provided","relate","related","use","used"}


def main():
    ti = TerrierIndex.load(REF / "index/pyterrier")
    queries = load_queries(REF / "BEIR-scifact")
    theirs = load_qpp_file(REF / "qpp/BM25.res.mmnorm.qpp")
    k1, b = 1.2, 0.75
    w = ti.bm25_weights(k1=k1, b=b)
    lex = {t: i for i, t in enumerate(ti.terms)}
    qids = sorted(theirs, key=lambda x: int(x))
    toks = {q: terrier_tokenize(sanitize_terrier_query(queries[q]))
            for q in qids}

    def skew_for(q, stop):
        counts = {}
        for t in toks[q]:
            if t in stop:
                continue
            i = lex.get(porter_stem(t))
            if i is not None:
                counts[i] = counts.get(i, 0) + 1
        if not counts:
            return 0.0
        scores = np.zeros(ti.num_docs)
        for i, c in counts.items():
            qw = float(c)  # Terrier sums duplicate terms linearly (verified)
            seg = slice(ti.offsets[i], ti.offsets[i + 1])
            np.add.at(scores, ti.docids[seg], qw * w[seg].astype(np.float64))
        matched = scores[scores != 0]
        if matched.size == 0:
            return 0.0
        sc = np.sort(matched)[::-1][:50]
        m, s = sc.mean(), sc.std()
        return float(np.mean((sc - m) ** 3) / s ** 3) if s > 0 else 0.0

    stop = set(SEED)
    brsd = np.array([theirs[q][5] for q in qids])

    for it in range(12):
        raw = np.array([skew_for(q, stop) for q in qids])
        mn, mx = raw.min(), raw.max()
        target = brsd * (mx - mn) + mn
        tol = 0.6e-6 * (mx - mn) + 1e-7
        bad = [i for i in range(len(qids))
               if abs(raw[i] - target[i]) > tol]
        print(f"iter {it}: {len(bad)} mismatched")
        if not bad:
            break
        votes = {}
        for i in bad:
            q = qids[i]
            cand = set(toks[q])
            fixes = []
            for t in cand:
                trial = (stop - {t}) if t in stop else (stop | {t})
                s2 = skew_for(q, trial)
                if abs(s2 - target[i]) <= tol:
                    fixes.append(t)
            if len(fixes) == 1:  # unambiguous single-token fix
                t = fixes[0]
                votes[t] = votes.get(t, 0) + 1
            elif len(fixes) > 1:
                for t in fixes:
                    votes.setdefault(t, 0)
                print(f"  {q}: ambiguous fixes {fixes}")
            else:
                print(f"  {q}: no single-token fix "
                      f"({[t for t in toks[q]][:14]})")
        applied = [t for t, v in votes.items() if v >= 1]
        if not applied:
            print("  no applicable votes; stopping")
            break
        for t in applied:
            if t in stop:
                stop.discard(t)
                print(f"  REMOVE {t!r} (votes {votes[t]})")
            else:
                stop.add(t)
                print(f"  ADD    {t!r} (votes {votes[t]})")

    added = sorted(stop - SEED)
    removed = sorted(SEED - stop)
    print("\nFINAL delta vs seed:")
    print("  added:", added)
    print("  removed:", removed)
    Path("/tmp/stopwords_solved.txt").write_text("\n".join(sorted(stop)))
    print("wrote /tmp/stopwords_solved.txt")


if __name__ == "__main__":
    main()
