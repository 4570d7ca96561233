"""One-command end-to-end demo on a synthetic BEIR-style dataset.

`python -m qpp_fusion_rag_tpu.pipeline.demo [--workdir /tmp/qpp_demo]
 [--queries 120] [--docs 3000] [--retrievers 4]`

Generates a corpus + queries + qrels where retrievers have heterogeneous
per-query quality, then drives the full pipeline — index → retrieve → QPP →
train learned fusion → fuse (all methods) → evaluate → oracle — and prints
the method-comparison table. This reproduces the reference paper's
experimental shape (unweighted < QPP-weighted < learned < oracle) without
any external data or models.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def generate_dataset(root: Path, n_queries: int, n_docs: int, n_retrievers: int,
                     seed: int = 0) -> None:
    """Synthetic world: each query's relevant docs share rare marker terms;
    retriever r only 'understands' markers of its specialty slice, so
    per-query quality varies by retriever and the variation is learnable."""
    rng = np.random.default_rng(seed)
    (root / "qrels").mkdir(parents=True, exist_ok=True)
    vocab = [f"term{i}" for i in range(800)]

    # Each query also gets a gold ANSWER: a secret token planted only in
    # its relevant docs, with the query->secret assignment random so an
    # answer model must extract it from context rather than memorize a
    # marker->secret map. gold_answers.json feeds stage 08 (the
    # reference's datasets carry gold answers the same way).
    secrets = rng.permutation(n_queries * 3)[:n_queries]

    with open(root / "corpus.jsonl", "w") as f:
        for d in range(n_docs):
            words = list(rng.choice(vocab, 25))
            if d < n_queries * 2:  # relevant docs carry their query's marker
                q = d // 2
                words += [f"marker{q}"] * 3
                words += ["answer:", f"secret{secrets[q]}"]
            f.write(json.dumps({
                "_id": f"d{d}", "title": "", "text": " ".join(words)
            }) + "\n")

    with open(root / "gold_answers.json", "w") as f:
        json.dump({str(q): [f"secret{secrets[q]}"]
                   for q in range(n_queries)}, f)

    with open(root / "queries.jsonl", "w") as f, \
         open(root / "qrels" / "test.tsv", "w") as fq:
        fq.write("query-id\tcorpus-id\tscore\n")
        for q in range(n_queries):
            specialty = q % n_retrievers
            filler = " ".join(rng.choice(vocab, 3))
            f.write(json.dumps({
                "_id": str(q),
                "text": f"marker{q} {filler}",
                "metadata": {"specialty": specialty},
            }) + "\n")
            fq.write(f"{q}\td{2 * q}\t2\n")
            fq.write(f"{q}\td{2 * q + 1}\t1\n")


def degrade_runs(runs_dir: Path, n_retrievers: int, n_queries: int, seed: int = 1) -> None:
    """Turn the single BM25 run into R retriever runs with heterogeneous
    quality: retriever r keeps its specialty queries' rankings intact and
    shuffles the top of the others — the per-query best retriever varies."""
    from qpp_fusion_rag_tpu.data.loaders import load_run_file, write_run_file

    rng = np.random.default_rng(seed)
    base = load_run_file(runs_dir / "bm25.res")
    for r in range(n_retrievers):
        raw, norm = {}, {}
        for qid, entries in base.items():
            docs = [d for d, _s, _r in entries]
            rel = {f"d{2 * int(qid)}", f"d{2 * int(qid) + 1}"}
            if int(qid) % n_retrievers != r:
                # degrade: independent shuffle with the true answers demoted
                # into the middle third — degraded retrievers disagree with
                # each other AND with the good one (what fusion exploits),
                # while unweighted fusion still gets partial credit
                others = [d for d in docs if d not in rel]
                rng.shuffle(others)
                docs = others
                for d in sorted(rel):
                    docs.insert(int(rng.integers(len(docs) // 3, 2 * len(docs) // 3)), d)
            # steep geometric decay -> rank-1 dominates the fused sum
            scores = 9.9 * (0.9 ** np.arange(len(docs))) + rng.uniform(0, 0.01, len(docs))
            scores = np.sort(scores)[::-1]
            raw[qid] = list(zip(docs, scores.tolist()))
            mn, mx = scores.min(), scores.max()
            nrm = (scores - mn) / (mx - mn if mx > mn else 1.0)
            norm[qid] = list(zip(docs, nrm.tolist()))
        write_run_file(raw, runs_dir / f"r{r}.res", tag=f"r{r}")
        write_run_file(norm, runs_dir / f"r{r}.norm.res", tag=f"r{r}")
    # remove the seed run so fusion sees exactly R retrievers
    (runs_dir / "bm25.res").unlink()
    (runs_dir / "bm25.norm.res").unlink()


def inject_signal_into_qpp(qpp_dir: Path, n_retrievers: int, seed: int = 2) -> None:
    """Make the RSD column reflect each retriever's specialty so weighted/
    learned fusion has signal to exploit (in real data this comes from the
    score distributions themselves; the synthetic degradation flattens
    them, so the demo injects it explicitly)."""
    from qpp_fusion_rag_tpu.config import config

    rsd_col = config.get_qpp_index("RSD")
    for r in range(n_retrievers):
        path = qpp_dir / f"r{r}.res.mmnorm.qpp"
        lines = []
        for line in path.read_text().splitlines():
            parts = line.split("\t")
            qid = parts[0]
            good = int(qid) % n_retrievers == r
            parts[rsd_col + 1] = f"{0.9 if good else 0.1:.6f}"  # +1 for qid col
            lines.append("\t".join(parts))
        path.write_text("\n".join(lines) + "\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="End-to-end synthetic demo")
    ap.add_argument("--workdir", default="/tmp/qpp_demo")
    ap.add_argument("--queries", type=int, default=120)
    ap.add_argument("--docs", type=int, default=3000)
    ap.add_argument("--retrievers", type=int, default=4)
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.pipeline import evaluate as eval_cli
    from qpp_fusion_rag_tpu.pipeline import fuse as fuse_cli
    from qpp_fusion_rag_tpu.pipeline import index as index_cli
    from qpp_fusion_rag_tpu.pipeline import oracle as oracle_cli
    from qpp_fusion_rag_tpu.pipeline import qpp as qpp_cli
    from qpp_fusion_rag_tpu.pipeline import retrieve as retrieve_cli
    from qpp_fusion_rag_tpu.pipeline import train_fusion as train_cli

    root = Path(args.workdir)
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    print(f"[demo] generating dataset under {root}")
    generate_dataset(root, args.queries, args.docs, args.retrievers)

    index_cli.main(["--corpus", str(root / "corpus.jsonl"),
                    "--output", str(root / "index/bm25")])
    retrieve_cli.main(["--dataset-dir", str(root), "--index-dir", str(root / "index"),
                       "--retrievers", "bm25", "--output-dir", str(root / "runs"),
                       "--top-k", "50"])
    degrade_runs(root / "runs", args.retrievers, args.queries)
    qpp_cli.main(["--runs-dir", str(root / "runs"),
                  "--output-dir", str(root / "qpp")])
    inject_signal_into_qpp(root / "qpp", args.retrievers)
    train_cli.main(["--runs-dir", str(root / "runs"), "--qpp-dir", str(root / "qpp"),
                    "--qrels", str(root / "qrels/test.tsv"),
                    "--output-dir", str(root / "models"),
                    "--models", "multioutput", "mlp"])
    fuse_cli.main(["--runs-dir", str(root / "runs"), "--qpp-dir", str(root / "qpp"),
                   "--output-dir", str(root / "fused"), "--method", "all",
                   "--models-dir", str(root / "models")])
    eval_cli.main(["--fused-dir", str(root / "fused"),
                   "--qrels", str(root / "qrels/test.tsv")])
    oracle_cli.main(["--runs-dir", str(root / "runs"),
                     "--qrels", str(root / "qrels/test.tsv"),
                     "--output", str(root / "oracle_report.json")])

    comp = json.loads((root / "fused" / "comparison_results.json").read_text())
    oracle = json.loads((root / "oracle_report.json").read_text())
    print("\n[demo] ===== summary (nDCG@5) =====")
    rows = sorted(comp.items(), key=lambda kv: -kv[1]["metrics"]["nDCG@5"])
    for name, r in rows:
        print(f"[demo]   {name:24s} [{r['type']:12s}] {r['metrics']['nDCG@5']:.4f}")
    print(f"[demo]   {'oracle (upper bound)':24s} [oracle      ] {oracle['oracle_metric']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
