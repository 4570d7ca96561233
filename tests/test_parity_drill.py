"""Parity-gate readiness drill (full-fidelity dry run of the real-data gate).

The reference's run files are git-LFS stubs, so numeric fused-parity vs
its committed comparison_results.json cannot run. This drill keeps the
whole gate path exercised and frozen:

  1. synthesize deterministic reference-scale runs for scifact's 300 REAL
     queries, biased so qrels docs appear in the rankings,
  2. fuse them with the reference's REAL committed `.mmnorm.qpp` weights
     through the actual CLI stages (fuse --qpp-layout reference),
  3. evaluate against the REAL qrels through the evaluate stage,
  4. assert the resulting comparison_results matches the frozen fixture
     (tests/golden/parity_drill_v1.json) within 1e-6.

If real run files ever land, the one-command parity check is the same
flow with step 1 swapped for the real runs and the fixture swapped for
the reference's data/scifact/fused/comparison_results.json.
"""

import json
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/data/scifact")
GOLDEN = Path(__file__).parent / "golden" / "parity_drill_v1.json"

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not REF.exists(), reason="reference data not mounted")]

RETRIEVERS = ["BM25", "Splade", "BGE", "BM25_TCT", "BM25_MonoT5"]
DEPTH = 100


def synth_runs(runs_dir: Path) -> None:
    """Deterministic reference-scale runs: every qrels doc is ranked by
    every retriever (at a retriever-dependent position), the rest of the
    depth is filled from a shared synthetic docno pool."""
    from qpp_fusion_rag_tpu.data.loaders import load_qrels

    qrels = load_qrels(REF / "BEIR-scifact" / "qrels" / "test.tsv")
    rng = np.random.default_rng(42)
    pool = [f"syn{i}" for i in range(4000)]
    runs_dir.mkdir(parents=True, exist_ok=True)
    for r, name in enumerate(RETRIEVERS):
        lines = []
        norm_lines = []
        for qid in sorted(qrels, key=lambda q: int(q)):
            rel_docs = sorted(qrels[qid])
            fill = rng.choice(len(pool), size=DEPTH, replace=False)
            docs = [pool[i] for i in fill]
            # plant qrels docs at retriever-dependent ranks (deterministic)
            for j, d in enumerate(rel_docs):
                pos = (int(qid) + 7 * r + 13 * j) % DEPTH
                docs[pos] = d
            seen = set()
            docs = [d for d in docs if not (d in seen or seen.add(d))]
            docs = docs[:DEPTH]
            for rank, d in enumerate(docs):
                score = 10.0 - rank * 0.05
                lines.append(f"{qid} Q0 {d} {rank + 1} {score:.4f} {name}")
            # the .norm.res contract (stage-02 output): per-query min-max
            lo, hi = 10.0 - (len(docs) - 1) * 0.05, 10.0
            for rank, d in enumerate(docs):
                score = 10.0 - rank * 0.05
                norm = (score - lo) / (hi - lo) if hi > lo else 0.0
                norm_lines.append(f"{qid} Q0 {d} {rank + 1} {norm:.6f} {name}")
        (runs_dir / f"{name}.res").write_text("\n".join(lines) + "\n")
        (runs_dir / f"{name}.norm.res").write_text("\n".join(norm_lines) + "\n")


def test_parity_drill_matches_frozen_fixture(tmp_path):
    from qpp_fusion_rag_tpu.pipeline import evaluate as eval_cli
    from qpp_fusion_rag_tpu.pipeline import fuse as fuse_cli

    runs = tmp_path / "runs"
    fused = tmp_path / "fused"
    synth_runs(runs)

    rc = fuse_cli.main([
        "--runs-dir", str(runs),
        "--qpp-dir", str(REF / "qpp"),
        "--qpp-layout", "reference",
        "--output-dir", str(fused),
        "--method", "all",
        "--qpp-model", "RSD",
    ])
    assert rc == 0
    rc = eval_cli.main([
        "--fused-dir", str(fused),
        "--qrels", str(REF / "BEIR-scifact" / "qrels" / "test.tsv"),
        "--output", str(tmp_path / "comparison_results.json"),
    ])
    assert rc == 0
    got = json.loads((tmp_path / "comparison_results.json").read_text())

    if not GOLDEN.exists():  # first run freezes the fixture
        GOLDEN.write_text(json.dumps(got, indent=1, sort_keys=True))
        pytest.skip("fixture frozen on first run")

    want = json.loads(GOLDEN.read_text())
    assert set(got) == set(want), (sorted(got), sorted(want))

    def leaf_items(d, prefix=""):
        for key, val in d.items():
            if isinstance(val, dict):
                yield from leaf_items(val, f"{prefix}{key}.")
            elif isinstance(val, (int, float)):
                yield f"{prefix}{key}", val

    got_leaves = dict(leaf_items(got))
    want_leaves = dict(leaf_items(want))
    assert set(got_leaves) == set(want_leaves)
    for name, val in want_leaves.items():
        assert got_leaves[name] == pytest.approx(val, abs=1e-6), name
    # sanity: planted qrels docs make the metrics strictly non-trivial
    assert want_leaves and max(want_leaves.values()) > 0.5
