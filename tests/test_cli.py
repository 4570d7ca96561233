"""End-to-end CLI pipeline on a synthetic dataset: qpp → train → fuse → eval."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # stage-chain fixtures are compile-heavy; fast tier covers the stages via unit tests


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    """Synthetic runs/qrels/queries on disk for 3 retrievers, 40 queries."""
    from qpp_fusion_rag_tpu.data.loaders import write_run_file

    root = tmp_path_factory.mktemp("ds")
    runs = root / "runs"
    runs.mkdir()
    rng = np.random.default_rng(0)
    qids = [str(i) for i in range(40)]

    with open(root / "queries.jsonl", "w") as f:
        for q in qids:
            f.write(json.dumps({"_id": q, "text": f"sample query number {q}"}) + "\n")

    qrels_path = root / "qrels.tsv"
    with open(qrels_path, "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for q in qids:
            f.write(f"{q}\td{int(q) * 3}\t1\n")
            f.write(f"{q}\td{int(q) * 3 + 1}\t2\n")

    for r in range(3):
        raw, norm = {}, {}
        for q in qids:
            docs = [f"d{rng.integers(0, 120)}" for _ in range(20)]
            if r == 0:  # r0 finds relevant docs
                docs[:2] = [f"d{int(q) * 3}", f"d{int(q) * 3 + 1}"]
            scores = np.sort(rng.uniform(0, 10, 20))[::-1]
            raw[q] = list(zip(docs, scores.tolist()))
            mn, mx = scores.min(), scores.max()
            norm[q] = list(zip(docs, ((scores - mn) / (mx - mn)).tolist()))
        write_run_file(raw, runs / f"r{r}.res", tag=f"r{r}")
        write_run_file(norm, runs / f"r{r}.norm.res", tag=f"r{r}")
    return root


@pytest.fixture(scope="module")
def qpp_dir(pipeline_dirs):
    """Stage 03 artifacts (lazy, once per module: each CLI test depends on
    the previous stage's files, and xdist may schedule the tests on
    different workers — fixtures make every test self-sufficient)."""
    from qpp_fusion_rag_tpu.pipeline.qpp import main

    out = pipeline_dirs / "qpp"
    assert main(["--runs-dir", str(pipeline_dirs / "runs"),
                 "--output-dir", str(out)]) == 0
    return out


@pytest.fixture(scope="module")
def models_dir(pipeline_dirs, qpp_dir):
    from qpp_fusion_rag_tpu.pipeline.train_fusion import main

    out = pipeline_dirs / "models"
    assert main([
        "--runs-dir", str(pipeline_dirs / "runs"),
        "--qpp-dir", str(qpp_dir),
        "--qrels", str(pipeline_dirs / "qrels.tsv"),
        "--output-dir", str(out),
        "--models", "multioutput",
    ]) == 0
    return out


@pytest.fixture(scope="module")
def fused_dir(pipeline_dirs, qpp_dir, models_dir):
    from qpp_fusion_rag_tpu.pipeline.fuse import main

    out = pipeline_dirs / "fused"
    assert main([
        "--runs-dir", str(pipeline_dirs / "runs"),
        "--qpp-dir", str(qpp_dir),
        "--output-dir", str(out),
        "--method", "all",
        "--models-dir", str(models_dir),
    ]) == 0
    return out


def test_qpp_cli(pipeline_dirs, qpp_dir):
    files = sorted(qpp_dir.glob("*.mmnorm.qpp"))
    assert [f.name for f in files] == [f"r{r}.res.mmnorm.qpp" for r in range(3)]
    lines = files[0].read_text().strip().splitlines()
    assert len(lines) == 40 and len(lines[0].split("\t")) == 14


def test_train_cli(models_dir):
    assert (models_dir / "fusion_multioutput.pkl").exists()
    summary = json.loads((models_dir / "training_summary.json").read_text())
    assert "multioutput" in summary


def test_fuse_cli_all(fused_dir):
    names = {f.stem for f in fused_dir.glob("*.res")}
    assert {"combsum", "combmnz", "rrf", "wcombsum", "wcombmnz", "wrrf",
            "learned_multioutput"} <= names


def test_evaluate_cli(pipeline_dirs, fused_dir):
    from qpp_fusion_rag_tpu.pipeline.evaluate import main

    rc = main(["--fused-dir", str(fused_dir),
               "--qrels", str(pipeline_dirs / "qrels.tsv")])
    assert rc == 0
    comp = json.loads((fused_dir / "comparison_results.json").read_text())
    assert comp["combsum"]["type"] == "unweighted"
    assert comp["wcombsum"]["type"] == "qpp_weighted"
    assert comp["learned_multioutput"]["type"] == "learned"
    # r0 plants both relevant docs at the top of every query -> fusion keeps
    # them ranked well above chance (random nDCG@5 over 120 docs ~ 0.02)
    assert comp["combsum"]["metrics"]["nDCG@5"] > 0.15
