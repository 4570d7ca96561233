"""End-to-end synthetic demo: the full pipeline must reproduce the paper's
ordering (QPP-weighted and learned fusion beat unweighted; oracle bounds)."""

import json
import pytest
pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



def test_demo_pipeline(tmp_path):
    from qpp_fusion_rag_tpu.pipeline.demo import main

    rc = main(["--workdir", str(tmp_path / "demo"),
               "--queries", "45", "--docs", "900", "--retrievers", "3"])
    assert rc == 0
    comp = json.loads((tmp_path / "demo" / "fused" / "comparison_results.json").read_text())
    nd = {k: v["metrics"]["nDCG@5"] for k, v in comp.items()}
    oracle = json.loads((tmp_path / "demo" / "oracle_report.json").read_text())

    assert nd["wcombsum"] > nd["combsum"] + 0.2, nd
    assert nd["learned_mlp"] > nd["combsum"] + 0.2, nd
    assert nd["learned_multioutput"] > nd["combsum"] + 0.2, nd
    assert oracle["oracle_metric"] >= max(nd.values()) - 0.05
