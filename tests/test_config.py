import pytest
import os

from qpp_fusion_rag_tpu.config import Config, config, detect_dataset


def test_defaults_load():
    assert config.qpp.n_methods == 13
    assert list(config.qpp.methods)[:3] == ["nqc", "smv", "wig"]
    assert config.qpp.default_index == 5
    assert config.fusion.rrf_k == 60
    assert config.tpu.dense.chunk_docs > 0


def test_env_expansion(tmp_path, monkeypatch):
    p = tmp_path / "c.yaml"
    p.write_text("a: '${MY_TEST_VAR:fallback}'\nb: '${MY_TEST_VAR2}'\nroot: '${PROJECT_ROOT}/x'\n")
    monkeypatch.delenv("MY_TEST_VAR", raising=False)
    c = Config.load(p)
    assert c.a == "fallback"
    assert c.b == "${MY_TEST_VAR2}"  # unresolved, no default
    assert c.root.endswith("/x") and "${" not in c.root

    monkeypatch.setenv("MY_TEST_VAR", "live")
    c = Config.load(p)
    assert c.a == "live"


def test_nested_default_expansion(tmp_path, monkeypatch):
    p = tmp_path / "c.yaml"
    p.write_text("a: '${OUTER_X:${PROJECT_ROOT}/inner}'\n")
    monkeypatch.delenv("OUTER_X", raising=False)
    c = Config.load(p)
    assert c.a.endswith("/inner") and "${" not in c.a


def test_qpp_index_resolution():
    # names resolve to the KERNEL column layout (qpp.methods order) — the
    # reference's method_index table indexes a different file layout
    assert config.get_qpp_index("RSD") == 5
    assert config.get_qpp_index("UEF") == 6
    assert config.get_qpp_index("NQC") == 0
    assert config.get_qpp_index("fusion") == -1
    for bad in ("nope", "BERTQPP"):   # BERTQPP: reference-only, no kernel column
        try:
            config.get_qpp_index(bad)
            assert False
        except KeyError:
            pass


def test_readonly():
    try:
        config.qpp.n_methods = 5  # type: ignore[misc]
        assert False
    except AttributeError:
        pass


def test_detect_dataset():
    assert detect_dataset("/data/nq/runs") == "nq"
    assert detect_dataset("/x/BEIR-scifact/corpus.jsonl") == "scifact"
    assert detect_dataset("/tmp/other") is None


def test_overrides():
    c = Config.load(overrides={"qpp": {"default_index": 3}})
    assert c.qpp.default_index == 3
    assert c.qpp.n_methods == 13


def test_expand_cycle_raises(monkeypatch):
    """Self-referential env placeholders must fail loudly, not hang import."""
    from qpp_fusion_rag_tpu.config import _expand

    with pytest.raises(ValueError, match="did not converge"):
        _expand("${LOOPVAR}", {"LOOPVAR": "x${LOOPVAR}"})


def test_packaged_defaults_in_sync():
    """The wheel-packaged defaults.yaml must match the repo config copy."""
    from pathlib import Path

    import qpp_fusion_rag_tpu

    pkg = Path(qpp_fusion_rag_tpu.__file__).parent / "defaults.yaml"
    repo = Path(qpp_fusion_rag_tpu.__file__).parents[1] / "config" / "defaults.yaml"
    if repo.exists():
        assert pkg.read_text() == repo.read_text(), (
            "config/defaults.yaml and qpp_fusion_rag_tpu/defaults.yaml drifted; "
            "copy the repo file over the packaged one"
        )


def test_detect_dataset_no_substring_false_positive():
    from qpp_fusion_rag_tpu.config import detect_dataset

    assert detect_dataset("/home/tanq/scifact_runs.d") == "scifact"
    assert detect_dataset("/home/tanq/other") is None
    assert detect_dataset("/data/BEIR-nq/runs") == "nq"


def test_qpp_index_reference_layout():
    # reference-produced .qpp files keep the reference's column table
    assert config.get_qpp_index("RSD", layout="reference") == 5
    assert config.get_qpp_index("UEF", layout="reference") == 4
    assert config.get_qpp_index("BERTQPP", layout="reference") == 12
    assert config.get_qpp_index("fusion", layout="reference") == -1
