"""StageTimer + structured timing records."""

import json


def test_stage_timer(tmp_path):
    from qpp_fusion_rag_tpu.utils.profiling import StageTimer

    jl = tmp_path / "timing.jsonl"
    t = StageTimer(jsonl_path=jl, verbose=False)
    with t.stage("retrieve", items=100, retriever="bm25"):
        pass
    with t.stage("fuse"):
        pass
    with t.stage("retrieve", items=50):
        pass
    assert len(t.records) == 3
    assert t.records[0].per_second is not None
    s = t.summary()
    assert set(s) == {"retrieve", "fuse"}
    lines = [json.loads(l) for l in jl.read_text().splitlines()]
    assert lines[0]["stage"] == "retrieve" and lines[0]["retriever"] == "bm25"


def test_block_and_time():
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.utils.profiling import block_and_time

    out, dt = block_and_time(lambda x: x * 2, jnp.ones((4,)))
    assert dt >= 0
    assert float(out[0]) == 2.0


def test_device_trace(tmp_path):
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.utils.profiling import device_trace

    with device_trace(tmp_path / "trace"):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    produced = list((tmp_path / "trace").rglob("*"))
    assert produced, "no trace files written"

    with device_trace(tmp_path / "off", enabled=False):
        pass
    assert not (tmp_path / "off").exists()
