"""Test harness: force an 8-device virtual CPU mesh BEFORE jax import.

Multi-chip sharding logic is exercised without hardware via XLA's host-platform
device emulation (SURVEY.md §4: `--xla_force_host_platform_device_count=N`).
Must run before anything imports jax, hence module-level in conftest.
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (e.g. a real-TPU tunnel):
# tests must be fast, deterministic (f32 matmuls), and exercise an 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# jax may already be imported by the interpreter's sitecustomize (with a
# hardware backend registered); env vars alone are then too late. The config
# override below is honored as long as no backend has been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_mesh():
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()).reshape(2, 4)
    return Mesh(devs, ("data", "corpus"))


@pytest.fixture()
def tmp_dataset(tmp_path):
    """A tiny synthetic BEIR-style dataset on disk."""
    import json

    ds = tmp_path / "toy"
    (ds / "qrels").mkdir(parents=True)
    docs = [
        {"_id": f"d{i}", "title": f"title {i}", "text": f"body text number {i} alpha beta"}
        for i in range(20)
    ]
    with open(ds / "corpus.jsonl", "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    queries = [{"_id": str(i), "text": f"query about number {i}"} for i in range(1, 6)]
    with open(ds / "queries.jsonl", "w") as f:
        for q in queries:
            f.write(json.dumps(q) + "\n")
    with open(ds / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for i in range(1, 6):
            f.write(f"{i}\td{i}\t1\n")
            f.write(f"{i}\td{i + 5}\t2\n")
    return ds
