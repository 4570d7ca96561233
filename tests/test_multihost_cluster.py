"""init_distributed exercised against a REAL 2-process jax.distributed
cluster on CPU (VERDICT r3 task #8): two subprocesses share a local
coordinator, initialize through parallel.multihost.init_distributed, and
assert global device visibility and host_local_corpus_slice disjointness.
Also pins the "no backend touch before initialize" ordering invariant.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the `-m "not slow"` fast tier



def _clean_env():
    """Subprocess env without the axon TPU-tunnel hooks: the image's
    sitecustomize registers a PJRT plugin at interpreter start, which
    counts as 'touching the backend' and makes jax.distributed.initialize
    raise. Real multi-host launches don't run under the tunnel shim."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("TPU_WORKER_HOSTNAMES", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_WORKER = textwrap.dedent("""
    import sys
    # CPU platform BEFORE any backend touch; do NOT call jax.devices()
    # until after init_distributed (the ordering invariant under test)
    import jax
    jax.config.update("jax_platforms", "cpu")

    addr, pid = sys.argv[1], int(sys.argv[2])
    from qpp_fusion_rag_tpu.parallel.multihost import (
        host_local_corpus_slice, init_distributed)

    init_distributed(coordinator_address=addr, num_processes=2,
                     process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 2 * n_local, (n_global, n_local)
    start, stop = host_local_corpus_slice(1000)
    print(f"OK pid={pid} devices={n_global} slice={start}:{stop}")
""")


def test_two_process_cluster_initializes():
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd="/root/repo", env=_clean_env())
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process cluster init timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
    slices = sorted(line.split("slice=")[1]
                    for rc, out, _ in outs for line in out.splitlines()
                    if "OK pid=" in line)
    # ceil(1000/2)=500 rows per process, disjoint cover
    assert slices == ["0:500", "500:1000"], slices


def test_early_backend_touch_is_detected():
    """init_distributed documents that touching the backend first breaks
    initialize(); pin that a pre-touched backend + explicit cluster args
    raises instead of silently running single-host."""
    code = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.devices()   # the forbidden early touch
        from qpp_fusion_rag_tpu.parallel.multihost import init_distributed
        try:
            init_distributed(coordinator_address="127.0.0.1:1",
                             num_processes=2, process_id=0)
        except Exception as e:
            print("RAISED", type(e).__name__)
        else:
            print("NO-RAISE")
    """)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120, cwd="/root/repo",
                       env=_clean_env())
    assert r.returncode == 0, r.stderr
    assert "RAISED" in r.stdout, r.stdout
