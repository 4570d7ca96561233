"""Multi-host (DCN) initialization helpers.

Single-host meshes come from `parallel.mesh.build_mesh`; for pods the JAX
distributed runtime must initialize first so `jax.devices()` spans all
hosts. Corpus sharding then works unchanged: rows split over the global
`corpus` axis (DCN between hosts, ICI within), and each host feeds its
local corpus shard via `host_local_corpus_slice`.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

# Environment markers that indicate a multi-process launch. After a FAILED
# jax.distributed.initialize(), jax.process_count() is always 1, so it cannot
# distinguish "truly single-host" from "multi-host that failed to init" —
# these env hints can.
_CLUSTER_ADDR_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def _cluster_env_detected() -> bool:
    if any(os.environ.get(v) for v in _CLUSTER_ADDR_VARS):
        return True
    # Set on every TPU VM (single-host: one name); multi-host iff several.
    if "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""):
        return True
    for v in ("SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
        val = os.environ.get(v, "")
        if val.isdigit() and int(val) > 1:
            return True
    return False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed. MUST run before any other JAX call —
    touching the backend first (even jax.process_count()) makes
    initialize() raise unconditionally, so no backend probe happens here.

    With no arguments, relies on the cluster environment (TPU pod metadata
    / JAX_COORDINATOR_ADDRESS etc.) per jax.distributed.initialize().
    """
    kwargs = {}
    if coordinator_address:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    explicit_cluster = bool(kwargs)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return
        if explicit_cluster or _cluster_env_detected():
            # A configured multi-process launch that fails to initialize must
            # surface — silently running single-host corrupts corpus sharding
            # (every host would load the same host_local_corpus_slice).
            raise
        # Ad-hoc single-process use (e.g. under a test harness that already
        # touched the backend): benign, nothing to initialize.
        return
    except ValueError:
        # initialize() found no cluster configuration. Benign only when the
        # environment shows no multi-process launch markers.
        if explicit_cluster or _cluster_env_detected():
            raise


def host_local_corpus_slice(n_docs: int, mesh=None) -> Tuple[int, int]:
    """Row range [start, stop) of the global corpus this host should load
    and place into its shard of a corpus-sharded array.

    With a mesh, the range is derived from where this host's devices sit
    along the CORPUS axis — correct for ANY (data, corpus) factorization.
    A bare process split (mesh=None) is only correct when the corpus axis
    maps 1:1 onto processes; with a multi-host DATA axis (n_data spanning
    hosts) every host's devices cover the full corpus axis and the
    process split would hand each host the wrong row range — pass the
    mesh in that case (the returned range is the tight span of this
    host's corpus positions; non-contiguous placements get a superset)."""
    if mesh is not None:
        import numpy as np

        from qpp_fusion_rag_tpu.parallel.mesh import CORPUS_AXIS

        n_shards = mesh.shape[CORPUS_AXIS]
        per = -(-n_docs // n_shards)
        ci = list(mesh.axis_names).index(CORPUS_AXIS)
        local = set(mesh.local_devices)
        positions = {
            pos[ci] for pos in np.ndindex(mesh.devices.shape)
            if mesh.devices[pos] in local
        }
        if not positions:
            return 0, 0
        start = min(min(positions) * per, n_docs)
        return start, min((max(positions) + 1) * per, n_docs)
    p = jax.process_index()
    n = jax.process_count()
    per = -(-n_docs // n)
    start = min(p * per, n_docs)
    return start, min(start + per, n_docs)
