"""Device mesh construction and sharding helpers.

The framework's two logical axes (config `tpu.mesh.axes`):

  * ``data``   — query-batch data parallelism,
  * ``corpus`` — corpus-dimension sharding (the retrieval analogue of tensor
                 parallelism: the embedding matrix / impact lists are split
                 over chips, partial top-k's merge over ICI).

The reference is single-host and shards the corpus only as sequential HNSW
segments (reference src/indexing/hnsw.py:64-202, src/retrievers/bge.py:196-237);
here the same split becomes a physical mesh axis with XLA collectives doing
the merge.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
CORPUS_AXIS = "corpus"


def build_mesh(
    n_data: Optional[int] = None,
    n_corpus: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, corpus) mesh over the available devices.

    Defaults: all devices on the corpus axis (retrieval is corpus-bound),
    data axis 1. Either count may be -1/None meaning "all remaining".
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data in (None, -1) and n_corpus in (None, -1):
        n_data, n_corpus = 1, n
    elif n_data in (None, -1):
        n_data = n // n_corpus
    elif n_corpus in (None, -1):
        n_corpus = n // n_data
    if n_data * n_corpus != n:
        raise ValueError(f"mesh {n_data}x{n_corpus} != {n} devices")
    arr = np.array(devices).reshape(n_data, n_corpus)
    return Mesh(arr, (DATA_AXIS, CORPUS_AXIS))


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Rows of [N, D] split over the corpus axis, replicated over data."""
    return NamedSharding(mesh, P(CORPUS_AXIS, None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Rows of [B, ...] split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> Tuple[np.ndarray, int]:
    """Pad axis to a multiple (for even sharding); returns (padded, orig_len)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = np.pad(x, widths)
    return x, n
