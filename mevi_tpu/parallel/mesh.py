"""Device mesh + sharding helpers.

The reference runs DP via pytorch-lightning DDP / mp.spawn + NCCL
(``MEVI/main.py:58-87,289-337``) and 'gathers' large per-rank results
through a barrier-and-merge file protocol (``MEVI/main_models.py:190-330``).
Here a single jit program runs over a 2-D mesh:

* ``data``   — shards query batches (replaces DDP/DistributedSampler),
* ``corpus`` — shards the document-embedding matrix, CSR buckets and all
  corpus-wide jobs; per-shard top-k results are merged with
  ``all_gather`` over ICI instead of files (SURVEY.md §5.8).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
CORPUS_AXIS = "corpus"


def make_mesh(n_devices: Optional[int] = None,
              corpus: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, corpus) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % corpus == 0, (n, corpus)
    grid = np.asarray(devices).reshape(n // corpus, corpus)
    return Mesh(grid, (DATA_AXIS, CORPUS_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(n_devices=1)


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batch-sharded along the data axis, replicated elsewhere."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def corpus_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Corpus-row-sharded along the corpus axis."""
    spec = P(CORPUS_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(x, mesh: Mesh, axis: str = CORPUS_AXIS):
    """Place a host array row-sharded on the mesh (pads rows to divide)."""
    size = mesh.shape[axis]
    n = x.shape[0]
    pad = (-n) % size
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host setup (replaces ``init_process_group('nccl')``,
    ``main.py:312-313``): one call per host before any jax op; all
    hosts' devices then appear in ``jax.devices()`` and a global Mesh
    spans them.  No-ops under a single process with env autodetection.
    """
    import jax
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)


@contextmanager
def virtual_cpu_devices(count: int = 8):
    """Force a virtual multi-device CPU backend (tests / dryrun only).

    Must run before jax initializes a backend; callers in tests set
    XLA_FLAGS in conftest instead — this helper is for standalone scripts.
    """
    old = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        old + f" --xla_force_host_platform_device_count={count}")
    try:
        yield
    finally:
        os.environ["XLA_FLAGS"] = old
