"""CSR layout for RQ cluster -> document buckets.

The reference stores the cluster map as a python dict
``{code-tuple: [docids]}`` plus a ``{docid: code-tuple}`` mapping pickle
(``MEVI/main_models.py:3214-3219``, ``pq.py:200-214``) and does ragged
host-side lookups per beam during inference (``main_models.py:3915-3928``).

Here the same relation is two dense arrays resident in (sharded) HBM:

* ``offsets``: int32 (C+1,), C = K**M leaf clusters,
* ``doc_ids``: int32 (N,), document ids sorted by cluster index,

so a beam's member docs are one ``dynamic_slice``-style padded gather —
no host round-trip, jit-able, shardable.

Cluster index = big-endian radix-K packing of the code tuple:
``idx = ((c0*K + c1)*K + c2)*K + ...``.  (The reference's
``get_cluster_index`` at ``main_models.py:1046-1051`` multiplies by
``subvector_num`` instead of K — a latent bug in an optional feature; we
use the correct radix everywhere and never mix the two.)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class CSRIndex(NamedTuple):
    offsets: jnp.ndarray    # (C + 1,) int32
    doc_ids: jnp.ndarray    # (N,) int32
    levels: int
    kary: int

    @property
    def num_clusters(self) -> int:
        return self.kary ** self.levels

    @property
    def num_docs(self) -> int:
        return int(self.doc_ids.shape[0])


def pack_codes(codes, kary: int):
    """(…, M) codes -> (…,) radix-K cluster indices. Works for np/jnp."""
    xp = jnp if isinstance(codes, jnp.ndarray) else np
    idx = codes[..., 0].astype(xp.int32) * 0
    for i in range(codes.shape[-1]):
        idx = idx * kary + codes[..., i].astype(xp.int32)
    return idx


def unpack_codes(idx, levels: int, kary: int):
    """Inverse of :func:`pack_codes`: (…,) -> (…, M)."""
    xp = jnp if isinstance(idx, jnp.ndarray) else np
    out = []
    rem = idx
    for i in range(levels):
        p = kary ** (levels - 1 - i)
        out.append((rem // p) % kary)
    return xp.stack(out, axis=-1).astype(xp.int32)


def build_csr(codes: np.ndarray, kary: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side CSR build from per-doc codes (N, M).

    Returns (offsets (C+1,) int32, doc_ids (N,) int32 sorted by cluster).
    counting-sort: O(N + C).
    """
    codes = np.asarray(codes)
    n, levels = codes.shape
    C = kary ** levels
    idx = pack_codes(codes, kary).astype(np.int64)
    counts = np.bincount(idx, minlength=C)
    offsets = np.zeros(C + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    order = np.argsort(idx, kind="stable")
    doc_ids = order.astype(np.int32)
    assert offsets[-1] == n
    return offsets.astype(np.int32), doc_ids


def make_index(codes: np.ndarray, kary: int) -> CSRIndex:
    offsets, doc_ids = build_csr(codes, kary)
    levels = codes.shape[-1]
    return CSRIndex(jnp.asarray(offsets), jnp.asarray(doc_ids),
                    levels, kary)


@partial(jax.jit, static_argnames=("cap",))
def gather_bucket(offsets: jnp.ndarray, doc_ids: jnp.ndarray,
                  cluster_idx: jnp.ndarray, cap: int,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Padded member-doc gather for a batch of cluster indices.

    Args:
      cluster_idx: int32 (…,) packed cluster indices.
      cap: static per-cluster doc cap (overflowing docs are dropped; the
        searcher falls back to the full-scan path when a workload needs
        exact coverage of giant clusters — mirroring the reference's
        ``eval_all_documents`` branch, ``main_models.py:3818-3876``).
    Returns:
      (docs (…, cap) int32 with -1 padding, size (…,) int32 true sizes).
    """
    start = offsets[cluster_idx]
    end = offsets[cluster_idx + 1]
    size = end - start
    pos = jnp.arange(cap, dtype=jnp.int32)
    idx = start[..., None] + pos
    valid = pos < size[..., None]
    n = doc_ids.shape[0]
    docs = doc_ids[jnp.clip(idx, 0, n - 1)]
    return jnp.where(valid, docs, -1), size


def cluster_sizes(offsets) -> np.ndarray:
    off = np.asarray(offsets)
    return off[1:] - off[:-1]


def size_histogram(offsets) -> dict:
    """Summary stats used for parity checks against the reference's
    cluster pickles (nonempty count = 'npqclus', main_models.py:4308-4378)."""
    sizes = cluster_sizes(offsets)
    nonempty = sizes[sizes > 0]
    return {
        "num_clusters": int(sizes.size),
        "nonempty": int(nonempty.size),
        "max": int(sizes.max()) if sizes.size else 0,
        "mean_nonempty": float(nonempty.mean()) if nonempty.size else 0.0,
        "p99_nonempty": float(np.percentile(nonempty, 99))
        if nonempty.size else 0.0,
    }
