"""Exact MIPS top-k over an HBM-resident document matrix.

Replaces faiss HNSW/Flat search (``MEVI/faiss_search.py:13-21``) with an
on-device scan: scores are a tiled ``q @ D^T`` (MXU) interleaved with a
running top-k (``lax.scan`` streaming merge), so the full (nq, ndoc) score
matrix never exists in HBM.  Multi-chip: the corpus is row-sharded over the
``corpus`` mesh axis; each shard computes a local top-k and shards'
(score, global-id) pairs are all-gathered and re-merged — the TPU-native
equivalent of the reference's rank-sharded memmap + barrier-merge protocol
(``MEVI/main_models.py:3090-3169``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.mesh import CORPUS_AXIS, DATA_AXIS
from .topk import chunk_ids_clamped, streaming_topk


def _scores(queries: jnp.ndarray, docs: jnp.ndarray,
            dist_mode: str) -> jnp.ndarray:
    """(nq, d) x (nd, d) -> (nq, nd) similarity (higher = better).

    'ip' = inner product; 'l2' = negative squared L2
    (``MEVI/pq.py:124-131``).

    Precision: float32 inputs use HIGHEST (exact fp32 — TPU default would
    silently truncate to bf16); bf16 inputs take the fast single-pass MXU
    path with fp32 accumulation.  Serving stores the corpus in bf16.
    """
    if docs.dtype == jnp.int8:     # quantized corpus: upcast per chunk
        docs = docs.astype(queries.dtype)
    precision = (jax.lax.Precision.HIGHEST
                 if queries.dtype == jnp.float32 else
                 jax.lax.Precision.DEFAULT)
    ip = jax.lax.dot_general(
        queries, docs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)
    if dist_mode == "ip":
        return ip
    q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, -1, keepdims=True)
    d_sq = jnp.sum(docs.astype(jnp.float32) ** 2, -1)[None, :]
    return 2.0 * ip - q_sq - d_sq


@partial(jax.jit, static_argnames=("k", "chunk", "dist_mode"))
def mips_topk(queries: jnp.ndarray, docs: jnp.ndarray, k: int,
              chunk: int = 8192, dist_mode: str = "ip",
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k MIPS on a single shard.

    Args:
      queries: (nq, d).
      docs: (nd, d) — the local corpus shard.
      k: pool size (<= nd after padding).
      chunk: docs scored per scan step.
    Returns:
      (scores (nq, k), ids (nq, k)) with ids local to ``docs`` rows.
    """
    nq, d = queries.shape
    nd = docs.shape[0]
    chunk = min(chunk, nd)
    k = min(k, nd)
    num_chunks = -(-nd // chunk)

    def score_chunk(c):
        start, ids = chunk_ids_clamped(c, chunk, nd)
        block = jax.lax.dynamic_slice_in_dim(docs, start, chunk, axis=0)
        return _scores(queries, block, dist_mode), ids

    return streaming_topk(score_chunk, num_chunks, k, (nq,))


def sharded_mips_topk(queries: jnp.ndarray, docs_sharded: jnp.ndarray,
                      k: int, mesh: Mesh, chunk: int = 8192,
                      dist_mode: str = "ip",
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a corpus row-sharded across the ``corpus`` axis.

    ``docs_sharded`` has global shape (nd, d) sharded as P(corpus, None);
    queries are replicated along corpus (and may be sharded along data).
    Per-shard local top-k (with global ids) is all-gathered over ICI and
    merged — one program, no host round-trip.
    """
    n_corpus = mesh.shape[CORPUS_AXIS]
    nd = docs_sharded.shape[0]
    shard_rows = nd // n_corpus

    def local(queries, docs):
        scores, ids = mips_topk(queries, docs, k, chunk=chunk,
                                dist_mode=dist_mode)
        shard = jax.lax.axis_index(CORPUS_AXIS)
        ids = jnp.where(ids >= 0, ids + shard * shard_rows, ids)
        # gather all shards' candidates: (n_corpus, nq, k)
        all_scores = jax.lax.all_gather(scores, CORPUS_AXIS)
        all_ids = jax.lax.all_gather(ids, CORPUS_AXIS)
        nq = scores.shape[0]
        all_scores = jnp.moveaxis(all_scores, 0, 1).reshape(nq, -1)
        all_ids = jnp.moveaxis(all_ids, 0, 1).reshape(nq, -1)
        top_scores, pos = jax.lax.top_k(all_scores, k)
        return top_scores, jnp.take_along_axis(all_ids, pos, axis=-1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(CORPUS_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False)
    return fn(queries, docs_sharded)
