"""Streaming / merged top-k utilities.

The reference keeps a running top-k while scanning score chunks
(``MEVI/main_models.py:3869-3876``): concat new chunk scores onto the
running pool, ``torch.topk``, gather ids.  Here the same pattern is a
``lax.scan`` so XLA keeps everything on device, and a 2-way merge is used
to combine per-shard results after ``all_gather``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def merge_topk(scores_a: jnp.ndarray, ids_a: jnp.ndarray,
               scores_b: jnp.ndarray, ids_b: jnp.ndarray,
               k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two (…, m) score/id sets into top-k (…, k)."""
    scores = jnp.concatenate([scores_a, scores_b], axis=-1)
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    top_scores, pos = jax.lax.top_k(scores, k)
    return top_scores, jnp.take_along_axis(ids, pos, axis=-1)


def streaming_topk(
    score_chunk_fn: Callable[[jnp.ndarray],
                             Tuple[jnp.ndarray, jnp.ndarray]],
    num_chunks: int,
    k: int,
    batch_shape: Tuple[int, ...],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over items scored lazily in ``num_chunks`` chunks.

    Args:
      score_chunk_fn: maps a chunk index (int32 scalar) ->
        (scores (*batch_shape, chunk), ids (chunk,)). Entries with id < 0
        are treated as invalid and masked.
      num_chunks: static chunk count.
      k: pool size.
      batch_shape: leading shape of the scores.
    """
    def init(m):
        return (jnp.full(batch_shape + (m,), NEG_INF, jnp.float32),
                jnp.full(batch_shape + (m,), -1, jnp.int32))

    def body(carry, c):
        run_scores, run_ids = carry
        scores, ids = score_chunk_fn(c)
        scores = jnp.where(ids >= 0, scores.astype(jnp.float32), NEG_INF)
        bcast_ids = jnp.broadcast_to(ids, batch_shape + (ids.shape[-1],))
        return merge_topk(run_scores, run_ids, scores, bcast_ids, k), None

    (scores, ids), _ = jax.lax.scan(
        body, init(k), jnp.arange(num_chunks))
    return scores, ids


def chunk_ids_clamped(c: jnp.ndarray, chunk: int, num_items: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chunk start + ids for scanning ``num_items`` rows with
    ``dynamic_slice`` semantics (which clamps the start so the slice stays
    in-bounds).  Returns (clamped_start, ids) where overlap rows — already
    scored by the previous chunk — carry id -1 so they are masked.
    """
    requested = c * chunk
    start = jnp.minimum(requested, max(num_items - chunk, 0))
    offs = jnp.arange(chunk, dtype=jnp.int32)
    ids = start + offs
    # rows before the requested start were scored by an earlier chunk;
    # rows past num_items (only when num_items < chunk) are padding.
    valid = (ids >= requested) & (ids < num_items)
    return start, jnp.where(valid, ids, -1)
