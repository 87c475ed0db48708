"""Batched k-means on TPU.

Replaces the reference's rank0-only CPU sklearn MiniBatchKMeans over
8.8M x 768 embeddings (``MEVI/pq.py:550-598`` — hours per RQ level) with
full-batch Lloyd iterations on device:

* assign: one (N, d) x (d, K) matmul per chunk (MXU) + argmax,
* update: one-hot^T @ x segment-sum, also a matmul (MXU),
* k-means++ seeding by D² sampling,
* empty clusters restart at the point farthest from its centroid
  (the EMA path's dead-code restart idea, ``pq.py:404-424``).

All steps are chunked ``lax.scan`` bodies so the N x K score matrix never
materializes, and partial stats can be ``psum``-ed over a corpus-sharded
mesh axis (replacing ``dist.broadcast`` of rank0 results,
``pq.py:483-486``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .topk import chunk_ids_clamped


def _sim(x: jnp.ndarray, c: jnp.ndarray, dist_mode: str) -> jnp.ndarray:
    """(n, d) x (k, d) -> (n, k) similarity; higher = closer.

    'ip': inner product (pq.py compute_scores with dist_mode='ip');
    'l2': -||x-c||^2 expanded as 2 x.c - ||c||^2 (- ||x||^2 dropped:
    constant per row, argmax unchanged).
    """
    precision = (jax.lax.Precision.HIGHEST
                 if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    ip = jax.lax.dot_general(
        x, c, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)
    if dist_mode == "ip":
        return ip
    c_sq = jnp.sum(c.astype(jnp.float32) ** 2, axis=-1)[None, :]
    return 2.0 * ip - c_sq


@partial(jax.jit, static_argnames=("dist_mode", "chunk"))
def kmeans_assign(x: jnp.ndarray, centroids: jnp.ndarray,
                  dist_mode: str = "l2", chunk: int = 65536,
                  ) -> jnp.ndarray:
    """Nearest-centroid assignment, chunked over rows. Returns int32 (n,)."""
    n = x.shape[0]
    chunk = min(chunk, n)
    num_chunks = -(-n // chunk)
    out = jnp.zeros((n,), jnp.int32)

    def body(out, cidx):
        start, ids = chunk_ids_clamped(cidx, chunk, n)
        block = jax.lax.dynamic_slice_in_dim(x, start, chunk, 0)
        a = jnp.argmax(_sim(block, centroids, dist_mode), axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(
            out, a.astype(jnp.int32), start, 0), None

    out, _ = jax.lax.scan(body, out, jnp.arange(num_chunks))
    return out


@partial(jax.jit, static_argnames=("k", "chunk"))
def kmeans_stats(x: jnp.ndarray, assign: jnp.ndarray, k: int,
                 chunk: int = 65536,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cluster (sum, count) via one-hot matmuls, chunked.

    Returns (sums (k, d) fp32, counts (k,) fp32).  On a sharded mesh the
    caller psums these partials.
    """
    n, d = x.shape
    chunk = min(chunk, n)
    num_chunks = -(-n // chunk)
    init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32))

    def body(carry, cidx):
        sums, counts = carry
        start, ids = chunk_ids_clamped(cidx, chunk, n)
        valid = (ids >= 0).astype(jnp.float32)
        block = jax.lax.dynamic_slice_in_dim(x, start, chunk, 0)
        a = jax.lax.dynamic_slice_in_dim(assign, start, chunk, 0)
        onehot = jax.nn.one_hot(a, k, dtype=jnp.float32) * valid[:, None]
        sums = sums + jax.lax.dot_general(
            onehot, block.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0)
        return (sums, counts), None

    (sums, counts), _ = jax.lax.scan(body, init, jnp.arange(num_chunks))
    return sums, counts


@partial(jax.jit, static_argnames=("k", "dist_mode", "candidates"))
def kmeans_plusplus_init(x: jnp.ndarray, k: int, key: jax.Array,
                         dist_mode: str = "l2",
                         candidates: int = 8) -> jnp.ndarray:
    """k-means++ seeding with D² sampling (sklearn-style, greedy over a
    few candidates per round).  O(k · n · d) — fine for k <= 256.

    Row selection uses one-hot matmuls instead of gathers: big-table row
    gathers are pathological on some TPU stacks, while an (m, n) x (n, d)
    matmul rides the MXU.
    """
    n, d = x.shape
    xf = x.astype(jnp.float32)

    def take_rows(idx):
        onehot = jax.nn.one_hot(idx, n, dtype=jnp.float32)   # (m, n)
        return jax.lax.dot_general(
            onehot, xf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    key, sub = jax.random.split(key)
    first = take_rows(jax.random.randint(sub, (1,), 0, n))[0]
    centroids = jnp.zeros((k, d), jnp.float32).at[0].set(first)

    diff0 = xf - first[None, :]
    d2 = jnp.sum(diff0 * diff0, axis=-1)

    def body(i, carry):
        centroids, d2, key = carry
        key, sub = jax.random.split(key)
        # sample `candidates` new centers ∝ d2, keep the one that reduces
        # total potential most
        logits = jnp.log(jnp.maximum(d2, 1e-20))
        cand_idx = jax.random.categorical(sub, logits, shape=(candidates,))
        cand = take_rows(cand_idx)                           # (c, d)
        diff = xf[None, :, :] - cand[:, None, :]
        cand_d2 = jnp.minimum(jnp.sum(diff * diff, -1), d2[None, :])
        pots = jnp.sum(cand_d2, axis=-1)
        best = jnp.argmin(pots)
        centroids = centroids.at[i].set(cand[best])
        return centroids, cand_d2[best], key

    centroids, _, _ = jax.lax.fori_loop(1, k, body, (centroids, d2, key))
    return centroids.astype(x.dtype)


def kmeans_fit(
    x: jnp.ndarray,
    k: int,
    iters: int = 25,
    key: Optional[jax.Array] = None,
    dist_mode: str = "l2",
    chunk: int = 65536,
    init_centroids: Optional[jnp.ndarray] = None,
    init_sample: int = 262144,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-batch Lloyd k-means. Returns (centroids (k, d), assign (n,)).

    k-means++ runs on a row subsample (``init_sample``) — the same
    trade-off sklearn MiniBatchKMeans makes — then Lloyd runs on all rows.
    Empty clusters are re-seeded from the rows worst-served by their
    current centroid.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = x.shape[0]
    if init_centroids is None:
        key, sub, sub2 = jax.random.split(key, 3)
        if n > init_sample:
            # subsample via a few contiguous random chunks — a 262k-row
            # gather from a corpus-sized table is pathological on some
            # TPU stacks, contiguous slices are free
            n_chunks = 8
            clen = init_sample // n_chunks
            starts = jax.random.randint(sub2, (n_chunks,), 0, n - clen)
            seed_x = jnp.concatenate(
                [jax.lax.dynamic_slice_in_dim(x, starts[i], clen, 0)
                 for i in range(n_chunks)], axis=0)
        else:
            seed_x = x
        centroids = kmeans_plusplus_init(seed_x, k, sub, dist_mode)
    else:
        centroids = init_centroids

    @partial(jax.jit, static_argnames=("k_", "dist_mode_", "chunk_"))
    def step(x, centroids, key, k_, dist_mode_, chunk_):
        # x passed as an argument: closing over it would bake a
        # corpus-sized constant into the executable
        assign = kmeans_assign(x, centroids, dist_mode_, chunk_)
        sums, counts = kmeans_stats(x, assign, k_, chunk_)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # dead clusters: re-seed from contiguous random slices
        # (row gathers on corpus-sized tables are pathological on some
        # TPU stacks; a dynamic slice of k rows is equivalent here)
        key, sub = jax.random.split(key)
        start = jax.random.randint(sub, (), 0, x.shape[0] - k_)
        restart = jax.lax.dynamic_slice_in_dim(
            x, start, k_, 0).astype(jnp.float32)
        empty = (counts < 0.5)[:, None]
        new = jnp.where(empty, restart, new)
        return new.astype(x.dtype), key

    for _ in range(iters):
        centroids, key = step(x, centroids, key, k, dist_mode, chunk)
    assign = kmeans_assign(x, centroids, dist_mode, chunk)
    return centroids, assign
