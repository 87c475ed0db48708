"""Pallas bucket-scoring kernel: the fine-rerank hot path.

Scores every document in a set of CSR buckets against its query without
an XLA row-gather.  Cluster members are contiguous rows of the
cluster-sorted embedding matrix (see ``eval/searcher.py``), so each
(query, beam) needs one contiguous ``cap x d`` slice — expressed here as
explicit async DMAs from HBM into VMEM (8 buckets per grid step, DMAs
issued in parallel), then one VPU reduction per bucket.

XLA's gather lowering on big tables compiles (and runs) pathologically
for this access pattern; contiguous dynamic slices are exactly what the
DMA engine wants.  Mosaic requires HBM slice starts divisible by the
sublane tile (8), so starts are aligned down — the caller's validity
mask (slot maps into [bucket_start, bucket_end)) absorbs the shift.

Contract:
  semb    (N, d)  embeddings in CSR row order, N a multiple of 8 and
          padded with >= cap extra rows.
  starts  (G,) int32 aligned slice starts, multiples of 8 in
          [0, N - cap]; G a multiple of 8 (pad with zeros).
  qemb    (G, d) per-row query vector (query replicated across beams).
Returns:
  scores (G, cap) float32 of rows [start, start + cap); row identity is
  reconstructed by the caller as ``start + slot`` (no id table in the
  kernel — the original-doc-id mapping is a small post-top-k gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8      # buckets per grid step (sublane alignment)
ALIGN = 8     # HBM slice start alignment proved to Mosaic


def _kernel(starts_ref, q_ref, semb_ref, out_ref, emb_buf, sems, *,
            cap: int):
    g = pl.program_id(0)

    def dma(r):
        s = pl.multiple_of(starts_ref[g * ROWS + r], ALIGN)
        return pltpu.make_async_copy(
            semb_ref.at[pl.ds(s, cap), :], emb_buf.at[r], sems.at[r])

    for r in range(ROWS):
        dma(r).start()
    for r in range(ROWS):
        dma(r).wait()

    q = q_ref[...].astype(jnp.float32)                   # (ROWS, d)
    block = emb_buf[...].astype(jnp.float32)             # (ROWS, cap, d)
    out_ref[...] = jnp.einsum("rcd,rd->rc", block, q,
                              preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("cap",))
def bucket_scores(semb: jnp.ndarray, starts: jnp.ndarray,
                  qemb: jnp.ndarray, cap: int) -> jnp.ndarray:
    """See module docstring: (G,) aligned starts -> (G, cap) scores."""
    G, d = qemb.shape
    assert G % ROWS == 0, f"pad bucket count to a multiple of {ROWS}"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, d), lambda g, s: (g, 0),
                         memory_space=pltpu.VMEM),      # qemb rows
            pl.BlockSpec(memory_space=pltpu.ANY),       # semb (HBM)
        ],
        out_specs=pl.BlockSpec((ROWS, cap), lambda g, s: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ROWS, cap, d), semb.dtype),
            pltpu.SemaphoreType.DMA((ROWS,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, cap=cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, cap), jnp.float32),
    )(starts, qemb, semb)


def bucket_scores_reference(semb, starts, qemb, cap) -> jnp.ndarray:
    """XLA fallback (gather-based) with identical semantics — used on CPU
    and as the kernel's test oracle."""
    pos = jnp.arange(cap, dtype=jnp.int32)
    rows = jnp.clip(starts[:, None] + pos, 0, semb.shape[0] - 1)
    block = semb[rows]                                  # (G, cap, d)
    return jnp.einsum("gd,gcd->gc", qemb.astype(jnp.float32),
                      block.astype(jnp.float32))


def align_down(x, align: int = ALIGN):
    return (x // align) * align
