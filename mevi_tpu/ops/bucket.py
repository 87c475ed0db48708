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
            pl.BlockSpec(memory_space=pl.ANY),       # semb (HBM)
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


# ---------------------------------------------------------------------------
# fused variant: CSR offsets lookup inside the kernel
# ---------------------------------------------------------------------------

def _fused_kernel(cidx_ref, q_ref, off_ref, semb_ref, out_ref, row_ref,
                  emb_buf, off_buf, sems, off_sems, *, cap: int,
                  neg: float):
    g = pl.program_id(0)

    # 1) DMA the offsets rows covering cidx and cidx+1 for each bucket
    for r in range(ROWS):
        ci = cidx_ref[g * ROWS + r]
        row = ci // 128
        arow = pl.multiple_of((row // ALIGN) * ALIGN, ALIGN)
        pltpu.make_async_copy(off_ref.at[pl.ds(arow, 2 * ALIGN), :],
                              off_buf.at[r], off_sems.at[r]).start()
    for r in range(ROWS):
        ci = cidx_ref[g * ROWS + r]
        row = ci // 128
        arow = pl.multiple_of((row // ALIGN) * ALIGN, ALIGN)
        pltpu.make_async_copy(off_ref.at[pl.ds(arow, 2 * ALIGN), :],
                              off_buf.at[r], off_sems.at[r]).wait()

    # 2) read bucket bounds (dynamic VMEM lane indexing is not a thing —
    #    extract scalars with masked reductions), start embedding DMAs
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * ALIGN, 128), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * ALIGN, 128), 1)

    starts = []
    ends = []
    for r in range(ROWS):
        ci = cidx_ref[g * ROWS + r]
        # ci+1 may live in the next 128-row block only when
        # rem(ci,128)==127; arow covers rows [arow, arow+15] and
        # row(ci) - arow <= 7, so row(ci+1) - arow <= 8 < 16: in-buffer.
        base_arow = ((ci // 128) // ALIGN) * ALIGN

        def read_rel(flat_idx):
            row = flat_idx // 128
            col = jax.lax.rem(flat_idx, 128)
            sub = row - base_arow
            hit = (sub_iota == sub) & (lane_iota == col)
            return jnp.sum(jnp.where(hit, off_buf[r], 0))

        s = read_rel(ci)
        e = read_rel(ci + 1)
        starts.append(s)
        ends.append(e)
        al = pl.multiple_of((s // ALIGN) * ALIGN, ALIGN)
        pltpu.make_async_copy(semb_ref.at[pl.ds(al, cap), :],
                              emb_buf.at[r], sems.at[r]).start()

    # 3) score + mask per bucket as its DMA lands
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    for r in range(ROWS):
        s, e = starts[r], ends[r]
        al = pl.multiple_of((s // ALIGN) * ALIGN, ALIGN)
        pltpu.make_async_copy(semb_ref.at[pl.ds(al, cap), :],
                              emb_buf.at[r], sems.at[r]).wait()
        q = q_ref[r, :].astype(jnp.float32)
        block = emb_buf[r].astype(jnp.float32)          # (cap, d)
        sc = jnp.sum(block * q[None, :], axis=-1)[None, :]
        rows = al + slot                                 # (1, cap)
        ok = (rows >= s) & (rows < e)
        out_ref[r, :] = jnp.where(ok, sc, neg)[0]
        row_ref[r, :] = jnp.where(ok, rows, -1)[0]


@functools.partial(jax.jit, static_argnames=("cap",))
def bucket_scores_fused(semb: jnp.ndarray, offsets2d: jnp.ndarray,
                        cidx: jnp.ndarray, qemb: jnp.ndarray, cap: int):
    """Bucket scoring with the CSR offsets lookup fused into the kernel.

    Args:
      semb: (N, d) cluster-sorted embeddings, N % 8 == 0, >= cap slack.
      offsets2d: CSR offsets reshaped (rows, 128) int32, rows % 16 == 0,
        padded with the last offset value.
      cidx: (G,) int32 packed cluster indices (G % 8 == 0).
      qemb: (G, d) per-bucket query rows.
    Returns:
      (scores (G, cap) f32 masked to bucket bounds,
       rows (G, cap) int32 CSR row ids, -1 where invalid).
    """
    G, d = qemb.shape
    assert G % ROWS == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, d), lambda g, s: (g, 0),
                         memory_space=pltpu.VMEM),      # qemb rows
            pl.BlockSpec(memory_space=pl.ANY),       # offsets2d
            pl.BlockSpec(memory_space=pl.ANY),       # semb
        ],
        out_specs=[
            pl.BlockSpec((ROWS, cap), lambda g, s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, cap), lambda g, s: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((ROWS, cap, d), semb.dtype),
            pltpu.VMEM((ROWS, 2 * ALIGN, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((ROWS,)),
            pltpu.SemaphoreType.DMA((ROWS,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fused_kernel, cap=cap, neg=-1e30),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, cap), jnp.float32),
            jax.ShapeDtypeStruct((G, cap), jnp.int32),
        ],
    )(cidx, qemb, offsets2d, semb)


def _kernel_v2(starts_ref, ends_ref, q_ref, semb_ref, out_ref, row_ref,
               emb_buf, sems, *, cap: int, neg: float):
    """Double-buffered bucket scorer: step g's compute overlaps step
    g+1's embedding DMAs; bucket starts/ends come precomputed (an XLA
    gather in the caller) instead of the in-kernel offsets lookup.

    MEASURED SLOWER than :func:`bucket_scores_fused` at serving geometry
    (48.8 vs 37.6 ms at G=5120, cap=512 in bench.py; the traced scratch
    slot index defeats Mosaic's own pipelining) — kept as a reference
    experiment, the serving paths use the fused kernel."""
    g = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(step, slot, r):
        s = starts_ref[step * ROWS + r]
        al = pl.multiple_of((s // ALIGN) * ALIGN, ALIGN)
        return pltpu.make_async_copy(
            semb_ref.at[pl.ds(al, cap), :], emb_buf.at[slot, r],
            sems.at[slot, r])

    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        for r in range(ROWS):
            dma(0, slot, r).start()

    @pl.when(g + 1 < n)
    def _():
        for r in range(ROWS):
            dma(g + 1, nslot, r).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    for r in range(ROWS):
        dma(g, slot, r).wait()
        s = starts_ref[g * ROWS + r]
        e = ends_ref[g * ROWS + r]
        al = (s // ALIGN) * ALIGN
        q = q_ref[r, :].astype(jnp.float32)
        block = emb_buf[slot, r].astype(jnp.float32)       # (cap, d)
        sc = jnp.sum(block * q[None, :], axis=-1)[None, :]
        rows = al + lane
        ok = (rows >= s) & (rows < e)
        out_ref[r, :] = jnp.where(ok, sc, neg)[0]
        row_ref[r, :] = jnp.where(ok, rows, -1)[0]


@functools.partial(jax.jit, static_argnames=("cap",))
def bucket_scores_v2(semb: jnp.ndarray, starts: jnp.ndarray,
                     ends: jnp.ndarray, qemb: jnp.ndarray, cap: int):
    """Bucket scoring from precomputed CSR bounds.

    Args:
      semb: (N, d) cluster-sorted embeddings, N % 8 == 0, >= cap slack.
      starts/ends: (G,) int32 bucket bounds (G % 8 == 0; pad with 0/0).
      qemb: (G, d) per-bucket query rows.
    Returns (scores (G, cap) f32 masked to bounds, rows (G, cap) int32,
    -1 where invalid) — same contract as :func:`bucket_scores_fused`.
    """
    G, d = qemb.shape
    assert G % ROWS == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, d), lambda g, s, e: (g, 0),
                         memory_space=pltpu.VMEM),      # qemb rows
            pl.BlockSpec(memory_space=pl.ANY),       # semb (HBM)
        ],
        out_specs=[
            pl.BlockSpec((ROWS, cap), lambda g, s, e: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, cap), lambda g, s, e: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, cap, d), semb.dtype),
            pltpu.SemaphoreType.DMA((2, ROWS)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_v2, cap=cap, neg=-1e30),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, cap), jnp.float32),
            jax.ShapeDtypeStruct((G, cap), jnp.int32),
        ],
    )(starts, ends, qemb, semb)


def _kernel_v3(starts_ref, ends_ref, q_ref, semb_ref, out_ref, row_ref,
               emb_buf, sems, *, cap: int, neg: float):
    """Single-slot bucket scorer from precomputed CSR bounds.

    Bounds arrive as scalar-prefetch operands (SMEM reads are free on
    the scalar core), so relative to :func:`bucket_scores_fused` each
    grid step drops 8 offsets DMA issues and the ~100 small vector ops
    of the in-kernel masked bounds extraction — the scalar-core issue
    overhead that dominates a step (the DMAs themselves are ~6 us of
    HBM traffic).  Unlike :func:`_kernel_v2` there is no scratch slot
    index: Mosaic pipelines grid steps itself when the scratch access
    pattern is static."""
    g = pl.program_id(0)

    def dma(r):
        s = starts_ref[g * ROWS + r]
        al = pl.multiple_of((s // ALIGN) * ALIGN, ALIGN)
        return pltpu.make_async_copy(
            semb_ref.at[pl.ds(al, cap), :], emb_buf.at[r], sems.at[r])

    for r in range(ROWS):
        dma(r).start()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    for r in range(ROWS):
        dma(r).wait()
        s = starts_ref[g * ROWS + r]
        e = ends_ref[g * ROWS + r]
        al = (s // ALIGN) * ALIGN
        q = q_ref[r, :].astype(jnp.float32)
        block = emb_buf[r].astype(jnp.float32)          # (cap, d)
        sc = jnp.sum(block * q[None, :], axis=-1)[None, :]
        rows = al + lane
        ok = (rows >= s) & (rows < e)
        out_ref[r, :] = jnp.where(ok, sc, neg)[0]
        row_ref[r, :] = jnp.where(ok, rows, -1)[0]


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def bucket_scores_v3(semb: jnp.ndarray, starts: jnp.ndarray,
                     ends: jnp.ndarray, qemb: jnp.ndarray, cap: int,
                     interpret: bool = False):
    """Bucket scoring from precomputed CSR bounds, single scratch slot.

    Same contract as :func:`bucket_scores_v2` (and the same caller-side
    bounds gather — one XLA gather of G int32, trivial next to the
    kernel); the oracle is :func:`bucket_scores_v2_reference`.
    ``interpret=True`` runs the Pallas interpreter (CPU tests exercise
    the real kernel body, not just the XLA oracle)."""
    G, d = qemb.shape
    assert G % ROWS == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, d), lambda g, s, e: (g, 0),
                         memory_space=pltpu.VMEM),      # qemb rows
            pl.BlockSpec(memory_space=pl.ANY),       # semb (HBM)
        ],
        out_specs=[
            pl.BlockSpec((ROWS, cap), lambda g, s, e: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, cap), lambda g, s, e: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((ROWS, cap, d), semb.dtype),
            pltpu.SemaphoreType.DMA((ROWS,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_v3, cap=cap, neg=-1e30),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, cap), jnp.float32),
            jax.ShapeDtypeStruct((G, cap), jnp.int32),
        ],
        interpret=interpret,
    )(starts, ends, qemb, semb)


def bucket_scores_v2_reference(semb, starts, ends, qemb, cap):
    """XLA oracle for :func:`bucket_scores_v2` (CPU path + tests)."""
    al = (starts // ALIGN) * ALIGN
    pos = jnp.arange(cap, dtype=jnp.int32)
    rows = al[:, None] + pos
    ok = (rows >= starts[:, None]) & (rows < ends[:, None])
    block = semb[jnp.clip(rows, 0, semb.shape[0] - 1)]
    sc = jnp.einsum("gd,gcd->gc", qemb.astype(jnp.float32),
                    block.astype(jnp.float32))
    return (jnp.where(ok, sc, -1e30),
            jnp.where(ok, rows, -1))


def pack_offsets_2d(offsets: "np.ndarray"):
    """CSR offsets (C+1,) -> (rows, 128) int32 padded for the fused
    kernel (rows a multiple of 16, padding = last offset)."""
    import numpy as np
    off = np.asarray(offsets, np.int32)
    rows = -(-len(off) // 128)
    # the kernel DMAs a 2*ALIGN-row window starting at the ALIGN-aligned
    # row of cidx: a cluster in the last ALIGN rows reads up to
    # ALIGN-1 rows past its own block, so pad a full extra window (a
    # dense cluster id space put max-cidx in the final block and read
    # out of bounds; the serving CSR's sparse id space happened to
    # dodge it)
    rows += 2 * ALIGN
    rows = ((rows + 2 * ALIGN - 1) // (2 * ALIGN)) * (2 * ALIGN)
    out = np.full((rows * 128,), off[-1], np.int32)
    out[:len(off)] = off
    return out.reshape(rows, 128)


def bucket_scores_fused_reference(semb, offsets2d, cidx, qemb, cap):
    """XLA oracle for the fused kernel (CPU tests)."""
    off = offsets2d.reshape(-1)
    starts = off[cidx]
    ends = off[cidx + 1]
    al = (starts // ALIGN) * ALIGN
    pos = jnp.arange(cap, dtype=jnp.int32)
    rows = al[:, None] + pos
    ok = (rows >= starts[:, None]) & (rows < ends[:, None])
    block = semb[jnp.clip(rows, 0, semb.shape[0] - 1)]
    sc = jnp.einsum("gd,gcd->gc", qemb.astype(jnp.float32),
                    block.astype(jnp.float32))
    return (jnp.where(ok, sc, -1e30),
            jnp.where(ok, rows, -1))


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
