"""Coarse -> fine retrieval engine.

The reference's fine path loops per query / per beam over ragged host
dict lookups, streaming memmap chunks to GPU
(``MEVI/main_models.py:3915-4020``).  TPU-native layout instead:

* document embeddings are **permuted into CSR order** (cluster-sorted) at
  index-build time, so a cluster's members are a *contiguous* row range —
  the per-beam gather is one padded slice, DMA-friendly, jit-able;
* per (query, beam): rows ``offsets[c] .. offsets[c+1]`` are gathered to a
  static ``cap``; scores are one batched matmul; beams merge by a single
  top-k (clusters are disjoint, so no dedup is needed — each doc appears
  in exactly one leaf cluster);
* multi-chip: the permuted matrix is row-sharded over the ``corpus`` mesh
  axis; every shard gathers the intersection of each bucket with its row
  range, computes local top-k and results merge by ``all_gather`` — the
  file-barrier protocol (``main_models.py:190-330``) becomes collectives.

Returned doc ids are original corpus ids (via the CSR permutation).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..index.csr import pack_codes
from ..ops.topk import NEG_INF
from ..parallel.mesh import CORPUS_AXIS, DATA_AXIS


class FineIndex(NamedTuple):
    """Serving-side index: CSR + cluster-sorted embeddings."""
    offsets: jnp.ndarray      # (C+1,) int32
    doc_ids: jnp.ndarray      # (N,) int32 — row -> original doc id
    sorted_emb: jnp.ndarray   # (N, d) — embeddings permuted to CSR order
    levels: int
    kary: int
    # host copies kept from build time (device->host fetches stall behind
    # the corpus upload on tethered TPUs); None when reconstructed
    host_offsets: Optional[np.ndarray] = None
    host_doc_ids: Optional[np.ndarray] = None


def build_fine_index(codes: np.ndarray, emb: np.ndarray,
                     kary: int, dtype=None,
                     pad_rows: int = 0) -> FineIndex:
    """Build the serving layout from per-doc codes + embeddings.

    ``pad_rows``: extra zero rows appended host-side (the Pallas bucket
    kernel needs >= cap rows of slack past the last real row; padding on
    host avoids a device-side copy of the whole matrix).
    """
    from ..index.csr import build_csr
    offsets, doc_ids = build_csr(codes, kary)
    sorted_emb = np.ascontiguousarray(emb[doc_ids])
    if dtype is not None:
        sorted_emb = sorted_emb.astype(dtype)
    if pad_rows:
        sorted_emb = np.concatenate(
            [sorted_emb, np.zeros((pad_rows, sorted_emb.shape[1]),
                                  sorted_emb.dtype)], axis=0)
    return FineIndex(jnp.asarray(offsets), jnp.asarray(doc_ids),
                     jnp.asarray(sorted_emb), codes.shape[-1], kary,
                     host_offsets=offsets, host_doc_ids=doc_ids)


def _beam_scores(query_emb, beam_codes, offsets, doc_ids, sorted_emb,
                 kary, cap, row_offset=0):
    """Scores + original ids for each (query, beam, slot).

    query_emb: (B, d); beam_codes: (B, nb, M).
    Returns (scores (B, nb*cap), ids (B, nb*cap), sizes (B, nb)).
    Rows outside [row_offset, row_offset + local_rows) are invalid
    (sharded case — offsets are global, sorted_emb is the local shard).
    """
    B, nb, M = beam_codes.shape
    n_local = sorted_emb.shape[0]
    cidx = pack_codes(beam_codes, kary)                       # (B, nb)
    start = offsets[cidx]
    end = offsets[cidx + 1]
    sizes = end - start
    pos = jnp.arange(cap, dtype=jnp.int32)
    rows = start[..., None] + pos                              # (B, nb, cap)
    valid = (pos < sizes[..., None])
    local = rows - row_offset
    in_shard = (local >= 0) & (local < n_local)
    ok = valid & in_shard
    local = jnp.clip(local, 0, n_local - 1)
    n_global = doc_ids.shape[0]
    global_rows = jnp.clip(rows, 0, n_global - 1)
    emb = sorted_emb[local]                                    # (B,nb,cap,d)
    if emb.dtype == jnp.int8:      # quantized corpus: upcast the gather
        emb = emb.astype(query_emb.dtype)
    precision = (jax.lax.Precision.HIGHEST
                 if query_emb.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    scores = jnp.einsum("bd,bncd->bnc", query_emb, emb,
                        precision=precision,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(ok, scores, NEG_INF)
    ids = jnp.where(ok, doc_ids[global_rows], -1)
    return (scores.reshape(B, nb * cap), ids.reshape(B, nb * cap), sizes)


def merge_pool(scores: jnp.ndarray, ids: jnp.ndarray, nb: int, cap: int,
               pool: int, rank: str = "score",
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge per-(beam, slot) candidate scores into a top-``pool`` list.

    ``scores``/``ids``: (B, nb*cap), invalid slots at ``NEG_INF``/-1.

    ``rank="score"``: global top-k by score (the reference's fine
    ordering, ``main_models.py:3990-4020``).  ``rank="beam_major"``:
    lexicographic (beam rank, then score) — buckets keep the NCI beam's
    ordering and the tower only breaks ties *within* a bucket.  On data
    where the code posterior nearly identifies the document (synthetic
    dev: median Bayes candidate set = 1), the beam ordering carries far
    more early-precision signal than a weak tower, and a global score
    re-rank destroys it.  Exact lexicographic merge with no assumption
    on score magnitudes: per-beam top_k (descending, invalids last),
    then ONE stable integer argsort on the beam index (invalid slots
    keyed past every beam) — no score-offset hacks.
    """
    B = scores.shape[0]
    k = min(pool, scores.shape[-1])
    if rank == "beam_major":
        s3 = scores.reshape(B, nb, cap)
        i3 = ids.reshape(B, nb, cap)
        s_s, p = jax.lax.top_k(s3, cap)                # per-beam desc
        i_s = jnp.take_along_axis(i3, p, axis=-1)
        beam_idx = jnp.arange(nb, dtype=jnp.int32)[None, :, None]
        key = jnp.where(s_s > NEG_INF / 2, beam_idx, nb)
        key = jnp.broadcast_to(key, s_s.shape).reshape(B, -1)
        order = jnp.argsort(key, axis=-1, stable=True)
        top_scores = jnp.take_along_axis(
            s_s.reshape(B, -1), order, axis=-1)[:, :k]
        top_ids = jnp.take_along_axis(
            i_s.reshape(B, -1), order, axis=-1)[:, :k]
    else:
        top_scores, posn = jax.lax.top_k(scores, k)
        top_ids = jnp.take_along_axis(ids, posn, axis=-1)
    top_ids = jnp.where(top_scores <= NEG_INF / 2, -1, top_ids)
    return top_scores, top_ids


@partial(jax.jit, static_argnames=("kary", "cap", "pool", "rank"))
def fine_rerank(query_emb: jnp.ndarray, beam_codes: jnp.ndarray,
                offsets: jnp.ndarray, doc_ids: jnp.ndarray,
                sorted_emb: jnp.ndarray, kary: int, cap: int, pool: int,
                rank: str = "score",
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """In-cluster MIPS re-rank of the coarse beam's clusters.

    Returns (top scores (B, pool), top original doc ids (B, pool),
    ndoc (B,) — total member count across the query's clusters, the
    reference's ndoc@cluster metric, ``main_models.py:3936-3937``).
    ``rank``: see ``merge_pool``.
    """
    scores, ids, sizes = _beam_scores(
        query_emb, beam_codes, offsets, doc_ids, sorted_emb, kary, cap)
    nb = beam_codes.shape[1]
    top_scores, top_ids = merge_pool(scores, ids, nb, cap, pool, rank)
    return top_scores, top_ids, jnp.sum(sizes, axis=-1)


def sharded_fine_rerank(query_emb, beam_codes, index: FineIndex,
                        mesh: Mesh, cap: int, pool: int,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-chip fine re-rank.

    ``index.sorted_emb`` is row-sharded over the corpus axis (shard i owns
    rows [i*rows_per, (i+1)*rows_per)); offsets/doc_ids are replicated
    (tiny).  Queries/beams shard over data.
    """
    n_corpus = mesh.shape[CORPUS_AXIS]
    rows_per = index.sorted_emb.shape[0] // n_corpus
    kary = index.kary

    def local(query_emb, beam_codes, offsets, doc_ids, emb_shard):
        shard = jax.lax.axis_index(CORPUS_AXIS)
        scores, ids, sizes = _beam_scores(
            query_emb, beam_codes, offsets, doc_ids, emb_shard, kary, cap,
            row_offset=shard * rows_per)
        k = min(pool, scores.shape[-1])
        loc_scores, posn = jax.lax.top_k(scores, k)
        loc_ids = jnp.take_along_axis(ids, posn, axis=-1)
        all_scores = jax.lax.all_gather(loc_scores, CORPUS_AXIS)
        all_ids = jax.lax.all_gather(loc_ids, CORPUS_AXIS)
        B = loc_scores.shape[0]
        all_scores = jnp.moveaxis(all_scores, 0, 1).reshape(B, -1)
        all_ids = jnp.moveaxis(all_ids, 0, 1).reshape(B, -1)
        top_scores, pos2 = jax.lax.top_k(all_scores, k)
        top_ids = jnp.take_along_axis(all_ids, pos2, axis=-1)
        top_ids = jnp.where(top_scores <= NEG_INF / 2, -1, top_ids)
        return top_scores, top_ids, sizes.sum(-1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None, None),
                  P(), P(), P(CORPUS_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS)),
        check_vma=False)
    return fn(query_emb, beam_codes, index.offsets, index.doc_ids,
              index.sorted_emb)


# --------------------------------------------------------------------------
# Pallas serving path (TPU): bucket DMA kernel + host index arithmetic
# --------------------------------------------------------------------------

def bucket_scores_dispatch(sorted_emb, starts_aligned, query_emb,
                           cap: int) -> jnp.ndarray:
    """Raw bucket scores.  On TPU this MUST stay its own dispatch: an XLA
    program mixing the Mosaic custom-call with other HLO runs ~500x
    slower on the serving path (measured), while back-to-back dispatches
    are ~free."""
    from ..ops.bucket import bucket_scores, bucket_scores_reference
    if jax.default_backend() == "cpu":  # tests / dryrun
        return bucket_scores_reference(sorted_emb, starts_aligned,
                                       query_emb, cap)
    return bucket_scores(sorted_emb, starts_aligned, query_emb, cap)


@partial(jax.jit, static_argnames=("cap", "pool", "nq", "per_query"))
def mask_pool_topk(scores: jnp.ndarray, starts_aligned: jnp.ndarray,
                   bucket_start: jnp.ndarray, bucket_end: jnp.ndarray,
                   cap: int, pool: int, nq: int, per_query: int,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask kernel scores to true bucket bounds and pool per-query top-k.

    Slot j of bucket g holds CSR row ``starts_aligned[g] + j``; valid iff
    that row lies in [bucket_start, bucket_end).  The first
    ``nq * per_query`` bucket rows are real (the rest is kernel padding).
    Returns (top scores (nq, pool), top CSR rows (nq, pool), -1 invalid).
    """
    pos = jnp.arange(cap, dtype=jnp.int32)
    rows = starts_aligned[:, None] + pos
    ok = (rows >= bucket_start[:, None]) & (rows < bucket_end[:, None])
    g_real = nq * per_query
    sc = jnp.where(ok, scores, NEG_INF)[:g_real].reshape(nq, -1)
    rw = jnp.where(ok, rows, -1)[:g_real].reshape(nq, -1)
    k = min(pool, sc.shape[-1])
    top_scores, posn = jax.lax.top_k(sc, k)
    top_rows = jnp.take_along_axis(rw, posn, axis=-1)
    top_rows = jnp.where(top_scores <= NEG_INF / 2, -1, top_rows)
    return top_scores, top_rows


class FineReranker:
    """Reusable fine re-rank: Pallas kernel path on TPU, gather fallback
    on CPU.  Maps CSR rows back to original doc ids on host.

    ``overflow='scan'`` (default): a query whose predicted clusters
    exceed ``cap`` members falls back to an exact full-corpus scan — the
    reference never truncates clusters (it gathers every ragged member,
    ``main_models.py:3915-4020``; full-scan shape at 3818-3876), so
    silent cap truncation would change results.  ``'truncate'`` keeps
    the capped behavior (serving-speed mode)."""

    def __init__(self, index: FineIndex, cap: int, pool: int,
                 overflow: str = "scan", rank: str = "score"):
        import numpy as np
        assert overflow in ("scan", "truncate"), overflow
        assert rank in ("score", "beam_major"), rank
        self.overflow = overflow
        self.rank = rank
        self.index = index
        self.cap, self.pool = cap, pool
        self.kary = index.kary
        self.on_cpu = jax.default_backend() == "cpu"
        # int8 corpus: queries must STAY float (casting unit-norm float
        # components ~0.01-0.5 to int8 truncates them to zeros);
        # _beam_scores / the bucket kernel upcast the int8 gather instead
        if index.sorted_emb.dtype == jnp.int8:
            self.q_dt = jnp.float32 if self.on_cpu else jnp.bfloat16
        else:
            self.q_dt = index.sorted_emb.dtype
        if index.host_offsets is not None:
            self.offsets_h = np.asarray(index.host_offsets, np.int64)
            self.doc_ids_h = np.asarray(index.host_doc_ids)
        else:
            self.offsets_h = np.asarray(index.offsets).astype(np.int64)
            self.doc_ids_h = np.asarray(index.doc_ids)
        if not self.on_cpu:
            from ..ops.bucket import pack_offsets_2d
            self.offsets2d = jnp.asarray(pack_offsets_2d(self.offsets_h))
            n = index.sorted_emb.shape[0]
            need = int(self.offsets_h[-1]) + cap
            need += (-need) % 8
            if n < need:
                semb = jnp.concatenate(
                    [index.sorted_emb,
                     jnp.zeros((need - n, index.sorted_emb.shape[1]),
                               index.sorted_emb.dtype)], axis=0)
            else:
                semb = index.sorted_emb
            self.semb = semb

            @partial(jax.jit, static_argnames=("nq", "per_query"))
            def _pool(scores, rows, nq, per_query):
                g_real = nq * per_query
                sc = scores[:g_real].reshape(nq, -1)
                rw = rows[:g_real].reshape(nq, -1)
                return merge_pool(sc, rw, per_query, cap, pool, rank)
            self._pool = _pool

    def _scan_overflow(self, query_emb, scores, ids, over_mask):
        """Replace overflowing queries' results with an exact full scan
        over the (cluster-sorted) corpus; static batch shape so the scan
        program compiles once."""
        import numpy as np
        from ..ops.mips import mips_topk
        semb = self.semb if not self.on_cpu else self.index.sorted_emb
        q = jnp.asarray(query_emb).astype(self.q_dt)
        k = min(self.pool, scores.shape[-1])
        s_all, rows = mips_topk(q, semb, k=k)
        rows_h = np.asarray(rows)
        n_real = len(self.doc_ids_h)
        ids_all = np.where(
            (rows_h >= 0) & (rows_h < n_real),
            self.doc_ids_h[np.clip(rows_h, 0, n_real - 1)], -1)
        s_all = np.asarray(s_all)
        scores = np.where(over_mask[:, None], s_all[:, :k], scores)
        ids = np.where(over_mask[:, None], ids_all[:, :k], ids)
        return scores, ids

    def __call__(self, query_emb, beam_codes):
        """query_emb (B, d); beam_codes (B, nb, M) ->
        (scores (B, pool) np, original doc ids (B, pool) np, ndoc np)."""
        import numpy as np
        from ..index.csr import pack_codes
        B, nb, M = np.asarray(beam_codes).shape
        ci_h = pack_codes(np.asarray(beam_codes).reshape(-1, M),
                          self.kary).astype(np.int64)
        sizes_h = (self.offsets_h[ci_h + 1]
                   - self.offsets_h[ci_h]).reshape(B, nb)
        over = ((sizes_h > self.cap).any(axis=1)
                if self.overflow == "scan"
                else np.zeros(B, bool))
        if self.on_cpu:
            s, i, nd = fine_rerank(
                jnp.asarray(query_emb).astype(self.q_dt),
                jnp.asarray(beam_codes), self.index.offsets,
                self.index.doc_ids, self.index.sorted_emb, self.kary,
                self.cap, self.pool, rank=self.rank)
            s, i, nd = np.asarray(s), np.asarray(i), np.asarray(nd)
            if over.any():
                s, i = self._scan_overflow(query_emb, s, i, over)
            return s, i, nd
        from ..ops.bucket import (ROWS, bucket_scores_fused,
                                  bucket_scores_v3)
        cidx_h = ci_h.astype(np.int32)
        G = B * nb
        pad_g = (-G) % ROWS
        q_rep = jnp.repeat(jnp.asarray(query_emb).astype(
            self.q_dt), nb, axis=0)
        if pad_g:
            q_rep = jnp.concatenate(
                [q_rep, jnp.zeros((pad_g, q_rep.shape[1]),
                                  q_rep.dtype)], axis=0)
        if os.environ.get("MEVI_BUCKET_KERNEL", "v3") == "fused":
            cidx = jnp.asarray(np.concatenate(
                [cidx_h, np.zeros(pad_g, np.int32)]) if pad_g else cidx_h)
            scores, rows = bucket_scores_fused(
                self.semb, self.offsets2d, cidx, q_rep, self.cap)
        else:
            # v3: the cluster ids are already on host, so the bucket
            # bounds come for free — no in-kernel offsets DMAs and no
            # extra device gather (see serve.py / profile_bucket.py)
            s_h = self.offsets_h[ci_h].astype(np.int32)
            e_h = self.offsets_h[ci_h + 1].astype(np.int32)
            if pad_g:
                s_h = np.concatenate([s_h, np.zeros(pad_g, np.int32)])
                e_h = np.concatenate([e_h, np.zeros(pad_g, np.int32)])
            scores, rows = bucket_scores_v3(
                self.semb, jnp.asarray(s_h), jnp.asarray(e_h), q_rep,
                self.cap)
        top_scores, top_rows = self._pool(scores, rows, B, nb)
        top_rows_h = np.asarray(top_rows)
        top_ids = np.where(top_rows_h >= 0,
                           self.doc_ids_h[np.clip(top_rows_h, 0, None)],
                           -1).astype(np.int32)
        ndoc = sizes_h.sum(-1)
        top_scores = np.asarray(top_scores)
        if over.any():
            top_scores, top_ids = self._scan_overflow(
                query_emb, top_scores, top_ids, over)
        return top_scores, top_ids, ndoc


# --------------------------------------------------------------------------
# coarse metrics helpers
# --------------------------------------------------------------------------

def coarse_ranks(beam_codes: np.ndarray, gt_codes: np.ndarray,
                 kary: int) -> np.ndarray:
    """Rank of each gt doc's cluster in the beam list, -1 if absent.

    beam_codes: (B, nb, M); gt_codes: (B, max_gt, M) with -1 padding.
    Mirrors ``main_models.py:3772-3774`` (index of gt cluster in dec).
    """
    beam_idx = pack_codes(np.asarray(beam_codes), kary)       # (B, nb)
    gt_valid = (np.asarray(gt_codes)[..., 0] >= 0)
    gt_idx = pack_codes(np.maximum(np.asarray(gt_codes), 0), kary)
    eq = gt_idx[:, :, None] == beam_idx[:, None, :]
    eq &= gt_valid[:, :, None]
    found = eq.any(-1)
    first = eq.argmax(-1)
    return np.where(found, first, -1)
