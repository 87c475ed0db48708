"""Host-streaming search for corpora larger than device HBM.

NQ-dpr is 21,015,324 passages: 30 GB bf16 / 15.1 GB int8 — neither
fits one v5e chip beside the towers.  The reference handles any corpus
size on one GPU by streaming memmap chunks through the scoring matmul
(``MEVI/main_models.py:3944-3991``, the ``encode_batch_size``-chunked
scan with a running top-k at 3869-3876).  TPU-native equivalent:

* :func:`streaming_mips_topk` — the corpus stays host-resident
  (np/memmap); fixed-size chunks are shipped with **double buffering**
  (``jax.device_put`` of chunk j+1 is in flight while chunk j's
  score+merge program runs), and a jitted merge keeps the running
  top-k on device.  One sweep serves the whole query batch.
* :class:`HostStreamFineReranker` — the cluster-sorted matrix stays
  host-resident; per batch the (query, beam) bucket rows are gathered
  on host (CSR rows are contiguous — a cheap slice-copy) and scored in
  one device matmul.  Same call contract as
  :class:`mevi_tpu.eval.searcher.FineReranker`.

Multi-chip sharding (``sharded_mips_topk`` / ``make_sharded_server``)
remains the throughput path; this module is the single-chip capability
path for oversized corpora.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.csr import pack_codes
from ..ops.topk import NEG_INF, merge_topk


@partial(jax.jit, static_argnames=("k",), donate_argnums=(0, 1))
def _merge_chunk(run_s, run_i, q, block, start, n_valid, k: int):
    """Score one corpus chunk and fold it into the running top-k."""
    if block.dtype == jnp.int8:
        block = block.astype(q.dtype)
    scores = jax.lax.dot_general(
        q, block, (((1,), (1,)), ((), ())),
        precision=(jax.lax.Precision.HIGHEST
                   if q.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=jnp.float32)
    pos = jnp.arange(block.shape[0], dtype=jnp.int32)
    ids = start + pos
    scores = jnp.where(pos[None, :] < n_valid, scores, NEG_INF)
    ids = jnp.where(pos < n_valid, ids, -1)
    bcast = jnp.broadcast_to(ids[None, :], scores.shape)
    return merge_topk(run_s, run_i, scores, bcast, k)


def streaming_mips_topk(query_emb, emb_host: np.ndarray, k: int,
                        chunk: int = 1 << 16,
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact MIPS top-k over a HOST-resident corpus (np array or
    memmap), streamed chunk-wise to the device with double buffering.

    Args:
      query_emb: (nq, d) device or np array (cast drives compute dtype;
        int8 corpora are upcast to it per chunk).
      emb_host: (nd, d) host matrix — any size that fits host RAM/disk.
      k: pool size.
      chunk: rows per shipped chunk (fixed shape: one compiled program).
    Returns (scores (nq, k) np.float32, ids (nq, k) np.int32).
    """
    q = jnp.asarray(query_emb)
    nd, d = emb_host.shape
    nq = q.shape[0]
    chunk = min(chunk, nd)
    run_s = jnp.full((nq, k), NEG_INF, jnp.float32)
    run_i = jnp.full((nq, k), -1, jnp.int32)

    def host_chunk(s):
        e = min(s + chunk, nd)
        block = np.asarray(emb_host[s:e])
        if e - s < chunk:             # fixed shape: pad the tail
            block = np.concatenate(
                [block, np.zeros((chunk - (e - s), d), block.dtype)])
        return block, e - s

    starts = list(range(0, nd, chunk))
    blk, n_valid = host_chunk(starts[0])
    cur = jax.device_put(blk)
    for j, s in enumerate(starts):
        if j + 1 < len(starts):        # overlap ship(j+1) with score(j)
            nxt_blk, nxt_valid = host_chunk(starts[j + 1])
            nxt = jax.device_put(nxt_blk)
        run_s, run_i = _merge_chunk(run_s, run_i, q, cur,
                                    jnp.int32(s), jnp.int32(n_valid), k)
        if j + 1 < len(starts):
            cur, n_valid = nxt, nxt_valid
    return np.asarray(run_s), np.asarray(run_i)


@partial(jax.jit, static_argnames=("pool",))
def _bucket_score(q, rows_emb, valid, ids, pool: int):
    """(B, d) x (B, nb*cap, d) -> per-query top-pool over valid slots."""
    if rows_emb.dtype == jnp.int8:
        rows_emb = rows_emb.astype(q.dtype)
    scores = jnp.einsum("bd,bcd->bc", q, rows_emb,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(valid, scores, NEG_INF)
    k = min(pool, scores.shape[-1])
    top, pos = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(ids, pos, axis=-1)
    return top, jnp.where(top <= NEG_INF / 2, -1, top_ids)


class HostStreamFineReranker:
    """Fine re-rank with the cluster-sorted matrix HOST-resident.

    Per batch, each (query, beam) bucket's member rows (contiguous in
    CSR order) are sliced on host into a (B, nb*cap, d) panel and
    scored in one device matmul — the reference's per-cluster
    memmap->device gather (``main_models.py:3915-3991``) batched into
    one ship+score per sub-batch.  Returns original doc ids.
    """

    def __init__(self, sorted_emb_host: np.ndarray,
                 offsets: np.ndarray, doc_ids: np.ndarray,
                 kary: int, cap: int, pool: int,
                 query_dtype=None, sub_batch: int = 64):
        self.emb = sorted_emb_host
        self.offsets = np.asarray(offsets, np.int64)
        self.doc_ids = np.asarray(doc_ids)
        self.kary, self.cap, self.pool = kary, cap, pool
        self.sub_batch = sub_batch
        self.q_dt = query_dtype
        # FineReranker-compatible attribute names (Evaluator contract)
        self.offsets_h = self.offsets
        self.doc_ids_h = self.doc_ids

    def __call__(self, query_emb, beam_codes):
        q_all = np.asarray(query_emb)
        codes = np.asarray(beam_codes)
        B, nb, M = codes.shape
        cap, d = self.cap, self.emb.shape[1]
        ci = pack_codes(codes.reshape(-1, M), self.kary) \
            .astype(np.int64).reshape(B, nb)
        starts = self.offsets[ci]
        sizes = (self.offsets[ci + 1] - starts).astype(np.int64)
        ndoc = sizes.sum(-1)
        out_s = np.empty((B, self.pool), np.float32)
        out_i = np.empty((B, self.pool), np.int32)
        n_rows = len(self.doc_ids)
        for s0 in range(0, B, self.sub_batch):
            e0 = min(B, s0 + self.sub_batch)
            b = e0 - s0
            panel = np.zeros((b, nb * cap, d), self.emb.dtype)
            ids = np.full((b, nb * cap), -1, np.int32)
            valid = np.zeros((b, nb * cap), bool)
            for bi in range(b):
                for j in range(nb):
                    n = int(min(sizes[s0 + bi, j], cap))
                    if n == 0:
                        continue
                    st = int(starts[s0 + bi, j])
                    n = min(n, n_rows - st)
                    sl = slice(j * cap, j * cap + n)
                    panel[bi, sl] = self.emb[st:st + n]
                    ids[bi, sl] = self.doc_ids[st:st + n]
                    valid[bi, sl] = True
            q = jnp.asarray(q_all[s0:e0])
            if self.q_dt is not None:
                q = q.astype(self.q_dt)
            ts, ti = _bucket_score(q, jnp.asarray(panel),
                                   jnp.asarray(valid),
                                   jnp.asarray(ids), self.pool)
            out_s[s0:e0] = np.asarray(ts)
            out_i[s0:e0] = np.asarray(ti)
        return out_s, out_i, ndoc
