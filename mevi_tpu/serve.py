"""Fused serving pipeline: one jit program per query batch.

The reference serves a query through several python stages (encoder
forward, per-step beam python loop, per-beam host dict lookups, memmap
chunk streaming — ``main_models.py:3555-4020``).  Here the entire path

    query tokens -> twin-tower embedding
                 -> NCI constrained beam (coarse clusters)
                 -> CSR bucket gather + in-cluster MIPS (fine)
                 -> merged top-k doc ids

is a single XLA program: one dispatch per batch, no host round-trips.
A multi-chip variant shards queries over the ``data`` axis and the
cluster-sorted corpus over ``corpus``.
"""

from __future__ import annotations

import os
import sys
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .decode.beam import nci_beam_search_incremental
from .eval.searcher import FineIndex, _beam_scores, merge_pool
from .models.nci import NCIT5
from .models.t5 import T5Model
from .ops.topk import NEG_INF
from .parallel.mesh import CORPUS_AXIS, DATA_AXIS


@partial(jax.jit, static_argnames=("qtower", "nci", "num_beams", "cap",
                                   "pool", "length_penalty", "rank"))
def serve_batch(
    qtower: T5Model,
    nci: NCIT5,
    q_params,
    nci_params,
    query_ids: jnp.ndarray,
    query_mask: jnp.ndarray,
    offsets: jnp.ndarray,
    doc_ids: jnp.ndarray,
    sorted_emb: jnp.ndarray,
    num_beams: int = 10,
    cap: int = 512,
    pool: int = 1000,
    length_penalty: float = 0.8,
    rank: str = "score",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (doc scores (b, pool), doc ids (b, pool),
    beam codes (b, nb, M), beam scores (b, nb)).
    ``rank``: see ``merge_pool`` (score | beam_major)."""
    kary = nci.dims.kary
    qemb = qtower.apply({"params": q_params}, query_ids, query_mask,
                        method=T5Model.first_token_rep)
    codes, beam_scores, _ = nci_beam_search_incremental(
        nci, nci_params, query_ids, query_mask, num_beams,
        length_penalty=length_penalty)
    q_dt = (jnp.bfloat16 if sorted_emb.dtype == jnp.int8
            else sorted_emb.dtype)   # int8 corpus: queries stay float
    scores, ids, sizes = _beam_scores(
        qemb.astype(q_dt), codes, offsets, doc_ids,
        sorted_emb, kary, cap)
    top_scores, top_ids = merge_pool(scores, ids, num_beams, cap, pool,
                                     rank)
    return top_scores, top_ids, codes, beam_scores


class PallasServer:
    """Three-dispatch TPU server with zero host hops per batch:
    (1) fused qenc + constrained beam + cluster-index prep,
    (2) the Pallas bucket kernel (CSR offsets lookup rides a DMA inside
    the kernel), (3) per-query pool top-k packed into ONE int32 output
    so a batch costs a single host fetch.  Back-to-back batches
    pipeline; ``finalize`` maps CSR rows to original doc ids on host.
    """

    def __init__(self, qtower, nci, q_params, nci_params,
                 index: FineIndex, num_beams: int = 10, cap: int = 512,
                 pool: int = 1000, length_penalty: float = 0.8,
                 inv_scale: float = 1.0, rank_mode: str = "score"):
        """``inv_scale``: dequantization factor for an int8 corpus
        (score = q/s_q . v_int8 where v_int8 = round(s_q * v)); folded
        into the query rows so reported scores stay calibrated.
        ``rank_mode``: pool ordering — "score" (global tower top-k) or
        "beam_major" (beam rank major, tower tiebreak; see
        ``eval.searcher.merge_pool``)."""
        import numpy as np
        from .index.csr import pack_codes
        from .ops.bucket import (ROWS, bucket_scores_fused,
                                 bucket_scores_fused_reference,
                                 bucket_scores_v3, pack_offsets_2d)
        self.qtower, self.nci = qtower, nci
        self.q_params, self.nci_params = q_params, nci_params
        self.num_beams, self.cap, self.pool = num_beams, cap, pool
        self.length_penalty = length_penalty
        self.kary = nci.dims.kary
        kary = self.kary
        # host copies for doc-id mapping / ndoc (final results come to
        # host anyway; keeps big-table gathers off the device)
        if getattr(index, "host_offsets", None) is not None:
            self.offsets_h = np.asarray(index.host_offsets, np.int64)
            self.doc_ids_h = np.asarray(index.host_doc_ids)
        else:
            self.offsets_h = np.asarray(index.offsets).astype(np.int64)
            self.doc_ids_h = np.asarray(index.doc_ids)
        self.offsets2d = jnp.asarray(pack_offsets_2d(self.offsets_h))
        # slack so aligned cap-row slices starting at any bucket stay in
        # bounds; prefer host-side padding (build_fine_index(pad_rows=...))
        # — device concat copies the whole matrix
        n = index.sorted_emb.shape[0]
        need = int(self.offsets_h[-1]) + cap
        need += (-need) % 8
        if n < need:
            pad = need - n
            semb = jnp.concatenate(
                [index.sorted_emb,
                 jnp.zeros((pad, index.sorted_emb.shape[1]),
                           index.sorted_emb.dtype)], axis=0)
        else:
            semb = index.sorted_emb
        self.sorted_emb = semb
        on_cpu = jax.default_backend() == "cpu"
        kern = os.environ.get("MEVI_BUCKET_KERNEL", "v3")
        if on_cpu:
            self._bucket = bucket_scores_fused_reference
        elif kern == "fused":
            self._bucket = bucket_scores_fused
        else:
            # v3 (default): bucket bounds come from a tiny separate
            # gather dispatch instead of in-kernel offsets DMAs — the
            # scalar-core issue+extraction overhead of the fused lookup
            # was ~90% of the kernel's device time (53.9 vs 35.3 ms
            # wall at serving geometry incl. the ~33 ms RPC floor,
            # scripts/profile_bucket.py)
            offsets_d = jnp.asarray(self.offsets_h.astype(np.int32))

            @jax.jit
            def _bounds(ci):
                s = offsets_d[ci]
                e = offsets_d[jnp.minimum(ci + 1, offsets_d.shape[0] - 1)]
                return s, e

            def _bucket_v3(semb, offsets2d, cidx, q_rep, cap):
                s, e = _bounds(cidx)
                return bucket_scores_v3(semb, s, e, q_rep, cap)
            self._bucket = _bucket_v3
        G = None  # static per (B, nb)

        from .decode.beam import nci_beam_search_incremental

        q_dt = jnp.bfloat16 if semb.dtype == jnp.int8 else semb.dtype
        # per-level head tables built ONCE per params: the in-call
        # build relayouts the 229 MB adaptor kernel every batch
        self.level_tables = jax.jit(
            lambda p: nci.apply({"params": p},
                                method=nci.head_level_tables))(nci_params)
        # per-prefix PAWA tables (opt-in): the adaptor is
        # query-independent, so early decode levels can replace its net
        # + delta matmul with row gathers.  Trace-measured at batch
        # 512 x 10 beams the fine-grained 50 KB-row gathers run at
        # ~160 GB/s and cost MORE than the well-fused matmuls they
        # replace (97.4 vs 89.9 ms device) — so OFF by default; the
        # path stays exact (test_pawa_prefix_tables_beam_exact) for
        # configs where the trade flips (small kary, big batch).
        self.pawa_tables = None
        if nci.dims.use_pawa and os.environ.get("MEVI_PAWA_TABLES"):
            try:
                self.pawa_tables = jax.jit(
                    lambda p, lt: nci.apply(
                        {"params": p}, method=nci.pawa_prefix_tables,
                        level_tables=lt))(nci_params, self.level_tables)
            except ValueError as e:
                # kary^(M-2) > max_entries: partial prefix tables are
                # unsupported (see pawa_prefix_tables) — serve exact via
                # the plain net-every-step beam instead
                print(f"PallasServer: PAWA prefix tables disabled: {e}",
                      file=sys.stderr)

        @jax.jit
        def _coarse(q_params, nci_params, ids, mask, level_tables,
                    pawa_tables):
            qemb = qtower.apply({"params": q_params}, ids, mask,
                                method=T5Model.first_token_rep)
            codes, scores, _ = nci_beam_search_incremental(
                nci, nci_params, ids, mask, num_beams, length_penalty,
                level_tables=level_tables, pawa_tables=pawa_tables)
            flat = codes.reshape(-1, codes.shape[-1])
            cidx = pack_codes(flat, kary)
            pad_g = (-cidx.shape[0]) % ROWS
            if pad_g:
                cidx = jnp.concatenate(
                    [cidx, jnp.zeros(pad_g, cidx.dtype)])
            q_rep = jnp.repeat(
                qemb.astype(q_dt) * jnp.asarray(inv_scale, q_dt),
                num_beams, axis=0)
            if pad_g:
                q_rep = jnp.concatenate(
                    [q_rep, jnp.zeros((pad_g, q_rep.shape[1]),
                                      q_rep.dtype)], axis=0)
            return qemb, codes, scores, cidx, q_rep
        self._coarse = _coarse

        M = nci.dims.code_len

        @partial(jax.jit, static_argnames=("nq", "per_query"))
        def _pool(scores, rows, codes, beam_scores, nq, per_query):
            """Pool top-k + pack EVERYTHING into one int32 matrix: a
            single host fetch replaces four (each fetch is a full RPC
            roundtrip on tunneled TPU deployments)."""
            g_real = nq * per_query
            sc = scores[:g_real].reshape(nq, -1)
            rw = rows[:g_real].reshape(nq, -1)
            ts, tr = merge_pool(sc, rw, per_query, cap, pool, rank_mode)
            packed = jnp.concatenate([
                jax.lax.bitcast_convert_type(ts, jnp.int32),
                tr,
                codes.reshape(nq, -1).astype(jnp.int32),
                jax.lax.bitcast_convert_type(
                    beam_scores.astype(jnp.float32), jnp.int32),
            ], axis=1)
            return packed
        self._pool = _pool
        self._M = M

    def query_device(self, query_ids, query_mask, cidx_override=None):
        """Device half: three dispatches, zero host hops (the CSR offsets
        lookup rides a DMA inside the bucket kernel).  Returns ONE packed
        device array; its host copy starts immediately so back-to-back
        batches pipeline.

        ``cidx_override``: optional (B*nb + pad,) int32 cluster indices
        replacing the beam's (bench harness: drives the bucket stage with
        occupied clusters when the NCI weights are random)."""
        B = query_ids.shape[0]
        # dispatch 1: qenc + beam + cidx/q_rep prep
        qemb, codes, beam_scores, cidx, q_rep = self._coarse(
            self.q_params, self.nci_params, query_ids, query_mask,
            self.level_tables, self.pawa_tables)
        if cidx_override is not None:
            cidx = cidx_override
        # dispatch 2: fused bucket kernel (own program — mixing the
        # Mosaic custom call into a larger XLA program degrades it)
        scores, rows = self._bucket(self.sorted_emb, self.offsets2d,
                                    cidx, q_rep, self.cap)
        # dispatch 3: per-query pool top-k + single packed output
        packed = self._pool(scores, rows, codes, beam_scores, B,
                            self.num_beams)
        try:
            packed.copy_to_host_async()
        except AttributeError:  # pragma: no cover (cpu fallback)
            pass
        return packed

    def finalize(self, handle):
        """Host half: ONE fetch; unpack + map CSR rows to doc ids."""
        import numpy as np
        from .index.csr import pack_codes
        packed = np.asarray(handle)
        B = packed.shape[0]
        nb, M = self.num_beams, self._M
        k = (packed.shape[1] - nb * M - nb) // 2
        top_scores = packed[:, :k].view(np.float32)
        top_rows_h = packed[:, k:2 * k]
        codes_h = packed[:, 2 * k:2 * k + nb * M].reshape(B, nb, M)
        beam_scores = packed[:, 2 * k + nb * M:].view(np.float32)
        top_ids = np.where(top_rows_h >= 0,
                           self.doc_ids_h[np.clip(top_rows_h, 0, None)],
                           -1).astype(np.int32)
        ci = pack_codes(codes_h.reshape(-1, M),
                        self.kary).astype(np.int64)
        ndoc = (self.offsets_h[ci + 1]
                - self.offsets_h[ci]).reshape(B, nb).sum(-1)
        return (top_scores, top_ids, codes_h, beam_scores, ndoc)

    def query(self, query_ids, query_mask):
        """Returns (doc scores (B, pool), original doc ids (B, pool),
        beam codes (B, nb, M), beam scores (B, nb), ndoc (B,))."""
        return self.finalize(self.query_device(query_ids, query_mask))


def make_sharded_server(qtower, nci, mesh: Mesh, num_beams: int = 10,
                        cap: int = 512, pool: int = 1000,
                        length_penalty: float = 0.8):
    """Multi-chip server: queries sharded over data, corpus over corpus.

    Returns serve(q_params, nci_params, query_ids, query_mask, index) —
    params replicated, ``index.sorted_emb`` row-sharded P(corpus, None).
    """
    kary = nci.dims.kary

    def local(q_params, nci_params, query_ids, query_mask, offsets,
              doc_ids, emb_shard):
        n_corpus = mesh.shape[CORPUS_AXIS]
        rows_per = emb_shard.shape[0]  # local shard rows
        qemb = qtower.apply({"params": q_params}, query_ids, query_mask,
                            method=T5Model.first_token_rep)
        codes, beam_scores, _ = nci_beam_search_incremental(
            nci, nci_params, query_ids, query_mask, num_beams,
            length_penalty=length_penalty)
        shard = jax.lax.axis_index(CORPUS_AXIS)
        q_dt = (jnp.bfloat16 if emb_shard.dtype == jnp.int8
                else emb_shard.dtype)
        scores, ids, _ = _beam_scores(
            qemb.astype(q_dt), codes, offsets, doc_ids,
            emb_shard, kary, cap, row_offset=shard * rows_per)
        k = min(pool, scores.shape[-1])
        loc_scores, pos = jax.lax.top_k(scores, k)
        loc_ids = jnp.take_along_axis(ids, pos, axis=-1)
        all_scores = jax.lax.all_gather(loc_scores, CORPUS_AXIS)
        all_ids = jax.lax.all_gather(loc_ids, CORPUS_AXIS)
        b = loc_scores.shape[0]
        all_scores = jnp.moveaxis(all_scores, 0, 1).reshape(b, -1)
        all_ids = jnp.moveaxis(all_ids, 0, 1).reshape(b, -1)
        top_scores, pos2 = jax.lax.top_k(all_scores, k)
        top_ids = jnp.take_along_axis(all_ids, pos2, axis=-1)
        top_ids = jnp.where(top_scores <= NEG_INF / 2, -1, top_ids)
        return top_scores, top_ids, codes, beam_scores

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS, None), P(DATA_AXIS, None),
                  P(), P(), P(CORPUS_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None),
                   P(DATA_AXIS, None, None), P(DATA_AXIS, None)),
        check_vma=False)

    @jax.jit
    def serve(q_params, nci_params, query_ids, query_mask, offsets,
              doc_ids, sorted_emb):
        return fn(q_params, nci_params, query_ids, query_mask, offsets,
                  doc_ids, sorted_emb)

    return serve
