"""Evaluation driver: coarse beam -> fine re-rank -> metrics + result tsvs.

Rebuild of the reference's inference engine (``T5FineTunerWithValidation``,
``main_models.py:3518-4393``): per batch it decodes RQ codes with the
constrained beam, re-ranks inside the predicted clusters with the twin
tower, and accumulates the rank of each ground-truth doc; at the end it
produces Recall/MRR/HitRate@k at coarse and fine levels, ndoc@cluster,
and the coarse/fine/hard-neg result tsvs the ensemble consumes
(``main_models.py:4227-4235``).

Device work is batched and jitted; only the metric bookkeeping and tsv
writing stay on host.  No mp.spawn, no NCCL, no barrier-file merges.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import InferConfig
from ..data import io
from ..models.nci import NCIT5
from .metrics import metrics_from_rank_matrix, ranks_of_gts
from .searcher import FineIndex, coarse_ranks


@dataclasses.dataclass
class EvalBatchResult:
    queries: List[str]
    beam_codes: np.ndarray       # (b, nb, M)
    beam_scores: np.ndarray      # (b, nb)
    fine_ids: Optional[np.ndarray] = None     # (b, pool)
    fine_scores: Optional[np.ndarray] = None
    ndoc: Optional[np.ndarray] = None


@dataclasses.dataclass
class EvalOutputs:
    coarse: Optional[dict] = None            # metrics dicts
    fine: Optional[dict] = None
    ndoc_per_query: float = 0.0
    nonempty_hit: float = 0.0
    results: Optional[List[EvalBatchResult]] = None


def pad_batch(arrs: Sequence[np.ndarray], batch: int) -> Tuple:
    """Pad the ragged final batch to the jit batch size; returns
    (padded arrays, real count)."""
    real = len(arrs[0])
    if real == batch:
        return tuple(arrs), real
    out = []
    for a in arrs:
        pad = np.repeat(a[-1:], batch - real, axis=0)
        out.append(np.concatenate([a, pad], axis=0))
    return tuple(out), real


class Evaluator:
    """Batched coarse+fine evaluation over a query set."""

    def __init__(self, model: NCIT5, params, cfg: InferConfig,
                 fine_index: Optional[FineIndex] = None,
                 query_rep_fn: Optional[Callable] = None,
                 doc_codes: Optional[np.ndarray] = None,
                 host_stream: bool = False):
        """query_rep_fn(ids, mask) -> (b, d) twin-tower query embedding
        (the --query_encoder twin path used by the eval scripts).

        ``host_stream``: the fine index's ``sorted_emb`` is HOST-resident
        (np array / memmap, any size) and the fine stage streams bucket
        panels to the device — the reference's memmap->GPU default
        (``main_models.py:3944-3991``); full scans stream the corpus
        chunk-wise with double buffering."""
        self.model = model
        self.params = params
        self.cfg = cfg
        self.fine_index = fine_index
        self.query_rep_fn = query_rep_fn
        self.doc_codes = doc_codes
        self.host_stream = host_stream
        # per-level head tables built once per params (in-call builds
        # relayout the big adaptor kernel every batch)
        import jax
        self._tables = jax.jit(lambda p: model.apply(
            {"params": p}, method=model.head_level_tables))(params)
        self._rerank = None
        if fine_index is not None and host_stream:
            from .streaming import HostStreamFineReranker
            self._rerank = HostStreamFineReranker(
                np.asarray(fine_index.sorted_emb),
                fine_index.host_offsets, fine_index.host_doc_ids,
                fine_index.kary, cfg.max_cluster_docs,
                max(cfg.recall_num))
        elif fine_index is not None:
            from .searcher import FineReranker
            self._rerank = FineReranker(fine_index, cfg.max_cluster_docs,
                                        max(cfg.recall_num),
                                        overflow=getattr(cfg, "overflow",
                                                         "scan"),
                                        rank=getattr(cfg, "rank_mode",
                                                     "score"))

    def run_batch(self, queries: List[str], query_ids: np.ndarray,
                  query_mask: np.ndarray) -> EvalBatchResult:
        cfg = self.cfg
        from ..decode.beam import nci_beam_search_incremental
        codes, scores, _ = nci_beam_search_incremental(
            self.model, self.params, jnp.asarray(query_ids),
            jnp.asarray(query_mask), cfg.beams(), cfg.length_penalty,
            level_tables=self._tables)
        codes = np.asarray(codes)[:, :cfg.num_return_sequences]
        scores = np.asarray(scores)[:, :cfg.num_return_sequences]
        out = EvalBatchResult(queries, codes, scores)
        if (cfg.recall_level in ("fine", "both")
                and self._rerank is not None):
            qemb = self.query_rep_fn(jnp.asarray(query_ids),
                                     jnp.asarray(query_mask))
            if cfg.eval_all_documents:
                out.fine_scores, out.fine_ids, out.ndoc = \
                    self._full_scan(qemb)
            else:
                fs, fid, nd = self._rerank(qemb, codes)
                out.fine_scores = fs
                out.fine_ids = fid
                out.ndoc = nd
        return out

    def _full_scan(self, qemb):
        """eval_all_documents: exact MIPS over the whole corpus
        (``main_models.py:3818-3876``), using the cluster-sorted matrix
        with row->id mapping on host."""
        fi = self.fine_index
        n_real = len(self._rerank.doc_ids_h)
        if self.host_stream:
            from .streaming import streaming_mips_topk
            s, rows = streaming_mips_topk(
                jnp.asarray(qemb), np.asarray(fi.sorted_emb)[:n_real],
                k=max(self.cfg.recall_num))
        else:
            from ..ops.mips import mips_topk
            s, rows = mips_topk(
                jnp.asarray(qemb).astype(fi.sorted_emb.dtype),
                fi.sorted_emb[:n_real]
                if fi.sorted_emb.shape[0] != n_real else fi.sorted_emb,
                k=max(self.cfg.recall_num))
        rows_h = np.asarray(rows)
        ids = np.where(rows_h >= 0,
                       self._rerank.doc_ids_h[np.clip(rows_h, 0, None)],
                       -1).astype(np.int32)
        ndoc = np.full(qemb.shape[0], n_real, np.int64)
        return np.asarray(s), ids, ndoc

    def evaluate(self, queries: List[str], query_ids: np.ndarray,
                 query_mask: np.ndarray, gt_docids: List[List[int]],
                 batch_size: int = 16,
                 keep_results: bool = False) -> EvalOutputs:
        cfg = self.cfg
        n = len(queries)
        max_gt = max(len(g) for g in gt_docids)
        gt_mat = np.full((n, max_gt), -1, np.int64)
        for i, g in enumerate(gt_docids):
            gt_mat[i, :len(g)] = g
        gt_counts = np.array([len(g) for g in gt_docids])

        all_coarse_ranks = []
        all_fine_ranks = []
        ndocs = []
        results = []
        for s in range(0, n, batch_size):
            sl = slice(s, min(s + batch_size, n))
            (qi, qm), real = pad_batch(
                [query_ids[sl], query_mask[sl]], batch_size)
            res = self.run_batch(list(queries[sl.start:sl.stop]), qi, qm)
            res.beam_codes = res.beam_codes[:real]
            res.beam_scores = res.beam_scores[:real]
            if res.fine_ids is not None:
                res.fine_ids = res.fine_ids[:real]
                res.fine_scores = res.fine_scores[:real]
                res.ndoc = res.ndoc[:real]
                ndocs.append(res.ndoc)
            if keep_results:
                results.append(res)

            if cfg.recall_level in ("coarse", "both"):
                if self.doc_codes is None:
                    raise ValueError("coarse metrics need doc_codes")
                gt_codes = np.where(
                    gt_mat[sl][..., None] >= 0,
                    self.doc_codes[np.maximum(gt_mat[sl], 0)], -1)
                all_coarse_ranks.append(coarse_ranks(
                    res.beam_codes, gt_codes, self.model.dims.kary))
            if res.fine_ids is not None:
                all_fine_ranks.append(ranks_of_gts(res.fine_ids,
                                                   gt_mat[sl]))

        out = EvalOutputs(results=results if keep_results else None)
        if all_coarse_ranks:
            cranks = np.concatenate(all_coarse_ranks)
            ks = sorted({k for k in cfg.recall_num
                         if k <= cfg.num_return_sequences}
                        | {cfg.num_return_sequences})
            out.coarse = metrics_from_rank_matrix(cranks, gt_counts, ks)
            out.nonempty_hit = float((cranks >= 0).any(1).mean())
        if all_fine_ranks:
            franks = np.concatenate(all_fine_ranks)
            out.fine = metrics_from_rank_matrix(franks, gt_counts,
                                                cfg.recall_num)
        if ndocs:
            out.ndoc_per_query = float(np.concatenate(ndocs).mean())
        return out


    def evaluate_nq(self, queries: List[str], query_ids: np.ndarray,
                    query_mask: np.ndarray, query_indices: Sequence[int],
                    answer_index, batch_size: int = 16,
                    keep_results: bool = False) -> EvalOutputs:
        """NQ answer-set evaluation (``main_models.py:3738-3756,
        4061-4077``): a query 'hits' at the first ranked doc whose answer
        set contains it; coarse hit = first beam whose cluster contains
        any answering doc."""
        cfg = self.cfg
        n = len(queries)
        coarse_hits, fine_hits, ndocs, results = [], [], [], []
        from ..index.csr import pack_codes
        host_off = (np.asarray(self.fine_index.host_offsets)
                    if self.fine_index is not None and
                    self.fine_index.host_offsets is not None else None)
        host_ids = (np.asarray(self.fine_index.host_doc_ids)
                    if self.fine_index is not None and
                    self.fine_index.host_doc_ids is not None else None)
        q_clus_off = q_clus = None
        if cfg.recall_level in ("coarse", "both") and host_off is not None:
            # vectorized coarse hit check: invert the answer arrays to
            # query -> answering clusters ONCE (O(nnz)); the per-beam
            # cluster-member walk is then a tiny np.isin per query
            n_docs = len(host_ids)
            cluster_of_doc = np.zeros(n_docs, np.int64)
            cluster_of_doc[host_ids] = np.repeat(
                np.arange(len(host_off) - 1), np.diff(host_off))
            nq_total = int(answer_index.array.max()) + 1 \
                if len(answer_index.array) else 1
            nq_total = max(nq_total, int(max(query_indices)) + 1)
            q_clus_off, q_clus = answer_index.query_clusters(
                cluster_of_doc, nq_total)
        for s in range(0, n, batch_size):
            sl = slice(s, min(s + batch_size, n))
            (qi, qm), real = pad_batch(
                [query_ids[sl], query_mask[sl]], batch_size)
            res = self.run_batch(list(queries[sl.start:sl.stop]), qi, qm)
            res.beam_codes = res.beam_codes[:real]
            if res.fine_ids is not None:
                res.fine_ids = res.fine_ids[:real]
                res.ndoc = res.ndoc[:real]
                ndocs.append(res.ndoc)
            if keep_results:
                results.append(res)
            qind_b = np.asarray(query_indices[sl.start:sl.start + real],
                                np.int64)
            if q_clus_off is not None:
                for b in range(real):
                    qind = int(qind_b[b])
                    cidx = pack_codes(res.beam_codes[b],
                                      self.fine_index.kary)
                    mine = q_clus[q_clus_off[qind]:q_clus_off[qind + 1]]
                    isin = np.isin(cidx, mine)
                    hit = int(isin.argmax()) if isin.any() else -1
                    coarse_hits.append(hit)
            if res.fine_ids is not None:
                # batched first-hit (one searchsorted per batch replaces
                # the per-query per-rank walk, main_models.py:4069-4071)
                fine_hits.extend(answer_index.first_hit_ranks(
                    qind_b, res.fine_ids[:real]).tolist())

        out = EvalOutputs(results=results if keep_results else None)
        ones = np.ones(n, np.int64)
        if coarse_hits:
            ks = sorted({k for k in cfg.recall_num
                         if k <= cfg.num_return_sequences}
                        | {cfg.num_return_sequences})
            out.coarse = metrics_from_rank_matrix(
                np.asarray(coarse_hits)[:, None], ones, ks)
        if fine_hits:
            out.fine = metrics_from_rank_matrix(
                np.asarray(fine_hits)[:, None], ones, cfg.recall_num)
        if ndocs:
            out.ndoc_per_query = float(np.concatenate(ndocs).mean())
        return out


def write_result_files(outputs: EvalOutputs, gt_docids: List[List[int]],
                       coarse_path: Optional[str] = None,
                       fine_path: Optional[str] = None,
                       hardneg_path: Optional[str] = None,
                       hard_neg_k: int = 0) -> None:
    """Write the ensemble-facing tsvs (``main_models.py:4227-4235``).

    ``hard_neg_k``: cap the hard-negative list per query
    (``--save_hard_neg``, ``main_models.py:4046-4053``); 0 = pool size.
    """
    assert outputs.results is not None, "evaluate(keep_results=True)"
    qi = 0
    coarse_rows, fine_rows, hn_rows = [], [], []
    for res in outputs.results:
        for b in range(len(res.queries)):
            gts = gt_docids[qi]
            if coarse_path:
                coarse_rows.append((
                    res.queries[b],
                    [c.tolist() for c in res.beam_codes[b]],
                    gts, res.beam_scores[b].tolist()))
            if res.fine_ids is not None:
                ids = [int(d) for d in res.fine_ids[b] if d >= 0]
                if fine_path:
                    fine_rows.append((res.queries[b],
                                      int(res.ndoc[b]), ids, gts))
                if hardneg_path:
                    k = hard_neg_k or len(ids)
                    hn_rows.append((
                        res.queries[b], [],
                        ids[:k], res.fine_scores[b][:min(
                            k, len(ids))].tolist()))
            qi += 1
    if coarse_path:
        io.write_coarse_results(coarse_path, coarse_rows)
    if fine_path:
        io.write_fine_results(fine_path, fine_rows)
    if hardneg_path:
        io.write_hardneg_results(hardneg_path, hn_rows)
