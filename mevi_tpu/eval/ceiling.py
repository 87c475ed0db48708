"""Data-ceiling bounds for the synthetic query language.

``data/synth.py`` queries name their document through info tokens that
are independently replaced by fillers with ``spec.info_dropout`` — so
retrieval quality on this corpus has a computable information-theoretic
ceiling.  Nothing here trains or serves; these bounds calibrate the
trained numbers (the reference regime's analogue: MS MARCO dev has a
human/annotation ceiling nobody reports against; here we CAN compute
ours, so QUALITY artifacts report measured/ceiling).

Two bounds, both per-query exact:

* **Bayes bound** — the posterior over docs given a corrupted query is
  UNIFORM over the docs consistent with the observed info tokens
  (observed tokens are never corrupted-in-place: corruption maps into
  the filler range, and slot vocab regions are disjoint, so an
  info-region token is always the true value and a filler at an info
  position is always a dropout).  With ``|C|`` consistent docs:
  ``recall@k = E[min(1, k/|C|)]``, ``mrr@10 = E[H(min(10,|C|))/|C|]``,
  and the coarse bound picks the 10 codes covering the most candidates:
  ``hit@10 = E[top10_code_mass/|C|]``.  No retriever of ANY
  architecture beats these on this data.

* **Oracle single-vector tower** — the best *embedding* retriever maps
  the query to one vector and ranks by inner product; the natural
  optimum is the posterior-mean document embedding: observed hierarchy
  slots contribute their centroid row, dropped ones the Zipf-prior
  mean centroid, and the pool contributes the mean of pool rows
  consistent with the observed row digits.  Exact-MIPS metrics of
  these vectors bound what the TRAINED tower (same interface) can do —
  the gap Bayes-vs-oracle-tower is architectural, the gap
  oracle-tower-vs-trained is training headroom.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..data.synth import SynthSpec, info_positions
from ..index.csr import pack_codes


def observed_info(spec: SynthSpec, tok: np.ndarray) -> np.ndarray:
    """(n, qlen) query tokens -> (n, n_info) observed slot values,
    -1 where the info token was dropped (filler in its place).

    Slot j's vocab region is [2 + j*kary, 2 + (j+1)*kary); fillers live
    strictly above every region, so detection is exact."""
    pos = info_positions(spec)
    n = tok.shape[0]
    out = np.full((n, spec.n_info), -1, np.int32)
    for j, p in enumerate(pos):
        v = tok[:, p].astype(np.int64) - (2 + j * spec.kary)
        ok = (v >= 0) & (v < spec.kary)
        out[:, j] = np.where(ok, v, -1).astype(np.int32)
    return out


def doc_attrs(spec: SynthSpec, draws: np.ndarray) -> np.ndarray:
    """(ndoc, 4) draws -> (ndoc, n_info) attribute matrix in the same
    slot order the query tokens use: h1, h2, h3, row digits LSB-first
    (matching synth.query_tokens digit order)."""
    rd = spec._row_digits
    attrs = np.empty((len(draws), 3 + rd), np.int32)
    attrs[:, :3] = draws[:, :3]
    r = draws[:, 3].astype(np.int64)
    for k in range(rd):
        attrs[:, 3 + k] = (r % spec.kary).astype(np.int32)
        r //= spec.kary
    return attrs


def candidate_stats(spec: SynthSpec, draws: np.ndarray,
                    codes: np.ndarray, obs: np.ndarray,
                    gt_docs: np.ndarray, top_codes: int = 10,
                    chunk: int = 128,
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per query: (|C|, top-``top_codes`` candidate-code mass,
    gt-code candidate mass).  ``codes``: (ndoc, M) RQ codes."""
    attrs = doc_attrs(spec, draws)                   # (ndoc, n_info)
    cidx = np.asarray(pack_codes(codes, spec.kary)).astype(np.int64)
    n = obs.shape[0]
    counts = np.zeros(n, np.int64)
    topmass = np.zeros(n, np.int64)
    gtmass = np.zeros(n, np.int64)
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        o = obs[s:e]                                 # (c, n_info)
        # (c, ndoc): doc consistent with every observed slot
        m = np.ones((e - s, len(attrs)), bool)
        for j in range(spec.n_info):
            oj = o[:, j]
            rel = oj >= 0
            if rel.any():
                m[rel] &= attrs[None, :, j] == oj[rel, None]
        counts[s:e] = m.sum(1)
        for i in range(e - s):
            cand = np.nonzero(m[i])[0]
            cc = np.bincount(cidx[cand])
            order = np.sort(cc[cc > 0])[::-1]
            topmass[s + i] = order[:top_codes].sum()
            gtmass[s + i] = cc[cidx[gt_docs[s + i]]] \
                if cidx[gt_docs[s + i]] < len(cc) else 0
    return counts, topmass, gtmass


def bayes_bounds(spec: SynthSpec, draws: np.ndarray, codes: np.ndarray,
                 tok: np.ndarray, gt_docs: np.ndarray,
                 ks=(1, 10, 100)) -> Dict[str, float]:
    """Information-theoretic ceiling of ANY retriever on these queries."""
    obs = observed_info(spec, tok)
    counts, topmass, gtmass = candidate_stats(spec, draws, codes, obs,
                                              gt_docs)
    assert (counts >= 1).all(), "gt doc must be consistent with its query"
    out = {f"bayes_recall@{k}":
           round(float(np.minimum(1.0, k / counts).mean()), 4)
           for k in ks}
    H = np.cumsum(1.0 / np.arange(1, 11))            # H[m-1] = sum 1/i
    m = np.minimum(counts, 10)
    out["bayes_mrr@10"] = round(float((H[m - 1] / counts).mean()), 4)
    # coarse: 10 best codes cover topmass candidates; gt uniform in C.
    out["bayes_coarse_hit@10"] = round(
        float((np.minimum(topmass, counts) / counts).mean()), 4)
    # hit@1 bound: the single best code's mass / |C| is what the best
    # top-1 decoder achieves (top-beam picks the modal candidate code)
    out["mean_candidates"] = round(float(counts.mean()), 1)
    out["median_candidates"] = float(np.median(counts))
    out["p_all_observed"] = round(float((obs >= 0).all(1).mean()), 4)
    return out


def oracle_tower_embeddings(spec: SynthSpec, tables, obs: np.ndarray,
                            ) -> np.ndarray:
    """Posterior-mean document embedding per query -> (n, d) f32.

    Hierarchy slots: observed -> centroid row; dropped -> Zipf-prior
    mean centroid (the corpus marginal).  Pool: mean of pool rows
    consistent with the observed row digits (all dropped -> global
    pool mean ~ 0)."""
    ctrs, pool = (np.asarray(t, np.float32) for t in tables)
    n = obs.shape[0]
    q = np.zeros((n, spec.d), np.float32)
    for j, a in enumerate(spec.zipf):
        p = 1.0 / np.arange(1, spec.kary + 1) ** a
        p /= p.sum()
        prior_mean = p @ ctrs[j]
        oj = obs[:, j]
        q += np.where(oj[:, None] >= 0,
                      ctrs[j][np.maximum(oj, 0)], prior_mean[None])
    rd = spec._row_digits
    # row digits: group queries by identical (observed-digit) pattern
    # to average pool rows once per distinct constraint
    rows_all = np.arange(spec.pool_n, dtype=np.int64)
    digs = np.stack([(rows_all // spec.kary ** k) % spec.kary
                     for k in range(rd)], 1)         # (pool_n, rd)
    od = obs[:, 3:3 + rd]
    for i in range(n):
        oi = od[i]
        if (oi >= 0).all():
            r = int(sum(int(oi[k]) * spec.kary ** k for k in range(rd)))
            q[i] += pool[r]
        else:
            m = np.ones(spec.pool_n, bool)
            for k in range(rd):
                if oi[k] >= 0:
                    m &= digs[:, k] == oi[k]
            q[i] += pool[m].mean(0)
    return q


def exact_mips_metrics(q: np.ndarray, spec: SynthSpec, tables, draws,
                       gt_docs: np.ndarray, k: int = 100,
                       chunk_docs: int = 1 << 16) -> Dict[str, float]:
    """Exact-MIPS recall/MRR of query vectors against the full corpus
    (rows generated on device chunk-wise; no (ndoc, d) host temp)."""
    import jax
    import jax.numpy as jnp
    from ..data.synth import gen_rows
    tables_dev = (jnp.asarray(tables[0]), jnp.asarray(tables[1]))
    qd = jnp.asarray(q, jnp.float32)
    n = q.shape[0]
    ndoc = spec.ndoc
    nch = (ndoc + chunk_docs - 1) // chunk_docs
    pad = nch * chunk_docs - ndoc
    draws_p = np.concatenate([draws, draws[:1].repeat(pad, 0)]) \
        if pad else draws

    @jax.jit
    def scan_all(q, dr_all):
        def body(carry, xs):
            bs, bi = carry
            dr, base = xs
            d = gen_rows(tables_dev, dr)
            s = q @ d.T                               # (n, chunk)
            # int32 doc ids: ndoc <= 2^31 always holds here (and jax
            # silently folds int64 to int32 without x64 anyway)
            idx = base + jnp.arange(d.shape[0], dtype=jnp.int32)
            cs = jnp.concatenate([bs, s], 1)
            ci = jnp.concatenate(
                [bi, jnp.broadcast_to(idx[None], s.shape)], 1)
            ts, ti = jax.lax.top_k(cs, k)
            return (ts, jnp.take_along_axis(ci, ti, 1)), ()
        init = (jnp.full((n, k), -jnp.inf, jnp.float32),
                jnp.full((n, k), -1, jnp.int32))
        bases = jnp.arange(nch, dtype=jnp.int32) * chunk_docs
        (s, i), _ = jax.lax.scan(
            body, init, (dr_all.reshape(nch, chunk_docs, -1), bases))
        return s, i
    scores, ids = scan_all(qd, jnp.asarray(draws_p))
    ids = np.asarray(ids)
    # pad rows duplicate doc 0 at fake ids >= ndoc: mask them out
    ids = np.where(ids < ndoc, ids, -1)
    found = ids == gt_docs[:, None]
    pos = np.argmax(found, 1)
    hit = found.any(1)
    out = {f"recall@{kk}": round(float(((pos < kk) & hit).mean()), 4)
           for kk in (1, 10, 100) if kk <= k}
    out["mrr@10"] = round(float(
        np.where(hit & (pos < 10), 1.0 / (pos + 1), 0.0).mean()), 4)
    return out


def ceiling_report(spec: SynthSpec, tables, draws: np.ndarray,
                   codes: np.ndarray, tok: np.ndarray,
                   gt_docs: np.ndarray) -> Dict[str, float]:
    """Full ceiling bundle for a dev set: Bayes bounds + oracle-tower
    exact-MIPS metrics (keys prefixed ``oracle_tower_``)."""
    out = bayes_bounds(spec, draws, codes, tok, gt_docs)
    obs = observed_info(spec, tok)
    q = oracle_tower_embeddings(spec, tables, obs)
    m = exact_mips_metrics(q, spec, tables, draws, gt_docs)
    out.update({f"oracle_tower_{k}": v for k, v in m.items()})
    return out
