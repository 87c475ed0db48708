"""Synthetic hierarchical corpus + query language (bench / quality runs).

The reference demonstrates retrieval quality with trained checkpoints on
MS MARCO (coarse recall@100 = 0.886079,
``MEVI/marco_eval_nci_rq.sh:29``); real MARCO data is unavailable in
this environment, so this module is the shared generative family used by
``bench.py`` and ``scripts/quality_full.py`` — one spec, one corpus,
reproducible across the training run and the serving bench:

* **corpus**: 3-level shared-sons hierarchy (per-level Zipf skew) plus a
  leaf-noise POOL; a document is fully determined by 4 small ints
  (h1, h2, h3, pool row), so corpus-scale embedding matrices are
  synthesized straight into HBM from MB-scale tables — no host
  materialization of the (ndoc, d) matrix.  Rows are unit-norm so
  max-inner-product == nearest-L2 and the L2-fit RQ index ranks by the
  same objective as the exact-MIPS oracle.
* **query language**: a query names its document through INFO tokens —
  the 3 hierarchy choices plus the pool row in base-kary digits —
  scattered at spec-fixed positions among fresh random FILLER tokens.
  The info is information-COMPLETE (the embedding is a deterministic
  function of the 4 ints, hence so is its RQ code) and COMPOSITIONAL
  (pool rows are shared across all docs), so the NCI task is function
  learning rather than per-doc memorization — the regime the
  reference's qg10 augmentation approximates (10 generated queries per
  doc across all 8.8M docs, ``dataprocess/msmarco_passage/
  doc2query.py:25-97``).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class SynthSpec:
    """Deterministic description of a synthetic corpus + query language.

    Everything (tables, draws, tokens) is derived from ``seed``; two
    processes with the same spec reconstruct identical corpora.
    """
    ndoc: int = 1_000_000
    d: int = 768
    kary: int = 32                 # RQ centroids/level AND digit base
    levels: int = 4                # RQ levels (M)
    pool_n: int = 32 ** 3          # leaf-noise pool rows (3 digits)
    scales: Tuple[float, ...] = (1.0, 0.42, 0.18)
    zipf: Tuple[float, ...] = (1.1, 0.8, 0.5)
    eps: float = 0.06              # leaf-noise per-component std
    seed: int = 0
    qlen: int = 32                 # query tokens
    n_filler_vocab: int = 256
    info_dropout: float = 0.0      # P(info token replaced by filler)

    @property
    def n_info(self) -> int:
        return 3 + self._row_digits

    @property
    def _row_digits(self) -> int:
        n, k = 1, self.kary
        while k ** n < self.pool_n:
            n += 1
        return n

    @property
    def vocab_size(self) -> int:
        """0 = pad/start; 1 = unused; then per-slot info regions, then
        fillers; rounded up to a multiple of 128 (MXU-friendly)."""
        v = 2 + self.n_info * self.kary + self.n_filler_vocab
        return v + (-v) % 128

    def cache_dir(self, base: str = "/tmp/mevi_synth") -> str:
        key = hashlib.sha1(json.dumps(
            dataclasses.asdict(self), sort_keys=True).encode()).hexdigest()
        return os.path.join(base, key[:16])


def make_tables(spec: SynthSpec) -> Tuple[np.ndarray, np.ndarray]:
    """(ctrs (3, kary, d) f32, pool (pool_n, d) f32) — host-side,
    ~MBs; move to device once and generate rows there."""
    host = np.random.default_rng(spec.seed)
    ctrs = np.stack([
        host.normal(size=(spec.kary, spec.d)).astype(np.float32) * s
        for s in spec.scales])
    pool = (host.standard_normal((spec.pool_n, spec.d))
            * spec.eps).astype(np.float32)
    return ctrs, pool


def make_draws(spec: SynthSpec) -> np.ndarray:
    """(ndoc, 4) int32 [h1, h2, h3, pool_row] with per-level Zipf skew
    (realistic cluster-size imbalance)."""
    host = np.random.default_rng(spec.seed + 1)
    draws = np.empty((spec.ndoc, 4), np.int32)
    for j, a in enumerate(spec.zipf):
        p = 1.0 / np.arange(1, spec.kary + 1) ** a
        draws[:, j] = host.choice(spec.kary, size=spec.ndoc, p=p / p.sum())
    draws[:, 3] = host.integers(0, spec.pool_n, spec.ndoc)
    return draws


def gen_rows(tables, draws):
    """Device row generator: (ctrs (3,K,D), pool) x (n, 4) -> (n, d)
    unit-norm.  jit / scan-friendly (pure jnp)."""
    import jax.numpy as jnp
    ctrs, pool = tables
    v = (ctrs[0][draws[:, 0]] + ctrs[1][draws[:, 1]]
         + ctrs[2][draws[:, 2]] + pool[draws[:, 3]])
    return v / jnp.linalg.norm(v, axis=1, keepdims=True)


def fit_rq_codes(spec: SynthSpec, tables_dev, draws: np.ndarray,
                 cache_base: str = "/tmp/mevi_synth",
                 fit_sample: int = 500_000, iters: int = 8,
                 codebooks: Optional[np.ndarray] = None,
                 center_levels: bool = False,
                 prefix_shift=None,
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Fit RQ (levels x kary) on a sample and assign every doc; cached
    as npy under the spec's cache dir.  Returns (codebooks (M,K,d) f32
    np, codes (ndoc, M) int32 np).  When conditioning tables are
    produced (``center_levels``) they are saved next to the cached
    codebooks as ``prefix_shift.npz`` (keys l1..l{M-1}) — callers that
    persist the codebooks must persist them too, and the
    ``codebooks=`` re-assign path must pass them back via
    ``prefix_shift=`` (list of per-level arrays).

    ``codebooks``: skip the fit and assign with these (serving a
    trained bundle over a LARGER corpus of the same generative family —
    codes must come from the codebooks the NCI was trained against).
    ``center_levels``: see ``ops.rq.rq_train`` — hierarchical
    by-residual conditioning so leaf buckets subdivide (cap-truncation
    fix at scale).
    """
    import jax
    import jax.numpy as jnp
    from ..ops import rq as rq_ops
    cdir = spec.cache_dir(cache_base)
    if center_levels and codebooks is None:
        cdir += "_hrq"
    if codebooks is not None:
        import hashlib as _h
        h = _h.sha1(np.ascontiguousarray(codebooks))
        if prefix_shift is not None:
            for t in prefix_shift:
                h.update(np.ascontiguousarray(t))
        cdir += "_cb" + h.hexdigest()[:8]
    os.makedirs(cdir, exist_ok=True)
    cbs_p = os.path.join(cdir, "codebooks.npy")
    codes_p = os.path.join(cdir, "codes.npy")
    shift_p = os.path.join(cdir, "prefix_shift.npz")
    if os.path.exists(cbs_p) and os.path.exists(codes_p):
        return np.load(cbs_p), np.load(codes_p)
    shift_dev = None if prefix_shift is None else \
        [jnp.asarray(t, jnp.float32) for t in prefix_shift]
    if codebooks is not None:
        cbs = jnp.asarray(codebooks, jnp.float32)
    else:
        fit_rng = np.random.default_rng(spec.seed + 7)
        nfit = min(spec.ndoc, fit_sample)
        sample = gen_rows(tables_dev, jnp.asarray(
            draws[fit_rng.choice(spec.ndoc, size=nfit, replace=False)]))
        if center_levels:
            cbs, _, shift_dev = rq_ops.rq_train(
                sample, levels=spec.levels, kary=spec.kary, iters=iters,
                key=jax.random.PRNGKey(spec.seed + 11),
                center_levels=True)
            np.savez(shift_p, **{f"l{i + 1}": np.asarray(t, np.float32)
                                 for i, t in enumerate(shift_dev)})
        else:
            cbs, _ = rq_ops.rq_train(
                sample, levels=spec.levels, kary=spec.kary, iters=iters,
                key=jax.random.PRNGKey(spec.seed + 11))
        del sample
        cbs = cbs.astype(jnp.float32)

    @jax.jit
    def gen_assign(tables, dr, cbs, shift):
        return rq_ops.assign(gen_rows(tables, dr), cbs, "rq", "l2",
                             prefix_shift=shift)

    CH = 1 << 19
    codes = np.empty((spec.ndoc, spec.levels), np.int32)
    for s in range(0, spec.ndoc, CH):
        e = min(spec.ndoc, s + CH)
        codes[s:e] = np.asarray(
            gen_assign(tables_dev, jnp.asarray(draws[s:e]), cbs,
                       shift_dev))
    cbs_h = np.asarray(cbs)
    np.save(cbs_p, cbs_h)
    np.save(codes_p, codes)
    return cbs_h, codes


def load_prefix_shift(path: str):
    """Load a prefix_shift.npz (keys l1..l{M-1}) back into the ordered
    per-level list ``assign(prefix_shift=...)`` expects."""
    z = np.load(path)
    return [z[f"l{i + 1}"] for i in range(len(z.files))]


def info_positions(spec: SynthSpec) -> np.ndarray:
    """Spec-fixed scatter of the info slots across the query."""
    host = np.random.default_rng(spec.seed + 3)
    return np.sort(host.choice(spec.qlen, size=spec.n_info,
                               replace=False))


def query_tokens(spec: SynthSpec, draws_rows: np.ndarray,
                 rng: np.random.Generator) -> np.ndarray:
    """Tokenize utterances for docs given their (n, 4) draws.

    Filler tokens are FRESH per call (an unseen utterance for the same
    doc); info tokens are deterministic.  ``info_dropout`` > 0 replaces
    each info token by a random filler with that probability (lossy
    queries).  Returns (n, qlen) int32.
    """
    n = len(draws_rows)
    filler_lo = 2 + spec.n_info * spec.kary
    tok = rng.integers(filler_lo, filler_lo + spec.n_filler_vocab,
                       size=(n, spec.qlen)).astype(np.int32)
    h = draws_rows[:, :3].T
    row = draws_rows[:, 3].astype(np.int64)
    digits = []
    r = row.copy()
    for _ in range(spec._row_digits):
        digits.append(r % spec.kary)
        r //= spec.kary
    info = np.stack(list(h) + digits)          # (n_info, n)
    pos = info_positions(spec)
    for j, p in enumerate(pos):
        tok[:, p] = 2 + j * spec.kary + info[j]
    if spec.info_dropout > 0:
        drop = rng.random((n, len(pos))) < spec.info_dropout
        repl = rng.integers(filler_lo, filler_lo + spec.n_filler_vocab,
                            size=(n, len(pos))).astype(np.int32)
        for j, p in enumerate(pos):
            tok[:, p] = np.where(drop[:, j], repl[:, j], tok[:, p])
    return tok


def fill_sorted_matrix(spec: SynthSpec, tables_dev, draws: np.ndarray,
                       doc_ids: np.ndarray, n_pad_rows: int,
                       dtype, q_scale=None):
    """Synthesize the cluster-sorted (CSR-permuted) embedding matrix
    straight into HBM as ONE ``lax.scan`` program (separate per-chunk
    dispatches each pre-allocate generator temporaries at enqueue time
    and can OOM next to the big buffer; a scan allocates one temp set).

    ``doc_ids``: CSR row -> original doc id permutation.
    ``q_scale``: when set, rows are ``round(row * q_scale)`` int8.
    Returns the (n_rows + n_pad_rows, d) device buffer.
    """
    import jax
    import jax.numpy as jnp
    from functools import partial
    ndoc = len(doc_ids)
    n_pad = ndoc + n_pad_rows
    n_pad += (-n_pad) % 8
    buf = jnp.zeros((n_pad, spec.d), dtype)
    CH = min(1 << 16, ndoc)
    starts = list(range(0, ndoc - CH + 1, CH))
    if starts[-1] + CH < ndoc:
        starts.append(ndoc - CH)       # re-covers the tail in range
    dr_all = np.stack([draws[doc_ids[s:s + CH]] for s in starts])

    @partial(jax.jit, donate_argnums=(0,))
    def fill_all(buf, tables, dr_all, starts):
        def body(b, xs):
            dr, i = xs
            row = gen_rows(tables, dr)
            if q_scale is not None:
                row = jnp.clip(jnp.round(row * q_scale), -127, 127)
            row = row.astype(b.dtype)
            return jax.lax.dynamic_update_slice_in_dim(
                b, row, i, 0), ()
        return jax.lax.scan(body, buf, (dr_all, starts))[0]

    return fill_all(buf, tables_dev, jnp.asarray(dr_all),
                    jnp.asarray(starts, jnp.int32))


def save_spec(spec: SynthSpec, path: str) -> None:
    with open(path, "w") as fw:
        json.dump(dataclasses.asdict(spec), fw, indent=1)


def load_spec(path: str) -> SynthSpec:
    with open(path) as fr:
        return SynthSpec(**json.load(fr))
