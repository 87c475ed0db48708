"""Residual quantization (RQ) — and PQ — on TPU.

TPU-native rebuild of ``MEVI/pq.py``'s ProductQuantization:

* training: per-level k-means over residuals (``pq.py:582-594``) using the
  on-device Lloyd kernel in :mod:`.kmeans` instead of rank0 CPU sklearn;
* assignment: per-level nearest centroid + residual subtraction
  (``pq.py:337-369`` / ``pq.py:281-305``);
* reconstruction: sum of selected centroids over levels (``pq.py:768-784``);
* codebook beam search over the code space for per-doc top-k codes
  (``pq.py:613-713``), vectorized as a fixed-depth scan;
* EMA codebook update with dead-code restart (``pq.py:371-433``);
* Hungarian codebook alignment across refits (``pq.py:600-611``).

Codebooks are a dense (M, K, d) array; codes are int32 (n, M).
dist_mode 'l2' is the reference default (``main.py:556``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans import _sim, kmeans_fit


class RQCodebook(NamedTuple):
    """RQ/PQ codebooks plus geometry."""
    codebooks: jnp.ndarray   # (M, K, d) — d = emb for rq, emb//M for pq
    pq_type: str = "rq"
    dist_mode: str = "l2"

    @property
    def levels(self) -> int:
        return self.codebooks.shape[0]

    @property
    def kary(self) -> int:
        return self.codebooks.shape[1]


def full_sim(x: jnp.ndarray, cb: jnp.ndarray, dist_mode: str) -> jnp.ndarray:
    """(n, d) x (K, d) -> (n, K); for 'l2' returns the *complete*
    -||x-c||^2 (matching ``pq.py:124-131``), unlike kmeans._sim which
    drops the per-row constant."""
    s = _sim(x, cb, dist_mode)
    if dist_mode == "l2":
        s = s - jnp.sum(x.astype(jnp.float32) ** 2, -1, keepdims=True)
    return s


# --------------------------------------------------------------------------
# assignment / logits
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("pq_type", "dist_mode"))
def assign(emb: jnp.ndarray, codebooks: jnp.ndarray,
           pq_type: str = "rq", dist_mode: str = "l2",
           prefix_shift=None) -> jnp.ndarray:
    """Codes (n, M) int32 for a batch of embeddings.

    ``prefix_shift`` (rq only): per-level by-residual conditioning
    tables — a sequence of M-1 arrays, the level-i table of shape
    (K^i, d) keyed by the packed prefix of levels 0..i-1 and
    subtracted from the residual before level i's argmin (faiss IVF's
    ``by_residual`` encoding generalized to every RQ level = exact
    hierarchical residual quantization; see
    ``rq_train(center_levels=True)``, which produces the tables)."""
    return assign_with_logits(emb, codebooks, pq_type, dist_mode,
                              prefix_shift)[0]


@partial(jax.jit, static_argnames=("pq_type", "dist_mode"))
def assign_with_logits(emb: jnp.ndarray, codebooks: jnp.ndarray,
                       pq_type: str = "rq", dist_mode: str = "l2",
                       prefix_shift=None,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Codes (n, M) and per-level similarity logits (n, M, K).

    Mirrors ``forward_rq``/``forward_pq`` (``pq.py:319-369``): logits are
    the raw similarity scores (ip or -l2) fed to the PQ-distillation loss.
    ``prefix_shift``: see :func:`assign`.
    """
    M, K, d = codebooks.shape
    n = emb.shape[0]
    if pq_type == "rq":
        if prefix_shift is None or M == 1:
            def body(resid, cb):
                logit = full_sim(resid, cb, dist_mode)          # (n, K)
                idx = jnp.argmax(logit, axis=-1).astype(jnp.int32)
                resid = resid - cb[idx].astype(resid.dtype)
                return resid, (idx, logit)
            _, (codes, logits) = jax.lax.scan(body, emb, codebooks)
            return codes.T, jnp.moveaxis(logits, 0, 1)
        assert len(prefix_shift) == M - 1, \
            "prefix_shift: one table per level 1..M-1"
        resid = emb
        pref = None
        codes, logits = [], []
        for i in range(M):
            if i > 0:
                resid = resid - prefix_shift[i - 1][pref] \
                    .astype(resid.dtype)
            x = resid
            if i == M - 1:
                # spherical last level (center_levels contract): the
                # centered residual's NORM varies by orders of
                # magnitude across prefixes (leftover structure vs
                # within-cluster deviation); quantize its DIRECTION so
                # small-deviation clouds spread over cells instead of
                # collapsing into the one nearest zero
                x = resid / (jnp.linalg.norm(resid, axis=-1,
                                             keepdims=True) + 1e-12)
            logit = full_sim(x, codebooks[i], dist_mode)
            idx = jnp.argmax(logit, axis=-1).astype(jnp.int32)
            codes.append(idx)
            logits.append(logit)
            if i < M - 1:
                resid = resid - codebooks[i][idx].astype(resid.dtype)
                pref = idx if pref is None else pref * K + idx
        return (jnp.stack(codes, 1), jnp.stack(logits, 1))
    else:  # pq: split the embedding into M subvectors
        sub = emb.reshape(n, M, d)
        def level(x, cb):
            logit = full_sim(x, cb, dist_mode)
            return jnp.argmax(logit, -1).astype(jnp.int32), logit
        codes, logits = jax.vmap(level, in_axes=(1, 0), out_axes=(1, 1))(
            sub, codebooks)
        return codes, logits


@partial(jax.jit, static_argnames=("pq_type",))
def reconstruct(codes: jnp.ndarray, codebooks: jnp.ndarray,
                pq_type: str = "rq", prefix_shift=None) -> jnp.ndarray:
    """(n, M) codes -> (n, emb) vectors (``pq.py:768-784``).

    ``prefix_shift``: per-level conditioning tables of a
    ``center_levels`` quantizer — added back so reconstruction matches
    the conditioned assignment's geometry."""
    M, K, d = codebooks.shape
    picked = jax.vmap(lambda cb, c: cb[c], in_axes=(0, 1), out_axes=1)(
        codebooks, codes)                                       # (n, M, d)
    if pq_type == "rq":
        out = jnp.sum(picked, axis=1)
        if prefix_shift is not None and M > 1:
            pref = codes[:, 0].astype(jnp.int32)
            for i in range(1, M):
                out = out + prefix_shift[i - 1][pref].astype(out.dtype)
                if i < M - 1:
                    pref = pref * K + codes[:, i]
            return out
        return out
    return picked.reshape(codes.shape[0], M * d)


@partial(jax.jit, static_argnames=("pq_type", "chunk"))
def reconstruction_mse(emb: jnp.ndarray, codes: jnp.ndarray,
                       codebooks: jnp.ndarray, pq_type: str = "rq",
                       chunk: int = 65536) -> jnp.ndarray:
    """Mean squared residual after reconstruction (index-quality metric;
    the training-loss variant per ``pq.py:743-766`` stacks per-level
    residuals — see train/losses.py).  Chunked: the (n, M, d) picked
    centroids never materialize (11GB+ at corpus scale)."""
    from .topk import chunk_ids_clamped
    n = emb.shape[0]
    c = min(chunk, n)
    num_chunks = -(-n // c)

    def body(acc, ci):
        start, ids = chunk_ids_clamped(ci, c, n)
        e = jax.lax.dynamic_slice_in_dim(emb, start, c, 0)
        cd = jax.lax.dynamic_slice_in_dim(codes, start, c, 0)
        rec = reconstruct(cd, codebooks, pq_type)
        sq = jnp.sum((e.astype(jnp.float32) - rec.astype(jnp.float32))**2,
                     axis=-1)
        sq = jnp.where(ids >= 0, sq, 0.0)
        return acc + jnp.sum(sq), None

    total, _ = jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(num_chunks))
    return total / (n * emb.shape[1])


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------

def rq_train(
    emb: jnp.ndarray,
    levels: int,
    kary: int,
    iters: int = 25,
    key: Optional[jax.Array] = None,
    dist_mode: str = "l2",
    pq_type: str = "rq",
    chunk: int = 65536,
    init_codebooks: Optional[jnp.ndarray] = None,
    center_levels: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Train codebooks with per-level k-means over residuals.

    Mirrors ``unsupervised_update_codebook_manually`` (``pq.py:550-598``):
    level i fits k-means on the residual after subtracting levels < i
    (rq) or on the i-th subvector (pq).  Returns (codebooks (M,K,d),
    codes (n, M)).

    ``center_levels`` (rq only): per-level by-residual conditioning —
    exact hierarchical residual quantization.  On clustered corpora
    the level-i residual is dominated by a per-PREFIX offset (the
    additive codebooks' fit error for that prefix) rather than
    within-prefix variation, so plain k-means degenerates: every doc
    of a prefix gets the same next code and leaf buckets never
    subdivide (measured on the 1M synth corpus: 78% of populated
    prefixes collapsed to ONE leaf, 27k leaves of a possible 1M;
    conditioning only the LAST level regrouped but still did not
    split, because 3-level prefixes were coarser than the true
    cluster structure).  With ``center_levels`` each level i >= 1
    gains a shift table ((kary^i, d) f32, the per-prefix residual
    mean — zero for unseen prefixes) subtracted before that level's
    k-means at fit AND assign time (``assign(prefix_shift=[...])``) —
    faiss IVF's ``by_residual`` encoding relative to the list
    centroid, applied at every level, so each level quantizes pure
    WITHIN-prefix structure.  Returns (codebooks, codes,
    prefix_shift list).  Requires kary^(levels-1) <= 2^20 prefixes.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n, emb_size = emb.shape
    cbs = []
    codes = []
    shifts = []
    if pq_type == "rq":
        if center_levels:
            assert kary ** (levels - 1) <= (1 << 20), \
                "center_levels: too many prefixes to segment"
        resid = emb
        pref = None
        for i in range(levels):
            key, sub = jax.random.split(key)
            init_c = None if init_codebooks is None else init_codebooks[i]
            if center_levels and i >= 1:
                n_pref = kary ** i
                rf = resid.astype(jnp.float32)
                sums = jax.ops.segment_sum(rf, pref,
                                           num_segments=n_pref)
                cnt = jax.ops.segment_sum(
                    jnp.ones((n,), jnp.float32), pref,
                    num_segments=n_pref)
                shift = sums / jnp.maximum(cnt, 1.0)[:, None]
                shifts.append(shift)
                resid = (rf - shift[pref]).astype(resid.dtype)
            if center_levels and i == levels - 1 and levels > 1:
                # spherical last level: the centered residual's norm
                # varies by orders of magnitude across prefixes
                # (multi-cluster leftovers vs within-cluster
                # deviations); plain k-means spends every centroid on
                # the big-norm structure and the small clouds collapse
                # into the cell nearest zero (measured: 81% of big
                # prefixes kept ONE last-level code even after
                # conditioning).  Fit on unit directions, then rescale
                # each centroid to the mean raw radius of its members
                # so reconstruction keeps a sensible magnitude; the
                # assignment rule (normalize, then full_sim against
                # the stored centroids) is replicated bit-for-bit in
                # ``assign(prefix_shift=...)``.
                norms = jnp.linalg.norm(resid, axis=-1, keepdims=True)
                rn = resid / (norms + 1e-12)
                cb, a0 = kmeans_fit(rn, kary, iters=iters, key=sub,
                                    dist_mode=dist_mode, chunk=chunk,
                                    init_centroids=init_c)
                rad = (jax.ops.segment_sum(norms[:, 0], a0,
                                           num_segments=kary)
                       / jnp.maximum(jax.ops.segment_sum(
                           jnp.ones((n,), norms.dtype), a0,
                           num_segments=kary), 1.0))
                cb = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True)
                           + 1e-12) * rad[:, None]
                a = jnp.argmax(full_sim(rn, cb, dist_mode),
                               -1).astype(jnp.int32)
            else:
                cb, a = kmeans_fit(resid, kary, iters=iters, key=sub,
                                   dist_mode=dist_mode, chunk=chunk,
                                   init_centroids=init_c)
            cbs.append(cb)
            codes.append(a)
            if i != levels - 1:
                resid = resid - cb[a].astype(resid.dtype)
                if center_levels:
                    pref = a.astype(jnp.int32) if pref is None \
                        else pref * kary + a
    else:
        d = emb_size // levels
        for i in range(levels):
            key, sub = jax.random.split(key)
            init_c = None if init_codebooks is None else init_codebooks[i]
            cb, a = kmeans_fit(emb[:, i * d:(i + 1) * d], kary, iters=iters,
                               key=sub, dist_mode=dist_mode, chunk=chunk,
                               init_centroids=init_c)
            cbs.append(cb)
            codes.append(a)
    stacked = jnp.stack(cbs), jnp.stack(codes, axis=1).astype(jnp.int32)
    if center_levels:
        return stacked[0], stacked[1], shifts
    return stacked


def opq_train(
    emb: jnp.ndarray,
    levels: int,
    kary: int,
    iters: int = 15,
    inner_iters: int = 5,
    key: Optional[jax.Array] = None,
    dist_mode: str = "l2",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """OPQ: learn a rotation R and PQ codebooks by alternation.

    The reference delegates OPQ to faiss's ``OPQ{M},PQ{M}x{b}`` factory
    (``pq.py:179-198``) and stores the rotation in ``self.rotate``
    (applied as ``x @ R.T`` before sub-vector assignment,
    ``pq.py:319-321``).  Classic OPQ-NP alternation:

      1. codebooks <- PQ k-means on rotated data,
      2. R <- argmin ||X R^T - X_hat||_F = U V^T from the SVD of
         X^T X_hat (orthogonal Procrustes).

    Returns (rotation (d, d), codebooks (M, K, d/M), codes (n, M)) as
    numpy; assignment for new vectors = ``assign(x @ R.T, cbs, 'pq')``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n, d = emb.shape
    R = jnp.eye(d, dtype=jnp.float32)
    codebooks = None
    for it in range(iters):
        key, sub = jax.random.split(key)
        rotated = (emb.astype(jnp.float32) @ R.T).astype(emb.dtype)
        codebooks, codes = rq_train(
            rotated, levels, kary, iters=inner_iters, key=sub,
            dist_mode=dist_mode, pq_type="pq",
            init_codebooks=codebooks)
        if it == iters - 1:
            break
        rec = reconstruct(jnp.asarray(codes), jnp.asarray(codebooks),
                          "pq")                       # (n, d) rotated-space
        # procrustes: R = U V^T of X^T X_hat (host SVD, d x d)
        m = np.asarray(emb.astype(jnp.float32)).T @ np.asarray(rec)
        u, _, vt = np.linalg.svd(m.astype(np.float64))
        R = jnp.asarray((u @ vt).T, jnp.float32)
    return np.asarray(R), np.asarray(codebooks), np.asarray(codes)


def align_codebooks(old: np.ndarray, new: np.ndarray,
                    dist_mode: str = "l2") -> np.ndarray:
    """Permute ``new`` so each centroid matches its closest predecessor
    (Hungarian assignment, ``pq.py:600-611``).  Host-side: K <= 256."""
    from scipy.optimize import linear_sum_assignment
    out = np.empty_like(new)
    for lvl in range(new.shape[0]):
        o = old[lvl].astype(np.float64)
        c = new[lvl].astype(np.float64)
        if dist_mode == "ip":
            scores = c @ o.T                       # (cur, ori)
        else:
            scores = -((c[:, None, :] - o[None, :, :]) ** 2).sum(-1)
        cid, oid = linear_sum_assignment(scores, maximize=True)
        out[lvl][oid] = c[cid]
    return out


# --------------------------------------------------------------------------
# EMA codebook update (pq.py:371-433)
# --------------------------------------------------------------------------

class EMAState(NamedTuple):
    cluster_size: jnp.ndarray   # (M, K)
    embed_sum: jnp.ndarray      # (M, K, d)


def ema_init(codebooks: jnp.ndarray) -> EMAState:
    M, K, _ = codebooks.shape
    return EMAState(jnp.zeros((M, K), jnp.float32),
                    codebooks.astype(jnp.float32))


@partial(jax.jit, static_argnames=("decay", "eps", "restart"))
def ema_update(state: EMAState, codebooks: jnp.ndarray,
               vectors: jnp.ndarray, codes: jnp.ndarray,
               key: jax.Array, decay: float = 0.99, eps: float = 1e-5,
               restart: bool = True,
               ) -> Tuple[EMAState, jnp.ndarray]:
    """One EMA step from a batch of (vectors, codes).

    Matches ``pq.py:371-433`` for the rq case: every level accumulates the
    *full* vector (not the residual) — the reference expands vectors
    across levels at ``pq.py:375-377``.  Cross-device: callers psum the
    per-batch (counts, sums) before calling, or run under pjit where the
    one-hot matmul reduces over the data axis automatically.
    """
    M, K, d = codebooks.shape
    onehot = jax.nn.one_hot(codes, K, dtype=jnp.float32)        # (n, M, K)
    counts = jnp.sum(onehot, axis=0)                            # (M, K)
    sums = jnp.einsum("nmk,nd->mkd", onehot,
                      vectors.astype(jnp.float32))
    new_size = state.cluster_size * decay + counts * (1 - decay)
    new_sum = state.embed_sum * decay + sums * (1 - decay)

    if restart:
        n = vectors.shape[0]
        rand_rows = jax.random.randint(key, (M, K), 0, n)
        rand_vecs = vectors.astype(jnp.float32)[rand_rows]      # (M, K, d)
        used = (new_size >= 1.0)
        new_sum = jnp.where(used[..., None], new_sum, rand_vecs)
        new_size = jnp.where(used, new_size, 1.0)

    tot = jnp.sum(new_size, axis=1, keepdims=True)
    norm = tot * (new_size + eps) / (tot + K * eps)
    new_codebooks = (new_sum / norm[..., None]).astype(codebooks.dtype)
    return EMAState(new_size, new_sum), new_codebooks


# --------------------------------------------------------------------------
# codebook beam search (pq.py:613-713)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_beams", "pq_type", "dist_mode",
                                   "score_mode"))
def beam_search(emb: jnp.ndarray, codebooks: jnp.ndarray,
                num_beams: int, pq_type: str = "rq",
                dist_mode: str = "l2", score_mode: str = "prod",
                prefix_shift=None,
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``num_beams`` code sequences per embedding.

    Per level: softmax over centroid similarities, multiply into the
    running beam score ('prod', ``pq.py:663-667``), keep top beams,
    subtract the chosen centroid from each beam's residual.  Returns
    (codes (n, B, M) int32, scores (n, B) float32).

    ``prefix_shift`` (rq): the conditioning tables of a
    ``center_levels`` quantizer — each beam subtracts its prefix's
    shift before scoring a level, and the last level scores the
    residual DIRECTION (the ``assign`` contract), so beam top-1
    equals conditioned assignment.
    """
    M, K, d = codebooks.shape
    n = emb.shape[0]
    B = num_beams

    # level 0: beams = top-B of K
    sim0 = full_sim(emb if pq_type == "rq" else emb[:, :d],
                    codebooks[0], dist_mode)
    p0 = jax.nn.softmax(sim0, axis=-1)
    scores, idx0 = jax.lax.top_k(p0, min(B, K))                 # (n, B)
    if B > K:  # degenerate; pad (reference expands instead)
        pad = B - K
        scores = jnp.pad(scores, ((0, 0), (0, pad)))
        idx0 = jnp.pad(idx0, ((0, 0), (0, pad)))
    codes = idx0[:, :, None].astype(jnp.int32)                  # (n, B, 1)
    if pq_type == "rq":
        resid = emb[:, None, :] - codebooks[0][idx0].astype(emb.dtype)
    pref = idx0.astype(jnp.int32) if prefix_shift is not None else None

    for lvl in range(1, M):
        cb = codebooks[lvl]
        if pq_type == "rq":
            r = resid
            if prefix_shift is not None:
                r = r - prefix_shift[lvl - 1][pref].astype(r.dtype)
            if prefix_shift is not None and lvl == M - 1:
                # spherical last level (assign contract)
                r = r / (jnp.linalg.norm(r, axis=-1, keepdims=True)
                         + 1e-12)
            sim = full_sim(r.reshape(n * B, -1), cb,
                           dist_mode).reshape(n, B, K)
        else:
            sub = emb[:, lvl * d:(lvl + 1) * d]
            sim = jnp.broadcast_to(
                full_sim(sub, cb, dist_mode)[:, None, :], (n, B, K))
        p = jax.nn.softmax(sim, axis=-1)
        if score_mode == "prod":
            cand = scores[:, :, None] * p                       # (n, B, K)
        else:
            cand = p
        flat = cand.reshape(n, B * K)
        scores, pos = jax.lax.top_k(flat, B)                    # (n, B)
        beam_idx = pos // K
        code_idx = (pos % K).astype(jnp.int32)
        codes = jnp.take_along_axis(
            codes, beam_idx[:, :, None], axis=1)
        codes = jnp.concatenate([codes, code_idx[:, :, None]], axis=-1)
        if pq_type == "rq" and lvl != M - 1:
            resid = jnp.take_along_axis(
                resid, beam_idx[:, :, None], axis=1)
            if prefix_shift is not None:
                resid = resid - prefix_shift[lvl - 1][
                    jnp.take_along_axis(pref, beam_idx, axis=1)
                ].astype(resid.dtype)
            resid = resid - cb[code_idx].astype(resid.dtype)
        if pref is not None and lvl != M - 1:
            pref = jnp.take_along_axis(pref, beam_idx, axis=1) * K \
                + code_idx

    return codes, scores
