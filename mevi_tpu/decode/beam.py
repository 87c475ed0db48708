"""Fused tree-constrained beam search over the RQ code space.

Replaces the reference's python beam loop (``MEVI/transformers/
generation_utils.py:709-1011`` with the per-beam tree walk at 801-819)
with a fully-jitted fixed-depth decode:

* the RQ decode tree is a full shared-sons k-ary tree with an EOS leaf
  layer (``main_models.py:1697-1706``), so the tree constraint IS the
  position-validity mask — the model's compact logits (level slice + EOS)
  already carry it; no tree structure exists at runtime,
* scores accumulate log-softmax over the valid set (slice ∪ EOS), exactly
  the reference normalization (model mask at -1e9 + full-vocab
  log_softmax, ``generation_utils.py:783``),
* every hypothesis has the same length (M code tokens + EOS), so the
  final ``score / len**length_penalty`` (``BeamHypotheses.add``) is a
  monotone transform; ordering matches the reference,
* encoder runs once; decoder cross-attention K/V are projected once per
  query and broadcast across beams (the reference re-projects every step).

Static shapes throughout: batch x beams panels, ``lax.top_k`` beam
updates — one XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.nci import NCIDims, NCIT5, tokens_to_codes


def _expand_beams(x, num_beams):
    """(b, ...) -> (b * nbeam, ...) by repeat-interleave."""
    return jnp.repeat(x, num_beams, axis=0)


@partial(jax.jit, static_argnames=("model", "num_beams", "length_penalty"))
def nci_beam_search(
    model: NCIT5,
    params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    num_beams: int,
    length_penalty: float = 0.8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Beam-decode RQ codes for a batch of queries.

    Returns:
      codes:  (b, nbeam, M) int32 RQ codes, best first.
      scores: (b, nbeam) float32 length-normalized sequence log-probs
        (``sum_logprobs / (M+1)**length_penalty``, BeamHypotheses.add).
      enc_hidden: (b, Lq, d) encoder last hidden state.
      dec_hidden: (b * nbeam, L, d) decoder last hidden state of the
        winning panels (for the 'dec' query-tower variants).
    """
    dims: NCIDims = model.dims
    K = dims.kary
    M = dims.code_len
    L = dims.max_output_length
    B = input_ids.shape[0]
    nb = num_beams

    def apply(method, *args, **kw):
        return model.apply({"params": params}, *args, method=method, **kw)

    enc_hidden = apply(NCIT5.encode, input_ids, attention_mask)
    memory, mem_mask, _ = apply(NCIT5.build_memory, enc_hidden,
                                attention_mask)
    cross_kvs = apply(NCIT5.project_cross_kvs, memory)

    # broadcast per-query state across beams
    kvs_b = jax.tree.map(lambda x: _expand_beams(x, nb), cross_kvs)
    mem_mask_b = (None if mem_mask is None
                  else _expand_beams(mem_mask, nb))

    tokens = jnp.zeros((B * nb, L), jnp.int32)     # panel, col 0 = start
    beam_scores = jnp.full((B, nb), -1e9, jnp.float32).at[:, 0].set(0.0)
    W_lvl, A_lvl = apply(NCIT5.head_level_tables)

    def step_logits(tokens, t, tables):
        row, dec_hidden = apply(
            NCIT5.compact_logits_at, tokens, t, None, mem_mask_b, kvs_b,
            level_tables=tables)
        return (jax.nn.log_softmax(row.astype(jnp.float32), axis=-1),
                dec_hidden)

    def beam_step(carry, xs):
        t, W_t, A_t = xs
        tokens, beam_scores = carry
        logp, _ = step_logits(tokens, t, (W_t, A_t))    # (B*nb, K+1)
        code_lp = logp[:, :K].reshape(B, nb, K)
        cand = beam_scores[:, :, None] + code_lp        # (B, nb, K)
        flat = cand.reshape(B, nb * K)
        beam_scores, pos = jax.lax.top_k(flat, nb)      # (B, nb)
        beam_idx = pos // K                             # source beam
        code = (pos % K).astype(jnp.int32)
        # reorder panels and append the chosen token
        gather_rows = (jnp.arange(B)[:, None] * nb + beam_idx).reshape(-1)
        tokens = tokens[gather_rows]
        tok = (code + t * K + 2).reshape(-1)
        tokens = tokens.at[:, t + 1].set(tok)
        return (tokens, beam_scores), None

    if A_lvl is None:                       # use_pawa=False: unused dummy
        A_lvl = jnp.zeros((L, 1, 1), W_lvl.dtype)
    # the per-step compute is shape-identical: scan compiles it ONCE
    # (the reference re-traces nothing but pays a python loop per step)
    (tokens, beam_scores), _ = jax.lax.scan(
        beam_step, (tokens, beam_scores),
        (jnp.arange(M), W_lvl[:M], A_lvl[:M]))

    # final step: every surviving beam emits EOS (the tree's leaf layer)
    logp, dec_hidden = step_logits(tokens, M, (W_lvl[M], A_lvl[M]))
    eos_lp = logp[:, K].reshape(B, nb)
    total = beam_scores + eos_lp
    norm = total / jnp.float32(M + 1) ** jnp.float32(length_penalty)
    order = jnp.argsort(-norm, axis=-1)
    norm = jnp.take_along_axis(norm, order, axis=-1)
    gather_rows = (jnp.arange(B)[:, None] * nb + order).reshape(-1)
    tokens = tokens[gather_rows]
    dec_hidden = dec_hidden[gather_rows]

    code_tokens = tokens[:, 1:M + 1].reshape(B, nb, M)
    codes = tokens_to_codes(code_tokens.reshape(-1, M),
                            K).reshape(B, nb, M)
    return codes, norm, enc_hidden, dec_hidden


def _tree_rows(entry, rows):
    """Row-gather every leaf of a cache-entry pytree (the per-layer
    (k, v) tuples of ``T5Stack.decode_step_unrolled``)."""
    return jax.tree.map(lambda x: x[rows], entry)


def _prefix_index(code_hist, p: int, K: int):
    """Base-K integer index of each row's code prefix (c0..c_{p-1})."""
    pidx = code_hist[:, 0].astype(jnp.int32)
    for j in range(1, p):
        pidx = pidx * K + code_hist[:, j]
    return pidx


@partial(jax.jit, static_argnames=("model", "num_beams", "length_penalty"))
def nci_beam_search_incremental(
    model: NCIT5,
    params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    num_beams: int,
    length_penalty: float = 0.8,
    level_tables=None,
    pawa_tables=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """KV-cached beam decode: each step runs ONE token through the
    decoder and PAWA (the panel variant recomputes all L positions —
    ~L x more decode FLOPs).  Caches are per-position entry lists,
    beam-reordered by row gather (only live positions move).

    ``level_tables``: optional precomputed ``head_level_tables()``
    output — a serving loop should build it ONCE per params (the
    in-call build relayouts the 229 MB adaptor kernel every batch).
    ``pawa_tables``: optional ``pawa_prefix_tables()`` output — PAWA
    is query-independent, so for early levels its net run AND its
    (rows, dm) x (dm, dm*(K+1)) delta matmul collapse to per-prefix
    row gathers; the net then runs only at t = M-1 and the EOS step,
    with its cache rebuilt from the per-prefix KV tables.

    Returns (codes (b, nbeam, M), normalized scores (b, nbeam),
    enc_hidden) — identical ordering/scores to :func:`nci_beam_search`.
    """
    dims: NCIDims = model.dims
    K, M, L = dims.kary, dims.code_len, dims.max_output_length
    B = input_ids.shape[0]
    nb = num_beams
    use_tables = pawa_tables is not None and dims.use_pawa

    def apply(method, *args, **kw):
        return model.apply({"params": params}, *args, method=method, **kw)

    enc_hidden = apply(NCIT5.encode, input_ids, attention_mask)
    memory, mem_mask, _ = apply(NCIT5.build_memory, enc_hidden,
                                attention_mask)
    # cross K/V stay per-QUERY: a query's beams share them inside
    # decode_step (replicating them x nb costs 1.5 GB of HBM traffic
    # per step at the serving config)
    cross_kvs = apply(NCIT5.project_cross_kvs, memory)
    if level_tables is None:
        W_lvl, A_lvl = apply(NCIT5.head_level_tables)
    else:
        W_lvl, A_lvl = level_tables
    if A_lvl is None:                       # use_pawa=False: unused dummy
        A_lvl = jnp.zeros((L, 1, 1), W_lvl.dtype)

    # step 0 at B rows: every beam of a query shares the start-token
    # prefix, so running the panel at B*nb rows would compute each
    # query's step nb times; top-nb of the K step-0 logits IS the beam
    # update (original semantics: beam 0 alive at 0.0, others at -1e9)
    logits0, dec_e0, pawa_e0 = apply(
        NCIT5.decode_logits_step_unrolled, jnp.zeros((B, 1), jnp.int32),
        0, [], [], cross_kvs, mem_mask, beams=1,
        level_tables=(W_lvl[0], A_lvl[0]),
        delta_slab=pawa_tables["delta0"] if use_tables else None)
    logp0 = jax.nn.log_softmax(logits0.astype(jnp.float32), -1)
    # exact original flat top-k (beam 0 at 0.0, others -1e9): with
    # nb > K the tail beams are the same dead (-1e9) hypotheses the
    # panel path produces, so the two decoders stay bit-identical
    init0 = jnp.full((nb,), -1e9, jnp.float32).at[0].set(0.0)
    flat0 = (init0[None, :, None] + logp0[:, None, :K]).reshape(B, nb * K)
    beam_scores, pos0 = jax.lax.top_k(flat0, nb)            # (B, nb)
    code0 = (pos0 % K).astype(jnp.int32)
    code_hist = jnp.zeros((B * nb, M), jnp.int32
                          ).at[:, 0].set(code0.reshape(-1))
    cur_tok = code0.reshape(-1, 1).astype(jnp.int32) + 2
    # position-0 cache entries stay at B rows (decoder: per-query,
    # beam-shared) / 1 row (PAWA is query-independent and the start
    # token is universal) — broadcast in-attention, NEVER beam-reordered
    dec_entries = [dec_e0]
    if use_tables:
        pawa_entries = None          # rebuilt by gather at live steps
        skip_levels = set(pawa_tables["T"])
    else:
        pawa_entries = (None if pawa_e0 is None
                        else [_tree_rows(pawa_e0, slice(0, 1))])
        skip_levels = set()

    def rebuild_pawa(t, extra=None):
        """Cache entries for positions 0..t-1 from the per-prefix KV
        tables (current code_hist), plus the live entry ``extra``."""
        ents = [pawa_tables["e0"]]
        top = t - 1 if extra is not None else t
        for p in range(1, top):
            # rows-major per-layer tables: the row gather IS the entry
            ents.append(_tree_rows(pawa_tables["KV"][p],
                                   _prefix_index(code_hist, p, K)))
        if extra is not None:
            ents.append(extra)
        return ents

    pawa_live = None                 # reordered net entry at t = M-1
    # python loop, static t per step: each step's shapes/tables are
    # baked in, entry lists hold only live positions (the scan variant
    # moved full (max_len, ...) buffers through every reorder)
    for t in range(1, M):
        skip = t in skip_levels and t < M - 1
        if skip:
            slab = pawa_tables["T"][t][_prefix_index(code_hist, t, K)]
            logits, dec_e, pawa_e = apply(
                NCIT5.decode_logits_step_unrolled, cur_tok, t,
                dec_entries, None, cross_kvs, mem_mask, beams=nb,
                level_tables=(W_lvl[t], A_lvl[t]), delta_slab=slab)
        else:
            if use_tables:
                pawa_entries = rebuild_pawa(t)
            logits, dec_e, pawa_e = apply(
                NCIT5.decode_logits_step_unrolled, cur_tok, t,
                dec_entries, pawa_entries, cross_kvs, mem_mask,
                beams=nb, level_tables=(W_lvl[t], A_lvl[t]))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        code_lp = logp[:, :K].reshape(B, nb, K)
        flat = (beam_scores[:, :, None] + code_lp).reshape(B, nb * K)
        beam_scores, pos = jax.lax.top_k(flat, nb)
        beam_idx = pos // K
        code = (pos % K).astype(jnp.int32)
        rows = (jnp.arange(B)[:, None] * nb + beam_idx).reshape(-1)
        code_hist = code_hist[rows]
        code_hist = code_hist.at[:, t].set(code.reshape(-1))
        # rows-major per-layer entries: beam reorder is a pytree of
        # contiguous row gathers (a packed cross-layer array cost a
        # relayout copy at the stack + a strided-slice copy per layer)
        dec_entries = ([dec_entries[0]]
                       + [_tree_rows(e, rows) for e in dec_entries[1:]]
                       + [_tree_rows(dec_e, rows)])
        if use_tables:
            if pawa_e is not None:
                pawa_live = _tree_rows(pawa_e, rows)
        elif pawa_entries is not None:
            pawa_entries = ([pawa_entries[0]]
                            + [_tree_rows(e, rows)
                               for e in pawa_entries[1:]]
                            + [_tree_rows(pawa_e, rows)])
        cur_tok = (code.reshape(-1, 1) + t * K + 2)

    # final step: EOS log-prob at position M
    if use_tables:
        # positions 1..M-2 regathered at the post-reorder prefixes;
        # M-1 is the (reordered) live entry from the net run above
        pawa_entries = rebuild_pawa(M, extra=pawa_live) if M > 1 \
            else rebuild_pawa(M)
    logits, _, _ = apply(
        NCIT5.decode_logits_step_unrolled, cur_tok, M, dec_entries,
        pawa_entries, cross_kvs, mem_mask, beams=nb,
        level_tables=(W_lvl[M], A_lvl[M]))
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    eos_lp = logp[:, K].reshape(B, nb)
    total = beam_scores + eos_lp
    norm = total / jnp.float32(M + 1) ** jnp.float32(length_penalty)
    order = jnp.argsort(-norm, axis=-1)
    norm = jnp.take_along_axis(norm, order, axis=-1)
    rows = (jnp.arange(B)[:, None] * nb + order).reshape(-1)
    codes = code_hist[rows].reshape(B, nb, M)
    return codes, norm, enc_hidden
