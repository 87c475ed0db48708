"""Trie-constrained beam search — the non-RQ (hierarchical k-means id)
mode.

The reference supports document ids from hierarchical k-means
(``--id_class bert_k30_c30_1``) with *variable-length* ids; its beam
walks a pickled python trie per beam per step
(``generation_utils.py:801-819``, tree built at
``main_models.py:1707-1725``).  Here the trie is two dense device
tables:

* ``child[node, c]``  — child node id for code c, -1 if absent,
* ``terminal[node]``  — True when a document id ends at this node
  (EOS is then a legal next token, like the reference's ``[1]`` layer),

and the beam is a fixed-depth scan: alive beams extend through
``child``; EOS-taking beams move to a per-query done-pool ranked by the
length-penalized score (``BeamHypotheses`` semantics: all hypotheses
normalized by ``(steps+1)**length_penalty``).

For the RQ code space the trie is full ⇒ use the faster
:mod:`mevi_tpu.decode.beam`; this module is the general path.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nci import NCIT5

NEG = -1e9


def build_trie(ids: Sequence[Sequence[int]], kary: int,
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Dense trie tables from document id sequences.

    Returns (child (num_nodes, kary) int32 with -1 absent,
    terminal (num_nodes,) bool).  Node 0 is the root.
    """
    child_rows: List[np.ndarray] = [np.full(kary, -1, np.int32)]
    terminal: List[bool] = [False]
    for seq in ids:
        node = 0
        for c in seq:
            nxt = child_rows[node][c]
            if nxt < 0:
                nxt = len(child_rows)
                child_rows[node][c] = nxt
                child_rows.append(np.full(kary, -1, np.int32))
                terminal.append(False)
            node = int(nxt)
        terminal[node] = True
    return np.stack(child_rows), np.asarray(terminal, bool)


@partial(jax.jit, static_argnames=("model", "num_beams", "max_steps",
                                   "length_penalty"))
def trie_beam_search(
    model: NCIT5,
    params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    child: jnp.ndarray,
    terminal: jnp.ndarray,
    num_beams: int,
    max_steps: int,
    length_penalty: float = 0.8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Beam-decode ids constrained to the trie.

    Returns (codes (b, nbeam, max_steps) int32 with -1 past each id's
    end, lengths (b, nbeam) int32, scores (b, nbeam) normalized).
    """
    dims = model.dims
    K = dims.kary
    L = dims.max_output_length
    assert max_steps <= L - 1
    B = input_ids.shape[0]
    nb = num_beams

    def apply(method, *args, **kw):
        return model.apply({"params": params}, *args, method=method, **kw)

    enc_hidden = apply(NCIT5.encode, input_ids, attention_mask)
    memory, mem_mask, _ = apply(NCIT5.build_memory, enc_hidden,
                                attention_mask)
    cross_kvs = apply(NCIT5.project_cross_kvs, memory)
    kvs_b = jax.tree.map(lambda x: jnp.repeat(x, nb, axis=0), cross_kvs)
    mem_mask_b = (None if mem_mask is None
                  else jnp.repeat(mem_mask, nb, axis=0))

    tokens = jnp.zeros((B * nb, L), jnp.int32)
    nodes = jnp.zeros((B, nb), jnp.int32)              # trie position
    beam_scores = jnp.full((B, nb), NEG, jnp.float32).at[:, 0].set(0.0)
    done_scores = jnp.full((B, nb), NEG, jnp.float32)
    done_tokens = jnp.zeros((B, nb, L), jnp.int32)
    done_len = jnp.zeros((B, nb), jnp.int32)

    def step(carry, t):
        (tokens, nodes, beam_scores, done_scores, done_tokens,
         done_len) = carry
        logp_row, _ = apply(NCIT5.compact_logits_at, tokens, t, None,
                            mem_mask_b, kvs_b)
        logp = jax.nn.log_softmax(logp_row.astype(jnp.float32), -1)
        logp = logp.reshape(B, nb, K + 1)
        kids = child[nodes]                            # (B, nb, K)
        can_end = terminal[nodes]                      # (B, nb)
        code_lp = jnp.where(kids >= 0, logp[..., :K], NEG)
        eos_lp = jnp.where(can_end, logp[..., K], NEG)

        # EOS candidates -> done pool (normalized like BeamHypotheses)
        norm = (beam_scores + eos_lp) / jnp.float32(
            t + 1) ** jnp.float32(length_penalty)
        pool_scores = jnp.concatenate([done_scores, norm], axis=1)
        pool_tokens = jnp.concatenate(
            [done_tokens, jnp.broadcast_to(
                tokens.reshape(B, nb, L), (B, nb, L))], axis=1)
        pool_len = jnp.concatenate(
            [done_len, jnp.full((B, nb), t, jnp.int32)], axis=1)
        done_scores, keep = jax.lax.top_k(pool_scores, nb)
        done_tokens = jnp.take_along_axis(
            pool_tokens, keep[:, :, None], axis=1)
        done_len = jnp.take_along_axis(pool_len, keep, axis=1)

        # non-EOS candidates continue
        cand = beam_scores[:, :, None] + code_lp       # (B, nb, K)
        flat = cand.reshape(B, nb * K)
        beam_scores, pos = jax.lax.top_k(flat, nb)
        beam_idx = pos // K
        code = (pos % K).astype(jnp.int32)
        nodes = jnp.take_along_axis(
            kids.reshape(B, nb * K), pos, axis=1)
        gather_rows = (jnp.arange(B)[:, None] * nb + beam_idx).reshape(-1)
        tokens = tokens[gather_rows]
        tok = (code + t * K + 2).reshape(-1)
        tokens = tokens.at[:, t + 1].set(tok)
        return (tokens, nodes, beam_scores, done_scores, done_tokens,
                done_len), None

    carry = (tokens, nodes, beam_scores, done_scores, done_tokens,
             done_len)
    carry, _ = jax.lax.scan(step, carry, jnp.arange(max_steps))
    (tokens, nodes, beam_scores, done_scores, done_tokens,
     done_len) = carry

    order = jnp.argsort(-done_scores, axis=1)
    done_scores = jnp.take_along_axis(done_scores, order, axis=1)
    done_tokens = jnp.take_along_axis(done_tokens, order[:, :, None], 1)
    done_len = jnp.take_along_axis(done_len, order, axis=1)

    # decode tokens back to codes, -1 past each id's end
    toks = done_tokens[:, :, 1:max_steps + 1]
    offs = jnp.arange(max_steps, dtype=jnp.int32) * K + 2
    codes = toks - offs[None, None, :]
    slot = jnp.arange(max_steps, dtype=jnp.int32)
    codes = jnp.where(slot[None, None, :] < done_len[:, :, None],
                      codes, -1)
    return codes, done_len, done_scores
