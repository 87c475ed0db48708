"""Exhaustive code-sequence scorer — the ``_generate_all`` oracle.

The reference scores *all* K^M code sequences level-by-level in
sub-batches (``generation_utils.py:1013-1136``) for its topic-model mode;
here it doubles as (a) the test oracle for the fused beam search and
(b) the ``eval_all_documents`` scoring path.

Scoring matches the beam: sum over levels of log-softmax(level slice ∪
EOS) at the code token, plus the final EOS log-prob, normalized by
``(M+1)**length_penalty``.
"""

from __future__ import annotations

from itertools import product
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nci import NCIDims, NCIT5, make_labels


def all_code_sequences(kary: int, levels: int) -> np.ndarray:
    """(K^M, M) int32 — every code sequence, lexicographic order."""
    return np.array(list(product(range(kary), repeat=levels)),
                    np.int32).reshape(-1, levels)


def score_sequences(
    model: NCIT5,
    params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    codes: jnp.ndarray,
    length_penalty: float = 0.8,
    batch: int = 1024,
) -> jnp.ndarray:
    """Log-prob score of each code sequence for each query.

    Returns (nq, n_seq) float32 normalized scores.
    """
    dims: NCIDims = model.dims
    K, M, L = dims.kary, dims.code_len, dims.max_output_length
    nq = input_ids.shape[0]
    n_seq = codes.shape[0]

    def apply(method, *args, **kw):
        return model.apply({"params": params}, *args, method=method, **kw)

    enc_hidden = apply(NCIT5.encode, input_ids, attention_mask)
    memory, mem_mask, _ = apply(NCIT5.build_memory, enc_hidden,
                                attention_mask)
    cross_kvs = apply(NCIT5.project_cross_kvs, memory)

    @jax.jit
    def score_block(code_block):
        nb = code_block.shape[0]
        _, dec_in = make_labels(code_block, K, L)
        # tile queries over sequences: (nq * nb, L)
        dec = jnp.tile(dec_in, (nq, 1))
        kvs = jax.tree.map(lambda x: jnp.repeat(x, nb, axis=0), cross_kvs)
        mm = None if mem_mask is None else jnp.repeat(mem_mask, nb, axis=0)
        compact, _ = apply(NCIT5.compact_logits, dec, None, mm, kvs)
        logp = jax.nn.log_softmax(compact.astype(jnp.float32), axis=-1)
        cols = jnp.concatenate(
            [jnp.tile(code_block, (nq, 1)),
             jnp.full((nq * nb, 1), K, jnp.int32)], axis=1)  # eos col
        steps = jnp.take_along_axis(
            logp[:, :M + 1, :], cols[:, :, None], axis=2)[..., 0]
        total = jnp.sum(steps, axis=1).reshape(nq, nb)
        return total / jnp.float32(M + 1) ** jnp.float32(length_penalty)

    outs = []
    for s in range(0, n_seq, batch):
        outs.append(score_block(jnp.asarray(codes[s:s + batch])))
    return jnp.concatenate(outs, axis=1)


def brute_force_topk(model, params, input_ids, attention_mask, k,
                     length_penalty: float = 0.8,
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k code sequences by exhaustive scoring."""
    dims: NCIDims = model.dims
    codes = all_code_sequences(dims.kary, dims.code_len)
    scores = np.array(score_sequences(
        model, params, input_ids, attention_mask, jnp.asarray(codes),
        length_penalty))
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return codes[order], np.take_along_axis(scores, order, axis=1)
