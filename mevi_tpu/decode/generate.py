"""Unconstrained T5 generation with KV cache — the docT5query QG path.

The reference generates 10 pseudo-queries per passage with HF sampling
generate (``dataprocess/msmarco_passage/doc2query.py:73-83``: pure
multinomial sampling, ``num_return_sequences=n``, one mp.spawn process
per GPU).  Here the decode loop is a ``lax.scan`` with per-layer KV
caches and precomputed cross-attention K/V — one XLA program per batch,
supporting sampling (temperature / top-k / top-p) and greedy modes.

The LM head follows t5-base tied-embedding semantics: logits =
(hidden * d_model**-0.5) @ shared_embedding^T.
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp

from ..models.t5 import T5Model, extend_mask


def _lm_logits(model: T5Model, params, hidden_t: jnp.ndarray):
    W = params["shared"]["embedding"]                # (V, d)
    scaled = hidden_t * (model.dims.d_model ** -0.5)
    return jax.lax.dot_general(
        scaled, W, (((scaled.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _filter_logits(logits, top_k: int, top_p: float):
    """HF top_k_top_p_filtering semantics (-inf the filtered ids)."""
    neg = jnp.float32(-1e9)
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, neg, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep ids whose cumulative prob (exclusive) < top_p; threshold is
        # the smallest kept logit
        keep = (cum - probs) <= top_p
        kth = jnp.min(jnp.where(keep, sorted_logits, jnp.inf),
                      axis=-1, keepdims=True)
        logits = jnp.where(logits < kth, neg, logits)
    return logits


@partial(jax.jit, static_argnames=("model", "max_length",
                                   "num_return_sequences", "do_sample",
                                   "top_k"))
def generate(
    model: T5Model,
    params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    key: jax.Array,
    max_length: int = 64,
    num_return_sequences: int = 1,
    do_sample: bool = True,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    eos_id: int = 1,
    pad_id: int = 0,
) -> jnp.ndarray:
    """Sample/greedy-decode sequences.  Returns (b * nret, max_length)
    token ids, EOS-padded."""
    nret = num_return_sequences

    def apply(method, *args, **kw):
        return model.apply({"params": params}, *args, method=method, **kw)

    enc = apply(T5Model.encode, input_ids, attention_mask)
    enc = jnp.repeat(enc, nret, axis=0)
    mask = jnp.repeat(attention_mask, nret, axis=0)
    b = enc.shape[0]

    bound = model.bind({"params": params})
    cross_kvs = bound.decoder.project_cross_kvs(enc)
    cache = bound.decoder.init_cache(b, max_length)
    enc_mask = extend_mask(mask)

    tokens = jnp.zeros((b, max_length + 1), jnp.int32)  # col0 = start(0)
    finished = jnp.zeros((b,), bool)

    def body(carry, t):
        tokens, cache, finished, key = carry
        cur = jax.lax.dynamic_slice_in_dim(tokens, t, 1, axis=1)
        embed_t = bound.shared(cur)
        hidden_t, cache = bound.decoder.decode_step(
            embed_t, t, cache, cross_kvs, enc_mask)
        logits = _lm_logits(model, params, hidden_t[:, 0, :])
        if do_sample:
            logits = logits / jnp.float32(temperature)
            logits = _filter_logits(logits, top_k, top_p)
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, logits, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, pad_id, nxt).astype(jnp.int32)
        finished = finished | (nxt == eos_id)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], t + 1, axis=1)
        return (tokens, cache, finished, key), None

    (tokens, _, _, _), _ = jax.lax.scan(
        body, (tokens, cache, finished, key), jnp.arange(max_length))
    return tokens[:, 1:]
