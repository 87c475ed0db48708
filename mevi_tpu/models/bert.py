"""BERT/ERNIE encoder in flax.linen, numerically matching HF so AR2 and
coCondenser checkpoints convert losslessly.

The reference twin tower uses the CLS (token 0) hidden state as the
representation for BERT-family models (``document_encoder.py:113-120``).
ERNIE 2.0 shares BERT's tensor layout (the vendored
``modeling_ernie.py`` is a backport); the only config deltas are
``type_vocab_size`` and task embeddings, which the AR2 checkpoints do not
exercise at inference.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertDims:
    vocab_size: int = 30522
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_ff: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_epsilon: float = 1e-12
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32


class BertEmbeddings(nn.Module):
    dims: BertDims

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        d = self.dims
        b, l = input_ids.shape
        word = nn.Embed(d.vocab_size, d.d_model, name="word",
                        dtype=d.dtype)(input_ids)
        pos_ids = jnp.arange(l)[None, :]
        pos = nn.Embed(d.max_position_embeddings, d.d_model,
                       name="position", dtype=d.dtype)(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok = nn.Embed(d.type_vocab_size, d.d_model, name="token_type",
                       dtype=d.dtype)(token_type_ids)
        x = word + pos + tok
        x = nn.LayerNorm(epsilon=d.layer_norm_epsilon, name="norm",
                         dtype=d.dtype)(x)
        return nn.Dropout(d.dropout_rate)(x, deterministic=deterministic)


class BertSelfAttention(nn.Module):
    dims: BertDims

    @nn.compact
    def __call__(self, hidden, mask=None, deterministic=True):
        d = self.dims
        h = d.num_heads
        dk = d.d_model // h
        b, l, _ = hidden.shape

        def heads(name):
            # heads-last (b, l, h, dk) — see T5Attention._split
            y = nn.Dense(d.d_model, name=name, dtype=d.dtype)(hidden)
            return y.reshape(b, l, h, dk)

        q, k, v = heads("query"), heads("key"), heads("value")
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.float32(dk)).astype(hidden.dtype)
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(hidden.dtype)
        probs = nn.Dropout(d.dropout_rate)(probs,
                                           deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ctx = ctx.reshape(b, l, d.d_model)
        out = nn.Dense(d.d_model, name="out", dtype=d.dtype)(ctx)
        out = nn.Dropout(d.dropout_rate)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=d.layer_norm_epsilon, name="norm",
                            dtype=d.dtype)(hidden + out)


class BertLayer(nn.Module):
    dims: BertDims

    @nn.compact
    def __call__(self, hidden, mask=None, deterministic=True):
        d = self.dims
        hidden = BertSelfAttention(d, name="attn")(hidden, mask,
                                                   deterministic)
        inter = nn.Dense(d.d_ff, name="ff_intermediate",
                         dtype=d.dtype)(hidden)
        inter = jax.nn.gelu(inter, approximate=False)
        out = nn.Dense(d.d_model, name="ff_out", dtype=d.dtype)(inter)
        out = nn.Dropout(d.dropout_rate)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=d.layer_norm_epsilon, name="ff_norm",
                            dtype=d.dtype)(hidden + out)


class BertEncoderModel(nn.Module):
    dims: BertDims

    def setup(self):
        d = self.dims
        self.embeddings = BertEmbeddings(d, name="embeddings")
        self.layers = [BertLayer(d, name=f"layer_{i}")
                       for i in range(d.num_layers)]

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        x = self.embeddings(input_ids, token_type_ids, deterministic)
        mask = None
        if attention_mask is not None:
            mask = jnp.where(attention_mask[:, None, None, :] > 0,
                             0.0, -1e9).astype(x.dtype)
        for layer in self.layers:
            x = layer(x, mask, deterministic)
        return x

    def cls_rep(self, input_ids, attention_mask=None, token_type_ids=None,
                deterministic=True):
        """CLS representation (``document_encoder.py:113-120``)."""
        return self(input_ids, attention_mask, token_type_ids,
                    deterministic)[:, 0, :]
