"""PAWA adaptive decoder head.

The reference's "adaptor_efficient" PAWA (``modeling_t5.py:1240-1255,
1647-1682``): a small *torch-style* TransformerDecoder (post-LayerNorm,
scaled dot-product attention, ReLU FFN — ``nn.TransformerDecoderLayer``
defaults) runs over the decode-token embeddings with a single learned
memory vector; a linear head maps its output to a per-position
(d_model x vocab) weight delta that is added to the tied LM head before
the logits matmul.

TPU-native twist: the delta weight is never materialized as
(batch, len, d, V).  Because the NCI decode vocab is position-sliced
(level i only scores its K codes + EOS), logits are computed directly as

    logits[b, t, c] = seq[b, t, :] @ (W + A h_a[b, t])[:, cols(t, c)]
                    = einsum(seq, h_a, A[:, :, cols]) + seq @ W[:, cols]

with ``cols(t) = [2 + t*K .. 2 + t*K + K - 1] ∪ {1}`` — K+1 columns
instead of V, and no (d x V) per-position tensor (the reference builds
one per batch element per step, ``modeling_t5.py:1677-1682``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PawaDims:
    d_model: int = 768
    num_heads: int = 8          # torch default in the reference ctor
    d_ff: int = 2048            # torch nn.TransformerDecoderLayer default
    num_layers: int = 4         # --adaptor_layer_num
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-5   # torch LayerNorm default
    dtype: Any = jnp.float32


class TorchMultiheadAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` numerics (packed in-proj, scaled)."""
    dims: PawaDims

    @nn.compact
    def __call__(self, q_in, kv_in, attn_mask=None, deterministic=True):
        d = self.dims
        dm = d.d_model
        h = d.num_heads
        dk = dm // h
        in_proj_w = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (dm, 3 * dm))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros,
                               (3 * dm,))
        q = q_in @ in_proj_w[:, :dm] + in_proj_b[:dm]
        k = kv_in @ in_proj_w[:, dm:2 * dm] + in_proj_b[dm:2 * dm]
        v = kv_in @ in_proj_w[:, 2 * dm:] + in_proj_b[2 * dm:]

        def split(x):
            b, l, _ = x.shape
            return x.reshape(b, l, h, dk).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.float32(dk)).astype(q.dtype)
        if attn_mask is not None:
            scores = scores + attn_mask
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(q.dtype)
        probs = nn.Dropout(d.dropout_rate)(probs,
                                           deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, _, l, _ = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, dm)
        return nn.Dense(dm, name="out_proj", dtype=d.dtype)(ctx)


class TorchDecoderLayer(nn.Module):
    """torch ``nn.TransformerDecoderLayer`` (post-norm, relu)."""
    dims: PawaDims

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, deterministic=True):
        d = self.dims
        sa = TorchMultiheadAttention(d, name="self_attn")(
            tgt, tgt, tgt_mask, deterministic)
        sa = nn.Dropout(d.dropout_rate)(sa, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=d.layer_norm_epsilon, name="norm1",
                         dtype=d.dtype)(tgt + sa)
        ca = TorchMultiheadAttention(d, name="cross_attn")(
            x, memory, None, deterministic)
        ca = nn.Dropout(d.dropout_rate)(ca, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=d.layer_norm_epsilon, name="norm2",
                         dtype=d.dtype)(x + ca)
        ff = nn.Dense(d.d_ff, name="linear1", dtype=d.dtype)(x)
        ff = nn.Dropout(d.dropout_rate)(jax.nn.relu(ff),
                                        deterministic=deterministic)
        ff = nn.Dense(d.d_model, name="linear2", dtype=d.dtype)(ff)
        ff = nn.Dropout(d.dropout_rate)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=d.layer_norm_epsilon, name="norm3",
                            dtype=d.dtype)(x + ff)


class PawaAdaptor(nn.Module):
    """The adaptor stack producing h_a (b, l, d); the logits composition
    lives in :class:`mevi_tpu.models.nci.NCIT5` so the weight-delta matmul
    can be column-sliced."""
    dims: PawaDims

    def setup(self):
        d = self.dims
        self.memory_embedding = self.param(
            "memory_embedding",
            nn.initializers.uniform(scale=1.0), (1, 1, d.d_model))
        self.layers = [TorchDecoderLayer(d, name=f"layer_{i}")
                       for i in range(d.num_layers)]

    def __call__(self, tgt_embeds, deterministic=True):
        b, l, _ = tgt_embeds.shape
        mask = jnp.where(
            jnp.tril(jnp.ones((l, l), bool)), 0.0, -jnp.inf
        ).astype(tgt_embeds.dtype)[None, None]
        memory = jnp.broadcast_to(
            self.memory_embedding.astype(tgt_embeds.dtype),
            (b, 1, self.dims.d_model))
        x = tgt_embeds
        for layer in self.layers:
            x = layer(x, memory, mask, deterministic=deterministic)
        return x
