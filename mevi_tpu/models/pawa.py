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
from typing import Any

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

    def setup(self):
        d = self.dims
        dm = d.d_model
        self.in_proj_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(),
            (dm, 3 * dm))
        self.in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * dm,))
        self.out_proj = nn.Dense(dm, name="out_proj", dtype=d.dtype)
        self.dropout = nn.Dropout(d.dropout_rate)

    def _split(self, x):
        # heads-last (b, l, h, dk) — see T5Attention._split
        d = self.dims
        h = d.num_heads
        dk = d.d_model // h
        b, l, _ = x.shape
        return x.reshape(b, l, h, dk)

    def project_q(self, x):
        dm = self.dims.d_model
        return self._split(x @ self.in_proj_kernel[:, :dm]
                           + self.in_proj_bias[:dm])

    def project_kv(self, x):
        dm = self.dims.d_model
        k = x @ self.in_proj_kernel[:, dm:2 * dm] \
            + self.in_proj_bias[dm:2 * dm]
        v = x @ self.in_proj_kernel[:, 2 * dm:] + self.in_proj_bias[2 * dm:]
        return self._split(k), self._split(v)

    def project_qkv(self, x):
        """q/k/v in one packed-in-proj matmul (decode-step hot path)."""
        dm = self.dims.d_model
        qkv = x @ self.in_proj_kernel + self.in_proj_bias
        return (self._split(qkv[..., :dm]),
                self._split(qkv[..., dm:2 * dm]),
                self._split(qkv[..., 2 * dm:]))

    def attend(self, q, k, v, attn_mask=None, deterministic=True):
        d = self.dims
        dk = d.d_model // d.num_heads
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.float32(dk)).astype(q.dtype)
        if attn_mask is not None:
            scores = scores + attn_mask
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(q.dtype)
        probs = self.dropout(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        b, l, _, _ = ctx.shape
        ctx = ctx.reshape(b, l, d.d_model)
        return self.out_proj(ctx)

    def __call__(self, q_in, kv_in, attn_mask=None, deterministic=True):
        if q_in is kv_in:                       # self-attn: fused in-proj
            q, k, v = self.project_qkv(q_in)
        else:
            q = self.project_q(q_in)
            k, v = self.project_kv(kv_in)
        return self.attend(q, k, v, attn_mask, deterministic)


class TorchDecoderLayer(nn.Module):
    """torch ``nn.TransformerDecoderLayer`` (post-norm, relu)."""
    dims: PawaDims

    def setup(self):
        d = self.dims
        self.self_attn = TorchMultiheadAttention(d, name="self_attn")
        self.cross_attn = TorchMultiheadAttention(d, name="cross_attn")
        self.norm1 = nn.LayerNorm(epsilon=d.layer_norm_epsilon,
                                  name="norm1", dtype=d.dtype)
        self.norm2 = nn.LayerNorm(epsilon=d.layer_norm_epsilon,
                                  name="norm2", dtype=d.dtype)
        self.norm3 = nn.LayerNorm(epsilon=d.layer_norm_epsilon,
                                  name="norm3", dtype=d.dtype)
        self.linear1 = nn.Dense(d.d_ff, name="linear1", dtype=d.dtype)
        self.linear2 = nn.Dense(d.d_model, name="linear2", dtype=d.dtype)
        self.dropout = nn.Dropout(d.dropout_rate)

    def _ff(self, x, deterministic):
        ff = self.dropout(jax.nn.relu(self.linear1(x)),
                          deterministic=deterministic)
        ff = self.dropout(self.linear2(ff), deterministic=deterministic)
        return self.norm3(x + ff)

    def __call__(self, tgt, memory, tgt_mask=None, deterministic=True):
        sa = self.self_attn(tgt, tgt, tgt_mask, deterministic)
        sa = self.dropout(sa, deterministic=deterministic)
        x = self.norm1(tgt + sa)
        ca = self.cross_attn(x, memory, None, deterministic)
        ca = self.dropout(ca, deterministic=deterministic)
        x = self.norm2(x + ca)
        return self._ff(x, deterministic)

    def decode_step_unrolled(self, x_t, t: int, entries_i, mem_const):
        """Statically-unrolled step: ``t`` is a python int; the cache
        is a per-position list of ``(k, v)`` tuples for THIS layer,
        each array ``(rows, h, dk)`` (per-layer tuples: see
        ``T5Stack.decode_step_unrolled``).  PAWA is
        query-independent, so the position-0 (start-token) entry may
        have rows == 1 and broadcasts over the whole beam batch.
        Returns (out (b, 1, d), new entry (k, v) of (b, h, dk))."""
        d = self.dims
        b = x_t.shape[0]
        dk = d.d_model // d.num_heads
        q, k_t, v_t = self.self_attn.project_qkv(x_t)   # (b, 1, h, dk)
        k_t2, v_t2 = k_t[:, 0], v_t[:, 0]
        q2 = q[:, 0]
        parts = []
        for p in range(t):
            kp = entries_i[p][0]
            if kp.shape[0] != b:
                qb = q2.reshape(kp.shape[0], -1, *q2.shape[1:])
                parts.append(jnp.einsum("Bnhd,Bhd->Bnh", qb,
                                        kp).reshape(b, -1))
            else:
                parts.append(jnp.einsum("bhd,bhd->bh", q2, kp))
        parts.append(jnp.einsum("bhd,bhd->bh", q2, k_t2))
        scores = (jnp.stack(parts, axis=-1)
                  / jnp.sqrt(jnp.float32(dk)).astype(q.dtype)
                  ).astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        ctx = probs[..., t, None] * v_t2
        for p in range(t):
            vp = entries_i[p][1]
            if vp.shape[0] != b:
                pb = probs[..., p].reshape(vp.shape[0], -1,
                                           probs.shape[1])
                ctx = ctx + jnp.einsum("Bnh,Bhd->Bnhd", pb,
                                       vp).reshape(b, *vp.shape[1:])
            else:
                ctx = ctx + probs[..., p, None] * vp
        sa = self.self_attn.out_proj(ctx.reshape(b, 1, d.d_model))
        x = self.norm1(x_t + sa)
        x = self.norm2(x + mem_const)
        return self._ff(x, True), (k_t2, v_t2)

    def decode_step(self, x_t, t, cache_kv, mem_const):
        """Incremental step: x_t (b, 1, d); cache_kv (k, v) of shape
        (max_len, b, h, dk) — time-major so the per-step write is a
        leading-dim slab (batch-major caches made XLA relayout them
        every decode step); mem_const is the precomputed cross-attn
        output (see :meth:`PawaAdaptor.precompute_mem_kvs`)."""
        d = self.dims
        max_len = cache_kv[0].shape[0]
        pos = jnp.arange(max_len)
        causal = jnp.where(pos[None, None, None, :] <= t, 0.0,
                           -1e9).astype(jnp.float32)
        q, k_t, v_t = self.self_attn.project_qkv(x_t)   # (b, 1, h, dk)
        ck = jax.lax.dynamic_update_slice_in_dim(
            cache_kv[0], k_t.transpose(1, 0, 2, 3), t, 0)
        cv = jax.lax.dynamic_update_slice_in_dim(
            cache_kv[1], v_t.transpose(1, 0, 2, 3), t, 0)
        dk = d.d_model // d.num_heads
        scores = jnp.einsum("bqhd,lbhd->bhql", q, ck) / jnp.sqrt(
            jnp.float32(dk)).astype(q.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32) + causal,
                               axis=-1).astype(q.dtype)
        ctx = jnp.einsum("bhql,lbhd->bqhd", probs, cv)
        b = ctx.shape[0]
        sa = self.self_attn.out_proj(ctx.reshape(b, 1, d.d_model))
        x = self.norm1(x_t + sa)
        x = self.norm2(x + mem_const)
        return self._ff(x, True), (ck, cv)


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

    def panel_with_kvs(self, tgt_embeds):
        """Panel forward that ALSO returns every layer's self-attn k/v
        (what the decode path caches): (h_all (b, l, d), kvs
        (num_layers, 2, b, l, h, dk)).  Used to precompute per-prefix
        cache tables (PAWA sees only the decode tokens, so its entire
        state is a function of the code prefix)."""
        d = self.dims
        b, l, _ = tgt_embeds.shape
        h = d.num_heads
        dk = d.d_model // h
        mask = jnp.where(
            jnp.tril(jnp.ones((l, l), bool)), 0.0, -jnp.inf
        ).astype(tgt_embeds.dtype)[None, None]
        memory = jnp.broadcast_to(
            self.memory_embedding.astype(tgt_embeds.dtype),
            (b, 1, d.d_model))
        x = tgt_embeds
        kvs = []
        for layer in self.layers:
            _, k, v = layer.self_attn.project_qkv(x)   # (b, l, h, dk)
            kvs.append(jnp.stack([k, v]))
            x = layer(x, memory, mask, deterministic=True)
        # (num_layers, 2, b, l, h, dk)
        return x, jnp.stack(kvs)

    # -- incremental decoding ---------------------------------------------

    def precompute_mem_kvs(self, batch: int, dtype=None):
        """The memory is ONE learned vector, so each layer's
        cross-attention is softmax over a single key — identity — and the
        whole block collapses to the constant ``out_proj(v_mem)``.
        Returns that (1, 1, d) constant per layer (broadcasts over the
        beam batch in the residual add)."""
        del batch  # constants broadcast; kept for call-site stability
        mem = self.memory_embedding.astype(dtype or self.dims.dtype)
        out = []
        for layer in self.layers:
            _, v = layer.cross_attn.project_kv(mem)     # (1, 1, h, dk)
            d = self.dims
            ctx = v.reshape(1, 1, d.d_model)
            out.append(layer.cross_attn.out_proj(ctx))
        return out

    def init_cache(self, batch: int, max_len: int, dtype=None):
        """Time-major (max_len, b, h, dk) — see decode_step."""
        d = self.dims
        dk = d.d_model // d.num_heads
        shape = (max_len, batch, d.num_heads, dk)
        dtype = dtype or d.dtype
        return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
                for _ in self.layers]

    def decode_step(self, embed_t, t, cache, mem_kvs):
        """embed_t (b, 1, d) -> (h_a_t (b, 1, d), new cache)."""
        x = embed_t
        new_cache = []
        for layer, ckv, mkv in zip(self.layers, cache, mem_kvs):
            x, nkv = layer.decode_step(x, t, ckv, mkv)
            new_cache.append(nkv)
        return x, new_cache

    def decode_step_unrolled(self, embed_t, t: int, entries,
                             mem_kvs=None):
        """Static-``t`` step over a per-position entry list; each
        entry is a tuple over layers of ``(k, v)`` arrays of shape
        ``(rows, h, dk)``.  Returns (h_a_t (b, 1, d), new entry —
        tuple over layers of ``(k (b, h, dk), v (b, h, dk))``)."""
        if mem_kvs is None:
            mem_kvs = self.precompute_mem_kvs(0)
        x = embed_t
        new = []
        for i, (layer, mkv) in enumerate(zip(self.layers, mem_kvs)):
            x, e = layer.decode_step_unrolled(
                x, t, [ent[i] for ent in entries], mkv)
            new.append(e)
        return x, tuple(new)
