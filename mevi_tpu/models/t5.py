"""T5 encoder-decoder in flax.linen, numerically matching HF T5 so that
T5-ANCE / docT5query checkpoints convert losslessly.

The reference vendors a modified HF-3.x fork (``MEVI/transformers/
modeling_t5.py``); only the T5 math itself (RMSNorm, unscaled attention,
first-block relative position bias, tied-head rescale) plus the NCI
extensions carry semantic weight — the NCI pieces live in
:mod:`mevi_tpu.models.nci`.

Implementation notes
* attention is *not* scaled by 1/sqrt(d_k) (T5 folds it into init),
* RMSNorm without mean subtraction or bias (``modeling_t5.py:T5LayerNorm``),
* relative position bias only in block 0 of each stack, shared onward,
* when embeddings are tied, decoder output is scaled by d_model**-0.5
  before the LM head (``modeling_t5.py:1607``),
* cross-attention K/V can be precomputed once per query and reused for
  every decode step / beam (the reference re-projects them every step —
  ``use_cache=False`` at ``main_models.py:3615``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class T5Dims:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    num_decoder_layers: int = 6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dropout_rate: float = 0.1
    gated_act: bool = False      # False: relu (t5 v1.0 / t5-ance)
    remat: bool = False          # rematerialize blocks (training memory)
    dtype: Any = jnp.float32

    @classmethod
    def base(cls, **kw) -> "T5Dims":
        return cls(**kw)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (w * y).astype(self.dtype)


def relative_position_bucket(rel_pos, bidirectional: bool,
                             num_buckets: int, max_distance: int):
    """HF T5 _relative_position_bucket, exactly."""
    ret = 0
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-20)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    ret += jnp.where(is_small, n, val_if_large)
    return ret


class T5Attention(nn.Module):
    dims: T5Dims
    has_relative_bias: bool = False
    bidirectional: bool = True

    def setup(self):
        d = self.dims
        inner = d.num_heads * d.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, name=name,
                                      dtype=d.dtype)
        self.q = dense("q")
        self.k = dense("k")
        self.v = dense("v")
        self.o = nn.Dense(d.d_model, use_bias=False, name="o", dtype=d.dtype)
        if self.has_relative_bias:
            self.relative_attention_bias = nn.Embed(
                d.relative_attention_num_buckets, d.num_heads,
                name="relative_attention_bias", dtype=jnp.float32)

    def compute_bias(self, q_len: int, k_len: int,
                     q_offset: int = 0) -> jnp.ndarray:
        d = self.dims
        ctx = jnp.arange(q_len)[:, None] + q_offset
        mem = jnp.arange(k_len)[None, :]
        buckets = relative_position_bucket(
            mem - ctx, self.bidirectional,
            d.relative_attention_num_buckets,
            d.relative_attention_max_distance)
        bias = self.relative_attention_bias(buckets)      # (q, k, h)
        return jnp.transpose(bias, (2, 0, 1))[None]        # (1, h, q, k)

    def _split(self, x):
        # heads-LAST (b, l, h, dk): the head split is a free reshape and
        # the attend einsums fold the head transpose into the matmuls —
        # the heads-major (b, h, l, dk) convention materialized a layout
        # copy per projection (~8.5 ms of the batch-512 beam program)
        b, l, _ = x.shape
        return x.reshape(b, l, self.dims.num_heads, self.dims.d_kv)

    def attend(self, q, k, v, position_bias, mask):
        """q,k,v: (b, l, h, d_kv); mask: additive (b, 1, q, k) or None."""
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        if position_bias is not None:
            scores = scores + position_bias
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        b, l, h, dk = out.shape
        return out.reshape(b, l, h * dk)

    def __call__(self, hidden, kv_hidden=None, mask=None,
                 position_bias=None, kv_cache=None):
        """kv_cache: optional precomputed (k, v) heads for cross-attn."""
        if kv_cache is not None:
            q = self._split(self.q(hidden))
            k, v = kv_cache
        elif kv_hidden is None:
            q, k, v = self.project_qkv(hidden)
        else:
            q = self._split(self.q(hidden))
            k = self._split(self.k(kv_hidden))
            v = self._split(self.v(kv_hidden))
        if position_bias is None and self.has_relative_bias:
            position_bias = self.compute_bias(q.shape[1], k.shape[1])
        ctx = self.attend(q, k, v, position_bias, mask)
        return self.o(ctx), position_bias

    def project_qkv(self, hidden):
        """Self-attention q/k/v in ONE (d, 3*inner) matmul — three
        back-to-back (rows, d) x (d, inner) dispatches were a measured
        overhead in the decode step (scripts/profile_step.py)."""
        d = self.dims
        inner = d.num_heads * d.d_kv
        if self.is_initializing():          # params don't exist yet
            return (self._split(self.q(hidden)),
                    self._split(self.k(hidden)),
                    self._split(self.v(hidden)))
        Wq = self.q.variables["params"]["kernel"]
        Wk = self.k.variables["params"]["kernel"]
        Wv = self.v.variables["params"]["kernel"]
        qkv = hidden @ jnp.concatenate([Wq, Wk, Wv], axis=1).astype(
            hidden.dtype)
        return (self._split(qkv[..., :inner]),
                self._split(qkv[..., inner:2 * inner]),
                self._split(qkv[..., 2 * inner:]))

    def project_kv(self, kv_hidden):
        return self._split(self.k(kv_hidden)), self._split(self.v(kv_hidden))


class T5FF(nn.Module):
    dims: T5Dims

    @nn.compact
    def __call__(self, x, deterministic=True):
        d = self.dims
        if d.gated_act:
            wi0 = nn.Dense(d.d_ff, use_bias=False, name="wi_0",
                           dtype=d.dtype)(x)
            wi1 = nn.Dense(d.d_ff, use_bias=False, name="wi_1",
                           dtype=d.dtype)(x)
            h = jax.nn.gelu(wi0, approximate=True) * wi1
        else:
            h = jax.nn.relu(
                nn.Dense(d.d_ff, use_bias=False, name="wi", dtype=d.dtype)(x))
        h = nn.Dropout(d.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d.d_model, use_bias=False, name="wo",
                        dtype=d.dtype)(h)


class T5Block(nn.Module):
    dims: T5Dims
    is_decoder: bool
    has_relative_bias: bool

    def setup(self):
        d = self.dims
        self.self_attn = T5Attention(
            d, has_relative_bias=self.has_relative_bias,
            bidirectional=not self.is_decoder, name="self_attn")
        self.self_norm = RMSNorm(d.d_model, d.layer_norm_epsilon, d.dtype,
                                 name="self_norm")
        if self.is_decoder:
            self.cross_attn = T5Attention(d, has_relative_bias=False,
                                          name="cross_attn")
            self.cross_norm = RMSNorm(d.d_model, d.layer_norm_epsilon,
                                      d.dtype, name="cross_norm")
        self.ff = T5FF(d, name="ff")
        self.ff_norm = RMSNorm(d.d_model, d.layer_norm_epsilon, d.dtype,
                               name="ff_norm")
        self.dropout = nn.Dropout(d.dropout_rate)

    def __call__(self, hidden, self_mask=None, position_bias=None,
                 enc_hidden=None, enc_mask=None, cross_kv=None,
                 deterministic=True):
        y, position_bias = self.self_attn(
            self.self_norm(hidden), mask=self_mask,
            position_bias=position_bias)
        hidden = hidden + self.dropout(y, deterministic=deterministic)
        if self.is_decoder:
            y, _ = self.cross_attn(
                self.cross_norm(hidden), kv_hidden=enc_hidden,
                mask=enc_mask, kv_cache=cross_kv)
            hidden = hidden + self.dropout(y, deterministic=deterministic)
        y = self.ff(self.ff_norm(hidden), deterministic=deterministic)
        hidden = hidden + self.dropout(y, deterministic=deterministic)
        return hidden, position_bias


def _cross_ffn_step(block, hidden, cross_kv, enc_mask, beams):
    """Cross-attention + FFN tail of one decode step; ``cross_kv`` may
    be per-QUERY (b // beams rows) and is then shared across each
    query's beams without materializing the replication."""
    cattn = block.cross_attn
    cx = block.cross_norm(hidden)
    ck_, cv_ = cross_kv
    if beams > 1 and ck_.shape[0] * beams == cx.shape[0]:
        cq = cattn._split(cattn.q(cx))             # (B*nb, 1, h, dk)
        B = ck_.shape[0]
        h, dk = cq.shape[2], cq.shape[3]
        cqb = cq.reshape(B, beams, h, dk)
        scores = jnp.einsum("bnhd,bkhd->bhnk", cqb,
                            ck_).astype(jnp.float32)
        if enc_mask is not None:
            scores = scores + enc_mask             # (B,1,1,k) bcast
        probs = jax.nn.softmax(scores, -1).astype(cq.dtype)
        ctx = jnp.einsum("bhnk,bkhd->bnhd", probs, cv_)
        ctx = ctx.reshape(B * beams, 1, h * dk)
        y = cattn.o(ctx)
    else:
        y, _ = cattn(cx, mask=enc_mask, kv_cache=(ck_, cv_))
    hidden = hidden + y
    return hidden + block.ff(block.ff_norm(hidden))


def extend_mask(mask: Optional[jnp.ndarray],
                dtype=jnp.float32) -> Optional[jnp.ndarray]:
    """(b, k) 1/0 mask -> additive (b, 1, 1, k)."""
    if mask is None:
        return None
    return jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(dtype)


def causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    m = jnp.tril(jnp.ones((length, length), bool))
    return jnp.where(m, 0.0, -1e9).astype(dtype)[None, None]


class T5Stack(nn.Module):
    """Encoder or decoder stack (embedding handled by the caller so that
    NCI can swap in a separate decode-vocab embedding)."""
    dims: T5Dims
    num_layers: int
    is_decoder: bool

    def setup(self):
        d = self.dims
        # jax.checkpoint each block to trade recompute for activation
        # memory (SURVEY.md TPU notes; batch-512 T5-base training)
        block_cls = (nn.remat(T5Block, static_argnums=(7,))
                     if d.remat else T5Block)
        self.blocks = [
            block_cls(d, is_decoder=self.is_decoder,
                      has_relative_bias=(i == 0), name=f"block_{i}")
            for i in range(self.num_layers)]
        self.final_norm = RMSNorm(d.d_model, d.layer_norm_epsilon, d.dtype,
                                  name="final_norm")
        self.dropout = nn.Dropout(d.dropout_rate)

    def __call__(self, embeds, self_mask=None, enc_hidden=None,
                 enc_mask=None, cross_kvs=None, deterministic=True):
        hidden = self.dropout(embeds, deterministic=deterministic)
        position_bias = None
        for i, block in enumerate(self.blocks):
            ckv = None if cross_kvs is None else cross_kvs[i]
            # positional call: nn.remat static_argnums needs positions
            hidden, position_bias = block(
                hidden, self_mask, position_bias, enc_hidden, enc_mask,
                ckv, deterministic)
        return self.final_norm(self.dropout(
            hidden, deterministic=deterministic))

    def project_cross_kvs(self, enc_hidden):
        """Precompute each layer's cross-attention (k, v) once per query."""
        assert self.is_decoder
        return [b.cross_attn.project_kv(enc_hidden) for b in self.blocks]

    # -- incremental decoding (self-attn KV cache) ------------------------

    def init_cache(self, batch: int, max_len: int, dtype=None):
        """Per-layer (k, v) caches of shape (max_len, b, h, d_kv).

        Time-major layout: the per-step write is a leading-dim slab
        (``dynamic_update_slice_in_dim(..., axis=0)``) and the attend
        einsum consumes the cache as-is — the batch-major layout made
        XLA relayout every cache tensor every decode step (profiled at
        ~4.6 ms/call at serving batch)."""
        d = self.dims
        dtype = dtype or d.dtype
        shape = (max_len, batch, d.num_heads, d.d_kv)
        return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
                for _ in range(self.num_layers)]

    def decode_step(self, embed_t, t, cache, cross_kvs, enc_mask,
                    beams: int = 1):
        """One decode step with KV caching.

        Args:
          embed_t: (b, 1, d) current-token embedding.
          t: traced step index.
          cache: list of per-layer (k, v), time-major
            (max_len, b, h, d_kv) — see ``init_cache``.
          cross_kvs: precomputed cross-attn (k, v) per layer — shape
            (b, enc_len, h, d_kv), or (b // beams, enc_len, h, d_kv)
            when ``beams > 1``: the K/V are per *query* and shared by
            its beams (never materialized x beams — at serving batch
            256 x 10 beams that replication is 1.5 GB re-read every
            step).
          enc_mask: additive (b or b//beams, 1, 1, enc_len) or None.
        Returns:
          (hidden_t (b, 1, d), new_cache).
        """
        assert self.is_decoder
        d = self.dims
        max_len = cache[0][0].shape[0]
        pos = jnp.arange(max_len)
        causal = jnp.where(pos[None, None, None, :] <= t, 0.0,
                           -1e9).astype(jnp.float32)
        hidden = embed_t
        new_cache = []
        position_bias = None
        for i, block in enumerate(self.blocks):
            attn = block.self_attn
            x = block.self_norm(hidden)
            q, k_t, v_t = attn.project_qkv(x)          # (b, 1, h, dk)
            ck, cv = cache[i]                          # (L, b, h, dk)
            ck = jax.lax.dynamic_update_slice_in_dim(
                ck, k_t.transpose(1, 0, 2, 3), t, axis=0)
            cv = jax.lax.dynamic_update_slice_in_dim(
                cv, v_t.transpose(1, 0, 2, 3), t, axis=0)
            new_cache.append((ck, cv))
            if i == 0:
                # decoder rel-pos bias row for query position t
                buckets = relative_position_bucket(
                    pos[None, :] - t, False,
                    d.relative_attention_num_buckets,
                    d.relative_attention_max_distance)
                bias = attn.relative_attention_bias(buckets[0])  # (L, h)
                position_bias = jnp.transpose(bias)[None, :, None, :]
            # time-major attend: scores (b, h, 1, L)
            scores = jnp.einsum("bqhd,lbhd->bhql", q,
                                ck).astype(jnp.float32)
            scores = scores + position_bias + causal
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            y = jnp.einsum("bhql,lbhd->bqhd", probs, cv)
            b = y.shape[0]
            y = y.reshape(b, 1, d.num_heads * d.d_kv)
            hidden = hidden + attn.o(y)
            hidden = _cross_ffn_step(block, hidden, cross_kvs[i],
                                     enc_mask, beams)
        return self.final_norm(hidden), new_cache

    def decode_step_unrolled(self, embed_t, t: int, entries, cross_kvs,
                             enc_mask, beams: int = 1):
        """Statically-unrolled decode step (``t`` is a PYTHON int).

        The self-attn cache is a LIST of per-position entries; each
        entry is a TUPLE over layers of ``(k, v)`` arrays of shape
        ``(rows_p, h, dk)``.  Per-layer tuples (not one packed
        ``(rows, layers, 2, h, dk)`` array) keep every array in its
        producer's natural layout: the packed form cost a relayout
        copy at the cross-layer stack plus a strided-slice copy per
        layer at consumption (~3.4 ms of the 88.9 ms beam program in
        the round-4 trace), while per-layer rows-major arrays make the
        caller's beam reorder a pytree of contiguous row gathers.
        ``rows_p`` may be ``b // beams`` for positions written while
        every beam of a query still shared the prefix (the step-0
        start token): those entries are broadcast across beams inside
        the score/context einsums and are never beam-reordered.
        Compared to the dynamic-``t`` :meth:`decode_step`, only
        positions that exist are stored/attended/moved.

        Returns ``(hidden (b, 1, d), new_entry)`` with ``new_entry`` a
        tuple over layers of ``(k (b, h, dk), v (b, h, dk))``; the
        caller appends it (beam-reordered) to ``entries`` for the
        next step.
        """
        assert self.is_decoder
        d = self.dims
        b = embed_t.shape[0]
        hidden = embed_t
        new_kv = []
        position_bias = None
        for i, block in enumerate(self.blocks):
            attn = block.self_attn
            x = block.self_norm(hidden)
            q, k_t, v_t = attn.project_qkv(x)          # (b, 1, h, dk)
            k_t2, v_t2 = k_t[:, 0], v_t[:, 0]          # (b, h, dk)
            new_kv.append((k_t2, v_t2))
            if i == 0:
                # static rel-pos bias row for query position t
                rel = jnp.arange(t + 1)[None, :] - t
                buckets = relative_position_bucket(
                    rel, False, d.relative_attention_num_buckets,
                    d.relative_attention_max_distance)
                bias = attn.relative_attention_bias(
                    buckets[0])                        # (t+1, h)
                position_bias = jnp.transpose(bias)[None]  # (1, h, t+1)
            q2 = q[:, 0]
            parts = []
            for p in range(t):
                kp = entries[p][i][0]
                if kp.shape[0] != b:                   # beam-shared
                    qb = q2.reshape(kp.shape[0], -1, *q2.shape[1:])
                    sp = jnp.einsum("Bnhd,Bhd->Bnh", qb, kp)
                    parts.append(sp.reshape(b, -1))
                else:
                    parts.append(jnp.einsum("bhd,bhd->bh", q2, kp))
            parts.append(jnp.einsum("bhd,bhd->bh", q2, k_t2))
            scores = jnp.stack(parts, axis=-1).astype(jnp.float32)
            probs = jax.nn.softmax(scores + position_bias,
                                   axis=-1).astype(q.dtype)
            ctx = probs[..., t, None] * v_t2
            for p in range(t):
                vp = entries[p][i][1]
                if vp.shape[0] != b:
                    pb = probs[..., p].reshape(vp.shape[0], -1,
                                               probs.shape[1])
                    cp = jnp.einsum("Bnh,Bhd->Bnhd", pb, vp)
                    ctx = ctx + cp.reshape(b, *vp.shape[1:])
                else:
                    ctx = ctx + probs[..., p, None] * vp
            y = ctx.reshape(b, 1, d.num_heads * d.d_kv)
            hidden = hidden + attn.o(y)
            hidden = _cross_ffn_step(block, hidden, cross_kvs[i],
                                     enc_mask, beams)
        return self.final_norm(hidden), tuple(new_kv)


class T5EncoderModel(nn.Module):
    """Shared-embedding encoder (query/passage tower front end)."""
    dims: T5Dims

    def setup(self):
        d = self.dims
        self.shared = nn.Embed(d.vocab_size, d.d_model, name="shared",
                               dtype=d.dtype)
        self.encoder = T5Stack(d, d.num_layers, is_decoder=False,
                               name="encoder")

    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        embeds = self.shared(input_ids)
        mask = extend_mask(attention_mask)
        return self.encoder(embeds, self_mask=mask,
                            deterministic=deterministic)


class T5Model(nn.Module):
    """Encoder + decoder without LM head — the HF ``T5Model`` shape used
    by the T5-ANCE twin tower (``document_encoder.py:104-120``: the
    passage/query representation is decoder token-0's hidden state with a
    single zero decoder input id)."""
    dims: T5Dims
    num_decoder_layers: Optional[int] = None

    def setup(self):
        d = self.dims
        n_dec = self.num_decoder_layers or d.num_decoder_layers
        self.shared = nn.Embed(d.vocab_size, d.d_model, name="shared",
                               dtype=d.dtype)
        self.encoder = T5Stack(d, d.num_layers, is_decoder=False,
                               name="encoder")
        self.decoder = T5Stack(d, n_dec, is_decoder=True, name="decoder")

    def encode(self, input_ids, attention_mask=None, deterministic=True):
        mask = extend_mask(attention_mask)
        return self.encoder(self.shared(input_ids), self_mask=mask,
                            deterministic=deterministic)

    def decode(self, decoder_input_ids, enc_hidden, enc_attention_mask=None,
               deterministic=True):
        embeds = self.shared(decoder_input_ids)
        l = decoder_input_ids.shape[1]
        self_mask = causal_mask(l)
        enc_mask = extend_mask(enc_attention_mask)
        return self.decoder(embeds, self_mask=self_mask,
                            enc_hidden=enc_hidden, enc_mask=enc_mask,
                            deterministic=deterministic)

    def __call__(self, input_ids, attention_mask=None,
                 decoder_input_ids=None, deterministic=True):
        enc = self.encode(input_ids, attention_mask, deterministic)
        if decoder_input_ids is None:
            decoder_input_ids = jnp.zeros(
                (input_ids.shape[0], 1), jnp.int32)
        dec = self.decode(decoder_input_ids, enc, attention_mask,
                          deterministic)
        return enc, dec

    def first_token_rep(self, input_ids, attention_mask=None,
                        deterministic=True):
        """The ANCE embedding: decoder token-0 hidden state
        (``document_encoder.py:108-117``)."""
        _, dec = self(input_ids, attention_mask,
                      deterministic=deterministic)
        return dec[:, 0, :]
