"""NCI seq2seq model: T5 with a position-sliced code vocabulary and the
PAWA adaptive LM head.

Rebuild of the reference's modified ``T5ForConditionalGeneration``
(``MEVI/transformers/modeling_t5.py:1145-1968``) with the semantics that
matter:

* separate decode-side embedding over the code vocab
  ``V = kary * max_output_length + 2`` (ids: 0 pad/start, 1 eos, code c of
  level i at ``2 + i*kary + c`` — ``main_models.py:100-105``),
* LM head tied to the decode embedding plus the PAWA per-position weight
  delta (``modeling_t5.py:1647-1682``),
* position-validity logit masking (``modeling_t5.py:1290-1312``): at
  position t only level-t codes and EOS may score.

TPU-native representation: logits are **compact** — shape
``(batch, L, kary + 1)`` with columns ``[level-t codes..., EOS]`` — the
exact valid set per position, so the full-vocab mask, the ``nci_logits``
slice for PQ distillation (``modeling_t5.py:1692-1701``) and the beam
normalization all come out of one tensor and the (d_model x V)
per-position PAWA weight is never materialized.
``compact_to_full_logits`` recovers the reference layout for parity
tests.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .pawa import PawaAdaptor, PawaDims
from .t5 import T5Dims, T5Stack, causal_mask, extend_mask

NEG = -1e9


@dataclasses.dataclass(frozen=True)
class NCIDims:
    t5: T5Dims = dataclasses.field(default_factory=T5Dims)
    kary: int = 32
    max_output_length: int = 6
    adaptor_layer_num: int = 4
    adaptor_num_heads: int = 8
    adaptor_d_ff: int = 2048
    use_pawa: bool = True
    reserve_decoder: bool = False     # frozen 12-layer tower decoder
    tie_decode_embedding: bool = True

    @property
    def decode_vocab_size(self) -> int:
        return self.kary * self.max_output_length + 2

    @property
    def code_len(self) -> int:
        return self.max_output_length - 2

    @property
    def compact_width(self) -> int:
        return self.kary + 1

    def pawa_dims(self) -> PawaDims:
        return PawaDims(
            d_model=self.t5.d_model, num_heads=self.adaptor_num_heads,
            d_ff=self.adaptor_d_ff, num_layers=self.adaptor_layer_num,
            dropout_rate=self.t5.dropout_rate, dtype=self.t5.dtype)


def codes_to_tokens(codes: jnp.ndarray, kary: int) -> jnp.ndarray:
    """(…, M) codes -> decode-vocab token ids (position offset + 2)."""
    offs = jnp.arange(codes.shape[-1], dtype=codes.dtype) * kary
    return codes + offs + 2


def tokens_to_codes(tokens: jnp.ndarray, kary: int) -> jnp.ndarray:
    """Inverse of :func:`codes_to_tokens` (``decode_token``,
    ``main_models.py:117-136``)."""
    offs = jnp.arange(tokens.shape[-1], dtype=tokens.dtype) * kary
    out = tokens - 2 - offs
    return jnp.maximum(out, 0)


def make_labels(codes: jnp.ndarray, kary: int,
                max_output_length: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Codes (b, M) -> (labels (b, L), decoder_input_ids (b, L)).

    labels = [code tokens..., eos, pad]; inputs = shift-right with start 0
    (``vq_label_suffix`` + ``codebook_decode_embedding_process``,
    ``main_models.py:111-114, 1797-1811``).
    """
    b, m = codes.shape
    toks = codes_to_tokens(codes.astype(jnp.int32), kary)
    eos = jnp.ones((b, 1), jnp.int32)
    pad = jnp.zeros((b, 1), jnp.int32)
    labels = jnp.concatenate([toks, eos, pad], axis=1)
    inputs = jnp.concatenate([pad, toks, eos], axis=1)
    assert labels.shape[1] == max_output_length
    return labels, inputs


class NCIT5(nn.Module):
    dims: NCIDims

    def setup(self):
        d = self.dims
        t5 = d.t5
        self.shared = nn.Embed(t5.vocab_size, t5.d_model, name="shared",
                               dtype=t5.dtype)
        self.encoder = T5Stack(t5, t5.num_layers, is_decoder=False,
                               name="encoder")
        self.decode_embeddings = nn.Embed(
            d.decode_vocab_size, t5.d_model, name="decode_embeddings",
            dtype=t5.dtype)
        self.decoder = T5Stack(t5, t5.num_decoder_layers, is_decoder=True,
                               name="decoder")
        if d.use_pawa:
            self.pawa = PawaAdaptor(d.pawa_dims(), name="pawa")
            # kernel of the reference's adaptor_linear: (d_in, d*V);
            # kept as a raw param because it is only ever used via
            # column-sliced einsums, never a full Dense matmul.
            self.adaptor_kernel = self.param(
                "adaptor_kernel",
                nn.initializers.lecun_normal(),
                (t5.d_model, t5.d_model * d.decode_vocab_size))
        if not d.tie_decode_embedding:
            self.untied_head = self.param(
                "untied_head", nn.initializers.normal(1.0),
                (d.decode_vocab_size, t5.d_model))
        if d.reserve_decoder:
            self.ori_decoder = T5Stack(t5, 12, is_decoder=True,
                                       name="ori_decoder")

    # -- encoder ---------------------------------------------------------

    def encode(self, input_ids, attention_mask=None, deterministic=True):
        mask = extend_mask(attention_mask)
        return self.encoder(self.shared(input_ids), self_mask=mask,
                            deterministic=deterministic)

    # -- memory assembly (reserve_decoder 'series' integration,
    #    modeling_t5.py:1518-1536) --------------------------------------

    def build_memory(self, enc_hidden, attention_mask=None,
                     deterministic=True):
        """Returns (memory, memory_mask, ori_dec_hidden)."""
        d = self.dims
        ori_hidden = None
        memory, mem_mask = enc_hidden, attention_mask
        if d.reserve_decoder:
            b = enc_hidden.shape[0]
            zero = jnp.zeros((b, 1), jnp.int32)
            ori_hidden = self.ori_decoder(
                self.shared(zero), self_mask=None, enc_hidden=enc_hidden,
                enc_mask=extend_mask(attention_mask),
                deterministic=deterministic)
            memory = jnp.concatenate([enc_hidden, ori_hidden], axis=1)
            if attention_mask is not None:
                mem_mask = jnp.concatenate(
                    [attention_mask, jnp.ones((b, 1),
                                              attention_mask.dtype)], 1)
        return memory, mem_mask, ori_hidden

    # -- decode-side -----------------------------------------------------

    def _head_matrix(self):
        """Tied LM head (V, d) = decode embedding table."""
        if self.dims.tie_decode_embedding:
            return self.decode_embeddings.embedding
        return self.untied_head

    def _adaptor_tensor(self):
        """Adaptor kernel reshaped (d_in, d_model, V)."""
        d = self.dims
        return self.adaptor_kernel.reshape(
            d.t5.d_model, d.t5.d_model, d.decode_vocab_size)

    def head_level_tables(self):
        """Per-level packed LM-head tables, built once per trace with
        STATIC slices.  Level t's columns are [level-t codes (K), EOS]:

          W_lvl: (L, K+1, d)          tied-head rows
          A_lvl: (L, d_in, d*(K+1))   PAWA weight-delta slabs (or None)

        The in-scan ``dynamic_slice`` over the (d, d, V) adaptor tensor
        plus the 3-operand einsum dominated the decode step (r1 weak #3);
        with the slabs fed to the scan as xs, the PAWA delta becomes one
        MXU matmul ``h_t @ A_t`` per step."""
        d = self.dims
        K, L = d.kary, d.max_output_length
        W = self._head_matrix()
        W_lvl = jnp.stack([
            jnp.concatenate([W[2 + t * K:2 + (t + 1) * K], W[1:2]], 0)
            for t in range(L)])
        A_lvl = None
        if d.use_pawa:
            dm = d.t5.d_model
            A = self._adaptor_tensor()
            A_lvl = jnp.stack([
                jnp.concatenate(
                    [A[:, :, 2 + t * K:2 + (t + 1) * K], A[:, :, 1:2]],
                    -1).reshape(dm, dm * (K + 1))
                for t in range(L)])
        return W_lvl, A_lvl

    def pawa_prefix_tables(self, level_tables=None,
                           max_entries: int = 1 << 17):
        """Per-prefix PAWA tables for the serving beam.

        PAWA's input is ONLY the decode-token embeddings — no encoder
        state — so its hidden at position t is a pure function of the
        code prefix (c0..c_{t-1}).  For every level t with K^t <=
        ``max_entries`` entries (t <= M-2 — the net must still run at
        t = M-1 to seed the EOS step's cache entry), precompute:

          T[t]  (K^t, dm*(K+1)): the logits-delta slab H_t @ A_t — the
                 per-step (rows, dm) x (dm, dm*(K+1)) adaptor matmul
                 becomes a row gather;
          KV[p]: the cache entry the net WOULD have written at
                 position p — a tuple over layers of ``(k, v)``
                 arrays of shape ``(K^p, h, dk)`` (the entry pytree
                 itself, rows-major: a per-leaf row gather IS the
                 entry), so the net can be skipped entirely at early
                 steps and the cache reconstructed by gather before
                 the first live step.

        Plus ``delta0`` (dm*(K+1),) and ``e0`` (the 1-row entry
        pytree) for the universal start-token position.  Costs one K^t-row
        panel run + one (K^t, dm) x (dm, dm*(K+1)) matmul per level,
        once per params (~50 ms at serving config).
        """
        d = self.dims
        assert d.use_pawa
        K, M = d.kary, d.code_len
        dm = d.t5.d_model
        if level_tables is None:
            _, A_lvl = self.head_level_tables()
        else:
            _, A_lvl = level_tables
        # only levels t <= M-2 are skippable (the net must run at
        # t = M-1 to write the cache entry the EOS step attends)
        max_level = 0
        while (max_level < M - 2
               and K ** (max_level + 1) <= max_entries):
            max_level += 1
        t_top = max_level
        if t_top < M - 2:
            # Partial coverage is semantically broken in the beam: at a
            # live step t > t_top, rebuild_pawa needs KV[p] for every
            # p < t (uncovered positions would KeyError), and only the
            # LAST live entry is kept across steps, so intermediate live
            # positions are lost even with the tables present.  All-or-
            # nothing: callers fall back to the plain (net-every-step)
            # path, which is exact.
            raise ValueError(
                f"pawa_prefix_tables: kary^{M - 2} = {K ** (M - 2)} "
                f"exceeds max_entries={max_entries}; partial prefix "
                "tables are unsupported — use the plain beam path "
                "(pawa_tables=None)")
        # all K^t_top prefixes: tokens [start, tok0(c0), ..].  Lower
        # levels reuse this panel (their rows are the c_rest = 0 slice).
        n = K ** t_top
        idx = jnp.arange(n, dtype=jnp.int32)
        if t_top:
            codes = jnp.stack(
                [(idx // (K ** (t_top - 1 - lvl))) % K
                 for lvl in range(t_top)], axis=1)         # (n, t_top)
            toks = codes_to_tokens(codes, K)
        else:
            toks = jnp.zeros((n, 0), jnp.int32)
        seqs = jnp.concatenate(
            [jnp.zeros((n, 1), jnp.int32), toks], axis=1)  # (n, t_top+1)
        h_all, kvs = self.pawa.panel_with_kvs(
            self.decode_embeddings(seqs))
        # (num_layers, 2, n, l, h, dk) -> per position p tables
        nl = kvs.shape[0]
        out = {"T": {}, "KV": {}}
        for t in range(1, t_top + 1):
            rows = (jnp.arange(K ** t) * (K ** (t_top - t))
                    if t < t_top else None)
            H_t = h_all[:, t] if rows is None else h_all[rows, t]
            out["T"][t] = (H_t @ A_lvl[t]) if A_lvl is not None else None
            # entry pytree: tuple over layers of (k, v), each (K^t, h, dk)
            out["KV"][t] = tuple(
                (kvs[i, 0, :, t] if rows is None else kvs[i, 0, rows, t],
                 kvs[i, 1, :, t] if rows is None else kvs[i, 1, rows, t])
                for i in range(nl))
        out["delta0"] = (h_all[:1, 0] @ A_lvl[0])[0] \
            if A_lvl is not None else None
        out["e0"] = tuple((kvs[i, 0, :1, 0], kvs[i, 1, :1, 0])
                          for i in range(nl))     # 1-row entry pytree
        return out

    def project_cross_kvs(self, memory):
        """Per-layer decoder cross-attention (k, v), computed once per
        query and reused across decode steps/beams (the reference
        re-projects every step — ``use_cache=False``)."""
        return self.decoder.project_cross_kvs(memory)

    def compact_logits(self, decoder_input_ids, memory, memory_mask=None,
                       cross_kvs=None, deterministic=True,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Compact logits (b, L, kary+1) + decoder hidden (b, L, d).

        Column layout per position t: [codes of level t (kary), EOS].
        ``cross_kvs``: optional precomputed per-layer (k, v) heads.
        """
        d = self.dims
        K = d.kary
        L = decoder_input_ids.shape[1]
        dec_embeds = self.decode_embeddings(decoder_input_ids)
        dec_hidden = self.decoder(
            dec_embeds, self_mask=causal_mask(L),
            enc_hidden=memory, enc_mask=extend_mask(memory_mask),
            cross_kvs=cross_kvs, deterministic=deterministic)
        seq = dec_hidden * (d.t5.d_model ** -0.5)     # modeling_t5.py:1607

        W_lvl, A_lvl = self.head_level_tables()
        logits = jnp.einsum("bld,lkd->blk", seq, W_lvl)   # (b, L, K+1)
        if d.use_pawa:
            h_a = self.pawa(dec_embeds, deterministic=deterministic)
            dm = d.t5.d_model
            b = seq.shape[0]
            # per-level delta-weight matmul, then contract with seq
            tmp = jnp.einsum("bli,lix->blx", h_a, A_lvl)
            logits = logits + jnp.einsum(
                "bldk,bld->blk", tmp.reshape(b, L, dm, K + 1), seq)
        # final position (t = L-1) only allows EOS (modeling_t5.py:1306)
        last = jnp.full((K + 1,), 0.0).at[:K].set(NEG)
        pos_mask = jnp.zeros((L, K + 1)).at[L - 1].set(last)
        return logits + pos_mask[None], dec_hidden

    def compact_logits_at(self, decoder_input_ids, t, memory,
                          memory_mask=None, cross_kvs=None,
                          deterministic=True, level_tables=None,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Compact logits for a single position ``t`` (traced scalar).

        The decode-loop hot path: the PAWA weight-delta matmul and the
        head slice run for ONE position instead of all L — in the beam
        search only step t's logits are consumed, and the PAWA delta is
        the dominant FLOP term (d_model^2 x (kary+1) per position).
        ``level_tables``: optional per-step (W_t (K+1, d),
        A_t (d_in, d*(K+1))) from :meth:`head_level_tables` — pass them
        through the scan's xs so the table build is not in the loop body.
        Returns (logits (b, kary+1), dec_hidden (b, L, d)).
        """
        d = self.dims
        K = d.kary
        L = decoder_input_ids.shape[1]
        dec_embeds = self.decode_embeddings(decoder_input_ids)
        dec_hidden = self.decoder(
            dec_embeds, self_mask=causal_mask(L),
            enc_hidden=memory, enc_mask=extend_mask(memory_mask),
            cross_kvs=cross_kvs, deterministic=deterministic)
        seq_t = jax.lax.dynamic_index_in_dim(
            dec_hidden, t, axis=1, keepdims=False) * (d.t5.d_model ** -0.5)
        h_t = None
        if d.use_pawa:
            h_a = self.pawa(dec_embeds, deterministic=deterministic)
            h_t = jax.lax.dynamic_index_in_dim(h_a, t, axis=1,
                                               keepdims=False)
        logits = self._level_logits(seq_t, h_t, t, level_tables)
        # final position only allows EOS
        last = jnp.where(jnp.equal(t, L - 1),
                         jnp.concatenate([jnp.full((K,), NEG),
                                          jnp.zeros((1,))]),
                         jnp.zeros((K + 1,)))
        return logits + last[None], dec_hidden

    def _level_logits(self, seq_t, h_t, t, level_tables=None):
        """[codes, EOS] logits for one position: seq_t (b, d), h_t (b, d)
        or None; t traced.  The PAWA delta is ``(h_t @ A_t)`` — one
        (b, d) x (d, d*(K+1)) MXU matmul — contracted with seq_t."""
        d = self.dims
        K = d.kary
        dm = d.t5.d_model
        if level_tables is not None:
            W_t, A_t = level_tables
        else:
            W_lvl, A_lvl = self.head_level_tables()
            W_t = jax.lax.dynamic_index_in_dim(W_lvl, t, 0, False)
            A_t = (None if A_lvl is None else
                   jax.lax.dynamic_index_in_dim(A_lvl, t, 0, False))
        logits = seq_t @ W_t.T                        # (b, K+1)
        if h_t is not None and A_t is not None:
            tmp = (h_t @ A_t).reshape(-1, dm, K + 1)
            logits = logits + jnp.einsum("bdk,bd->bk", tmp, seq_t)
        return logits

    # -- incremental decoding (KV caches; the serving hot path) ----------

    def init_decode_state(self, batch: int, dtype=None):
        """(decoder cache, pawa cache, pawa memory k/v) for a beam batch."""
        d = self.dims
        L = d.max_output_length
        dec_cache = self.decoder.init_cache(batch, L, dtype)
        pawa_cache = None
        pawa_mem = None
        if d.use_pawa:
            pawa_cache = self.pawa.init_cache(batch, L, dtype)
            pawa_mem = self.pawa.precompute_mem_kvs(batch, dtype)
        return dec_cache, pawa_cache, pawa_mem

    def decode_logits_step(self, tok_t, t, dec_cache, pawa_cache,
                           cross_kvs, pawa_mem, memory_mask=None,
                           beams: int = 1, level_tables=None):
        """Single-token decode: tok_t (b, 1) int32 at position t.

        Computes only position t through the decoder and PAWA via KV
        caches (the panel path recomputes all L positions per step).
        With ``beams > 1``, ``cross_kvs``/``memory_mask`` are per-QUERY
        (b // beams rows) and shared across each query's beams.
        ``level_tables``: optional per-step (W_t, A_t) slices of
        :meth:`head_level_tables` (feed through the scan's xs).
        Returns (compact logits (b, kary+1), dec_cache, pawa_cache).
        """
        d = self.dims
        K = d.kary
        L = d.max_output_length
        embed_t = self.decode_embeddings(tok_t)
        hidden_t, dec_cache = self.decoder.decode_step(
            embed_t, t, dec_cache, cross_kvs, extend_mask(memory_mask),
            beams=beams)
        seq_t = hidden_t[:, 0, :] * (d.t5.d_model ** -0.5)
        h_t = None
        if d.use_pawa:
            h_t, pawa_cache = self.pawa.decode_step(
                embed_t, t, pawa_cache, pawa_mem)
            h_t = h_t[:, 0, :]
        logits = self._level_logits(seq_t, h_t, t, level_tables)
        last = jnp.where(jnp.equal(t, L - 1),
                         jnp.concatenate([jnp.full((K,), NEG),
                                          jnp.zeros((1,))]),
                         jnp.zeros((K + 1,)))
        return logits + last[None], dec_cache, pawa_cache

    def decode_logits_step_unrolled(self, tok_t, t: int, dec_entries,
                                    pawa_entries, cross_kvs,
                                    memory_mask=None, beams: int = 1,
                                    level_tables=None,
                                    delta_slab=None):
        """Statically-unrolled single-token decode (python-int ``t``).

        Caches are per-position entry LISTS (see
        ``T5Stack.decode_step_unrolled``) — only live positions are
        stored, attended and beam-reordered.  ``delta_slab``: optional
        precomputed PAWA logits-delta rows — (b, dm*(K+1)) gathered
        from :meth:`pawa_prefix_tables`, or (dm*(K+1),) for the
        universal position 0; when given, the PAWA net and its
        (rows, dm) x (dm, dm*(K+1)) matmul are skipped for this step.
        Returns (compact logits (b, kary+1), new dec entry, new pawa
        entry (or None)).
        """
        d = self.dims
        K = d.kary
        L = d.max_output_length
        dm = d.t5.d_model
        embed_t = self.decode_embeddings(tok_t)
        hidden_t, dec_e = self.decoder.decode_step_unrolled(
            embed_t, t, dec_entries, cross_kvs, extend_mask(memory_mask),
            beams=beams)
        seq_t = hidden_t[:, 0, :] * (d.t5.d_model ** -0.5)
        h_t, pawa_e = None, None
        if d.use_pawa and delta_slab is None:
            h_t, pawa_e = self.pawa.decode_step_unrolled(
                embed_t, t, pawa_entries)
            h_t = h_t[:, 0, :]
        logits = self._level_logits(seq_t, h_t, jnp.int32(t),
                                    level_tables)
        if delta_slab is not None:
            if delta_slab.ndim == 1:       # universal start position
                logits = logits + seq_t @ delta_slab.reshape(dm, K + 1) \
                    .astype(seq_t.dtype)
            else:
                tmp = delta_slab.reshape(-1, dm, K + 1).astype(seq_t.dtype)
                logits = logits + jnp.einsum("bdk,bd->bk", tmp, seq_t)
        if t == L - 1:         # static: final position only allows EOS
            logits = logits + jnp.concatenate(
                [jnp.full((K,), NEG), jnp.zeros((1,))])[None]
        return logits, dec_e, pawa_e

    def __call__(self, input_ids, attention_mask, decoder_input_ids,
                 deterministic=True):
        """Returns (compact_logits, enc_hidden, dec_hidden, ori_hidden)."""
        enc_hidden = self.encode(input_ids, attention_mask, deterministic)
        memory, mem_mask, ori_hidden = self.build_memory(
            enc_hidden, attention_mask, deterministic)
        logits, dec_hidden = self.compact_logits(
            decoder_input_ids, memory, mem_mask,
            deterministic=deterministic)
        return logits, enc_hidden, dec_hidden, ori_hidden


def compact_to_full_logits(compact: jnp.ndarray, dims: NCIDims,
                           fill: float = NEG) -> jnp.ndarray:
    """Expand (b, L, kary+1) compact logits to the reference's full-vocab
    masked layout (b, L, V) for parity checks."""
    b, L, _ = compact.shape
    K = dims.kary
    V = dims.decode_vocab_size
    full = jnp.full((b, L, V), fill, compact.dtype)
    for t in range(L):
        full = full.at[:, t, 2 + t * K: 2 + (t + 1) * K].set(
            compact[:, t, :K])
    full = full.at[:, :, 1].set(compact[:, :, K])
    return full


def compact_labels(codes: jnp.ndarray, dims: NCIDims) -> jnp.ndarray:
    """Labels in compact-column space: (b, L) ints where position t<M is
    the code (column index), position M is kary (EOS column), and
    position M+1 is -100 (ignored — the padded slot)."""
    b, m = codes.shape
    eos_col = jnp.full((b, 1), dims.kary, jnp.int32)
    pad = jnp.full((b, 1), -100, jnp.int32)
    return jnp.concatenate([codes.astype(jnp.int32), eos_col, pad], axis=1)
