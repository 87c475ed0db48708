"""Twin-tower dense encoder (the reference's DocumentEncoder,
``MEVI/document_encoder.py``).

* T5 family (T5-ANCE): representation = decoder token-0 hidden state with
  a single zero decoder input (``document_encoder.py:108-117``),
* BERT family (coCondenser / AR2-ERNIE): CLS hidden state,
* in-batch-negative contrastive loss with the reference's target layout
  (``document_encoder.py:78-92``): with p_reps grouped per query
  (1 positive + n negatives), ``target_i = i * (n_p // n_q)``,
* cross-device negatives via ``all_gather`` over the mesh data axis
  (replaces ``dist_gather_tensor``, ``document_encoder.py:200-211``).

This module is functional: towers are (apply_fn, params) pairs so the
query/passage towers can be tied or separate, frozen or trainable.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .bert import BertDims, BertEncoderModel
from .t5 import T5Dims, T5Model


class Tower(NamedTuple):
    family: str          # 't5' | 'bert'
    module: Any          # flax module
    params: Any          # flax params pytree (or None when caller passes)

    def rep(self, params, input_ids, attention_mask,
            token_type_ids=None, deterministic=True) -> jnp.ndarray:
        if self.family == "t5":
            return self.module.apply(
                {"params": params}, input_ids, attention_mask,
                deterministic=deterministic,
                method=T5Model.first_token_rep)
        return self.module.apply(
            {"params": params}, input_ids, attention_mask, token_type_ids,
            deterministic=deterministic,
            method=BertEncoderModel.cls_rep)


def make_tower(family: str, dims=None) -> Tower:
    if family == "t5":
        dims = dims or T5Dims(num_decoder_layers=12)  # t5-ance: full dec
        return Tower("t5", T5Model(dims), None)
    dims = dims or BertDims()
    return Tower("bert", BertEncoderModel(dims), None)


def tower_from_config(enc_cfg) -> Tower:
    """Tower built from an :class:`mevi_tpu.config.EncoderConfig`."""
    if enc_cfg.family == "t5":
        dtype = (jnp.bfloat16 if getattr(enc_cfg, "dtype", "float32")
                 == "bfloat16" else jnp.float32)
        dims = T5Dims(
            d_model=enc_cfg.d_model, num_layers=enc_cfg.num_layers,
            # T5-ANCE is a full t5-base: decoder depth == encoder depth
            num_decoder_layers=enc_cfg.num_layers,
            num_heads=enc_cfg.num_heads,
            d_kv=enc_cfg.d_model // enc_cfg.num_heads,
            d_ff=enc_cfg.d_ff,
            vocab_size=getattr(enc_cfg, "t5_vocab_size", 32128),
            dropout_rate=0.0, dtype=dtype)
        return Tower("t5", T5Model(dims), None)
    dims = BertDims(
        vocab_size=enc_cfg.vocab_size, d_model=enc_cfg.d_model,
        num_layers=enc_cfg.num_layers, num_heads=enc_cfg.num_heads,
        d_ff=enc_cfg.d_ff,
        max_position_embeddings=enc_cfg.max_position_embeddings,
        type_vocab_size=enc_cfg.type_vocab_size, dropout_rate=0.0)
    return Tower("bert", BertEncoderModel(dims), None)


def similarity(q_reps: jnp.ndarray, p_reps: jnp.ndarray,
               bmm: bool = False) -> jnp.ndarray:
    """``compute_similarity`` (``document_encoder.py:128-132``)."""
    if bmm:
        return jnp.sum(q_reps * p_reps, axis=-1)
    precision = (jax.lax.Precision.HIGHEST
                 if q_reps.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        q_reps, p_reps, (((q_reps.ndim - 1,), (p_reps.ndim - 1,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)


def contrastive_loss(q_reps: jnp.ndarray, p_reps: jnp.ndarray,
                     axis_name: Optional[str] = None,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-batch-negative CE loss.

    p_reps rows are grouped per query: [q0_pos, q0_neg..., q1_pos, ...].
    Matches ``DocumentEncoder.forward`` with negatives_x_sample
    (``document_encoder.py:78-92``).  With ``axis_name``, reps are
    all-gathered across that mesh axis first (negatives_x_device,
    ``document_encoder.py:74-76``).
    Returns (loss, scores).
    """
    if axis_name is not None:
        q_reps = jax.lax.all_gather(q_reps, axis_name, tiled=True)
        p_reps = jax.lax.all_gather(p_reps, axis_name, tiled=True)
    scores = similarity(q_reps, p_reps)
    nq = q_reps.shape[0]
    group = p_reps.shape[0] // nq
    targets = jnp.arange(nq) * group
    logprobs = jax.nn.log_softmax(scores, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(
        logprobs, targets[:, None], axis=1))
    return loss, scores


def grouped_contrastive_loss(q_reps: jnp.ndarray,
                             p_reps: jnp.ndarray) -> jnp.ndarray:
    """Per-query candidate groups: q (nq, d), p (nq, g, d), positive at
    slot 0 (the negatives_x_sample=False branch,
    ``document_encoder.py:86-92`` and the in-cluster hard-negative loss at
    ``main_models.py:2500-2519``)."""
    scores = jnp.einsum("qd,qgd->qg", q_reps.astype(jnp.float32),
                        p_reps.astype(jnp.float32))
    logprobs = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(logprobs[:, 0])
