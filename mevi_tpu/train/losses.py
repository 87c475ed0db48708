"""Training losses.

Everything operates on the NCI model's *compact* logits
(batch, L, kary+1); see :mod:`mevi_tpu.models.nci`.  Reference:

* NCI cross-entropy over code tokens + EOS with -100 ignore
  (``modeling_t5.py:1435,1758``),
* R-drop family (``modeling_t5.py:1703-1752``): two stochastic forwards
  of the same batch; 'KL' symmetric KL on logits, 'L2' on probs,
  'Contrast' in-batch contrastive over decoder hidden states,
* PQ distillation family (``main_models.py:2050-2138``): per-level NCI
  logits vs codebook similarity logits — 'ce' (reference headline:
  ``marco_eval_nci_rq.sh:17``), 'kl', 'mse', 'dot', 'cosine', plus the
  sample/batch-negative contrastive and margin variants,
* RQ reconstruction loss over per-level residual stacks
  (``pq.py:743-766``),
* twin-tower co-loss lives in :mod:`mevi_tpu.models.twin_tower`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def nci_ce_loss(compact_logits: jnp.ndarray,
                compact_labels: jnp.ndarray,
                loss_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean CE over valid positions; labels use -100 for ignore.

    ``loss_weight``: optional per-position weights (the reference's
    --loss_weight ramp, ``main_models.py:2393-2398``); normalized by the
    count of valid positions as in the reference (sum/num_valid).
    """
    valid = compact_labels >= 0
    labels = jnp.maximum(compact_labels, 0)
    logp = jax.nn.log_softmax(compact_logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    nll = -picked * valid
    if loss_weight is not None:
        nll = nll * loss_weight
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


# --------------------------------------------------------------------------
# R-drop
# --------------------------------------------------------------------------

def rdrop_kl(logits_a: jnp.ndarray, logits_b: jnp.ndarray) -> jnp.ndarray:
    """Symmetric KL summed over tokens / seq-len (``modeling_t5.py:
    1730-1735``: p_loss.sum()/2/sl convention)."""
    sl = logits_a.shape[1]
    la = jax.nn.log_softmax(logits_a.astype(jnp.float32), -1)
    lb = jax.nn.log_softmax(logits_b.astype(jnp.float32), -1)
    pa, pb = jnp.exp(la), jnp.exp(lb)
    p_loss = jnp.sum(pb * (lb - la))
    q_loss = jnp.sum(pa * (la - lb))
    return (p_loss + q_loss) / 2.0 / sl


def rdrop_l2(logits_a: jnp.ndarray, logits_b: jnp.ndarray) -> jnp.ndarray:
    pa = jax.nn.softmax(logits_a.astype(jnp.float32), -1)
    pb = jax.nn.softmax(logits_b.astype(jnp.float32), -1)
    return jnp.mean((pa - pb) ** 2)


def rdrop_contrast(dec_hidden_a: jnp.ndarray,
                   dec_hidden_b: jnp.ndarray) -> jnp.ndarray:
    """'Contrast' R-drop (``modeling_t5.py:1736-1746``): per position,
    in-batch contrastive between the two stochastic decoder states, with
    the diagonal masked and target = the twin copy's row."""
    seq = jnp.concatenate([dec_hidden_a, dec_hidden_b], axis=0)
    bz = seq.shape[0]
    half = bz // 2
    neg1 = jnp.transpose(seq, (1, 0, 2)).astype(jnp.float32)  # (sl, bz, d)
    logits = jnp.einsum("sbd,scd->sbc", neg1, neg1)
    eye = jnp.eye(bz) * -1e9
    logits = logits + eye[None]
    # the reference applies softmax then CE-with-logits — i.e. a double
    # softmax (main_models clone at modeling_t5.py:1742-1746). Reproduced.
    probs = jax.nn.softmax(logits, axis=-1)
    targets = jnp.concatenate([jnp.arange(half, bz), jnp.arange(0, half)])
    logp = jax.nn.log_softmax(probs, axis=-1)
    picked = logp[:, jnp.arange(bz), targets]
    return -jnp.mean(picked)


# --------------------------------------------------------------------------
# PQ distillation (main_models.py:2050-2138)
# --------------------------------------------------------------------------

def soft_assign(logits: jnp.ndarray, tau: float = 1.0,
                hard_topk: int = 0) -> jnp.ndarray:
    """``get_softmax`` (``main_models.py:2147-2160``) without gumbel noise
    (use_gumbel_softmax=0 in the headline configs): softmax with
    temperature + optional straight-through hard top-k."""
    assign = jax.nn.softmax(logits.astype(jnp.float32) / tau, axis=-1)
    if hard_topk > 0:
        _, idx = jax.lax.top_k(assign, hard_topk)
        hard = jnp.sum(jax.nn.one_hot(idx, assign.shape[-1]), axis=-2)
        hard = hard / hard_topk
        assign = jax.lax.stop_gradient(hard - assign) + assign
    return assign


def pq_distill_loss(nci_logits: jnp.ndarray, pq_logits: jnp.ndarray,
                    kind: str = "ce", tau: float = 1.0,
                    negative: str = "none", negative_loss: str = "cont",
                    margin: float = 1.0,
                    hard_topk: int = 0) -> jnp.ndarray:
    """Distill the codebook-similarity distribution into/from NCI logits.

    nci_logits: (b, M, K); pq_logits: (b or b*g, M, K) — with
    ``negative='sample'`` pq rows are grouped per query (positive first),
    with 'batch' all rows are shared negatives.  'none' compares
    positives elementwise.  Matches ``compute_pq_loss``.
    """
    b = nci_logits.shape[0]
    if kind == "ce":
        # -stopgrad(softmax(nci/tau)) · log_softmax(pq/tau)
        nci_sm = jax.lax.stop_gradient(soft_assign(nci_logits, tau,
                                                   hard_topk))
        def pair_loss(nci_sm, pq):
            pq_lsm = jax.nn.log_softmax(pq.astype(jnp.float32) / tau, -1)
            return jnp.sum(-nci_sm * pq_lsm, axis=-1)      # (..., M)
    else:
        nci_sm = soft_assign(nci_logits, tau, hard_topk)
        def pair_loss(nci_a, pq):
            pq_a = soft_assign(pq, tau, hard_topk)
            if kind == "kl":
                l = (jax.scipy.special.rel_entr(pq_a, nci_a + 1e-12)
                     + jax.scipy.special.rel_entr(nci_a, pq_a + 1e-12)) / 2
            elif kind == "mse":
                l = (pq_a - nci_a) ** 2
            elif kind == "dot":
                l = -pq_a * nci_a
            elif kind == "cosine":
                pa = pq_a / jnp.linalg.norm(pq_a, axis=-1, keepdims=True)
                na = nci_a / jnp.linalg.norm(nci_a, axis=-1, keepdims=True)
                l = -pa * na
            else:
                raise ValueError(kind)
            return jnp.sum(l, axis=-1)

    if negative == "none":
        pq_pos = pq_logits.reshape(b, -1, *pq_logits.shape[1:])[:, 0]
        return jnp.mean(pair_loss(nci_sm, pq_pos))

    # grouped variants: (b, g, M, K) pairs
    if negative == "sample":
        pq = pq_logits.reshape(b, -1, *pq_logits.shape[1:])
        targets = jnp.zeros((b,), jnp.int32)
    else:  # 'batch': every row vs all rows
        pq = jnp.broadcast_to(pq_logits[None],
                              (b,) + pq_logits.shape)
        group = pq_logits.shape[0] // b
        targets = jnp.arange(b) * group
    per = jnp.mean(pair_loss(nci_sm[:, None], pq), axis=-1)  # (b, g)
    if negative_loss == "cont":
        # smaller distillation distance should win: CE over -distance
        logp = jax.nn.log_softmax(-per, axis=-1)
        return -jnp.mean(jnp.take_along_axis(
            logp, targets[:, None], 1))
    pos = jnp.take_along_axis(per, targets[:, None], 1)
    neg = (jnp.sum(per, -1, keepdims=True) - pos) / (per.shape[1] - 1)
    return jnp.mean(pos - jnp.minimum(neg, margin) + margin)


def rq_reconstruction_loss(emb: jnp.ndarray, codes: jnp.ndarray,
                           codebooks: jnp.ndarray) -> jnp.ndarray:
    """Stacked per-level residual MSE (``pq.py:743-766`` rq branch):
    level i's residual is emb - sum(centroids up to i)."""
    M = codebooks.shape[0]
    picked = jax.vmap(lambda cb, c: cb[c], in_axes=(0, 1), out_axes=1)(
        codebooks, codes)                                # (n, M, d)
    cums = jnp.cumsum(picked, axis=1)
    diffs = emb[:, None, :].astype(jnp.float32) - cums.astype(jnp.float32)
    return jnp.mean(diffs ** 2)
