"""Joint NCI + codebook + twin-tower training (the --codebook mode).

Rebuilds the reference's joint forward (``main_models.py:2197-2584``,
``--codebook 1 --pq_runtime_label 1``):

1. embed the positive passages with the (possibly frozen) document tower,
2. assign runtime RQ labels + per-level codebook logits
   (``pq(p_reps)``, ``main_models.py:2314``),
3. NCI forward on those labels; compact slice logits = ``nci_logits``,
4. PQ distillation loss between NCI and codebook logits
   (replaces the CE loss when ``pq_loss != 'label'`` and the codebook is
   trainable — ``main_models.py:2422-2444``),
5. twin co-loss on (query, positive + sampled in-cluster negatives)
   (``main_models.py:2528-2560``),
6. optional codebook reconstruction loss
   (``reconstruct_for_embeddings``, ``main_models.py:2562-2577``).

Loss = nci(+distill) + co + centroid_scale * reconstruction, with
per-part freezing via optimizer labels (fixnci/fixpq/fixdocenc).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import twin_tower as tt
from ..models.nci import NCIT5, compact_labels, make_labels
from ..ops import rq as rq_ops
from . import losses as L
from .trainer import TrainState


@dataclasses.dataclass(frozen=True)
class JointStepConfig:
    pq_loss: str = "ce"            # 'label' = plain CE on runtime labels
    pq_softmax_tau: float = 1.0
    pq_negative: str = "none"
    centroid_update_loss: str = "none"   # 'none' | 'reconstruct'
    centroid_loss_scale: float = 1.0
    no_nci_loss: bool = False
    no_twin_loss: bool = False
    dist_mode: str = "l2"
    rdrop: float = 0.0
    # False (``--pq_runtime_label 0``): NCI labels come from the batch's
    # precomputed 'codes' instead of the live tower+codebook assignment
    runtime_label: bool = True


class JointParams(dict):
    """{'nci': ..., 'tower': ..., 'codebooks': (M, K, d)}"""


def joint_param_labels(params, fixnci: bool = False, fixpq: bool = False,
                       fixdocenc: bool = False) -> Any:
    """Optimizer label tree; the ``fix*`` switches route whole parts to
    the 'frozen' (set_to_zero) transform — the reference freezes via
    ``requires_grad=False`` per part (``fixnci/fixpq/fixdocenc``,
    ``main_models.py:1594-1641``)."""
    from .trainer import _path_str

    def label(path, _):
        parts = _path_str(path).split("/")
        if parts[0] == "codebooks":
            return "frozen" if fixpq else "docenc"   # codebook LR group
        if parts[0] == "tower":
            return "frozen" if fixdocenc else "docenc"
        if fixnci:
            return "frozen"
        top = parts[1] if len(parts) > 1 else parts[0]
        return "encoder" if top in ("shared", "encoder") else "decoder"
    return jax.tree_util.tree_map_with_path(label, params)


def joint_loss_fn(nci_model: NCIT5, tower_rep: Callable,
                  params: Dict, batch: Dict, rng,
                  cfg: JointStepConfig) -> Tuple[jnp.ndarray, Dict]:
    """batch: query_ids/mask (b, Lq); pos_doc_ids/mask (b, Ld);
    neg_doc_ids/mask (b, n_neg, Ld) in-cluster negatives."""
    dims = nci_model.dims
    kary, M = dims.kary, dims.code_len
    codebooks = params["codebooks"]

    # 1-2) RQ labels + codebook logits (logits always from the live
    # reps — distillation targets track the current tower)
    p_reps = tower_rep(params["tower"], batch["pos_doc_ids"],
                       batch["pos_doc_mask"])
    codes, pq_logits = rq_ops.assign_with_logits(
        p_reps, codebooks, "rq", cfg.dist_mode)
    if not cfg.runtime_label and "codes" in batch:
        codes = batch["codes"]
    codes = jax.lax.stop_gradient(codes)

    # 3) NCI forward
    _, dec_in = make_labels(codes, kary, dims.max_output_length)
    labels = compact_labels(codes, dims)
    kwargs = {}
    if rng is not None:
        kwargs = {"rngs": {"dropout": rng}}
    compact, enc_h, dec_h, _ = nci_model.apply(
        {"params": params["nci"]}, batch["query_ids"],
        batch["query_mask"], dec_in, deterministic=rng is None, **kwargs)
    nci_logits = compact[:, :M, :kary]          # per-level slice

    metrics = {}
    # 4) NCI loss: CE on labels, or distillation vs codebook logits
    if cfg.pq_loss == "label":
        nci_loss = L.nci_ce_loss(compact, labels)
    else:
        nci_loss = L.pq_distill_loss(
            nci_logits, pq_logits, cfg.pq_loss, cfg.pq_softmax_tau,
            cfg.pq_negative)
    metrics["nci_loss"] = nci_loss

    # 5) twin co-loss with in-cluster negatives (positive at slot 0)
    co_loss = 0.0
    if not cfg.no_twin_loss and "neg_doc_ids" in batch:
        b, n_neg, Ld = batch["neg_doc_ids"].shape
        n_reps = tower_rep(params["tower"],
                           batch["neg_doc_ids"].reshape(-1, Ld),
                           batch["neg_doc_mask"].reshape(-1, Ld))
        groups = jnp.concatenate(
            [p_reps[:, None, :], n_reps.reshape(b, n_neg, -1)], axis=1)
        q_reps = tower_rep(params["tower"], batch["query_ids"],
                           batch["query_mask"])
        co_loss = tt.grouped_contrastive_loss(q_reps, groups)
        metrics["co_loss"] = co_loss

    # 6) codebook reconstruction
    centroid_loss = 0.0
    if cfg.centroid_update_loss == "reconstruct":
        centroid_loss = L.rq_reconstruction_loss(
            jax.lax.stop_gradient(p_reps), codes, codebooks)
        metrics["centroid_update_loss"] = centroid_loss

    loss = (0.0 if cfg.no_nci_loss else nci_loss) + co_loss \
        + cfg.centroid_loss_scale * centroid_loss
    metrics["loss"] = loss
    return loss, metrics


def make_joint_train_step(nci_model: NCIT5, tower_rep: Callable,
                          optimizer, cfg: JointStepConfig,
                          donate: bool = False):
    def step(state: TrainState, batch, rng):
        def lf(p):
            return joint_loss_fn(nci_model, tower_rep, p, batch, rng, cfg)
        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_joint_train_step_ema(nci_model: NCIT5, tower_rep: Callable,
                              optimizer, cfg: JointStepConfig,
                              decay: float = 0.99):
    """Variant with EMA codebook updates (``--pq_update_method ema``,
    ``pq.py:371-433``): gradients never touch the codebooks (label them
    'frozen' in the optimizer); each step re-embeds the positives,
    assigns codes, and EMA-averages cluster statistics with dead-code
    restart.  Returns step(state, ema_state, batch, rng) ->
    (state, ema_state, metrics)."""

    def step(state: TrainState, ema_state: rq_ops.EMAState, batch, rng):
        def lf(p):
            return joint_loss_fn(nci_model, tower_rep, p, batch, rng, cfg)
        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA codebook step on the fresh tower's positives
        p_reps = tower_rep(params["tower"], batch["pos_doc_ids"],
                           batch["pos_doc_mask"])
        codebooks = params["codebooks"]
        codes = rq_ops.assign(p_reps, codebooks, "rq", cfg.dist_mode)
        key = rng if rng is not None else jax.random.PRNGKey(0)
        ema_state, new_cbs = rq_ops.ema_update(
            ema_state, codebooks, p_reps, codes, key, decay=decay)
        params = dict(params)
        params["codebooks"] = new_cbs
        return (TrainState(params, opt_state, state.step + 1),
                ema_state, metrics)

    return jax.jit(step)
