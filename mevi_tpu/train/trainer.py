"""Training harness: optax optimizer groups, jitted data-parallel steps.

Reference: ``configure_optimizers`` (``main_models.py:3373-3486``) builds
AdamW with per-part learning rates — encoder+shared at ``learning_rate``,
everything decode-side at ``decoder_learning_rate``, the twin tower at
``document_encoder_learning_rate`` (no weight decay), codebook at the
doc-encoder LR — with no decay on biases/LayerNorms and a linear
warmup+decay schedule.  Rebuilt as ``optax.multi_transform`` over param
labels, one jit program over a batch-sharded mesh (grads reduced by XLA;
replaces PL-DDP).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..models.nci import NCIT5, compact_labels, make_labels
from . import losses as L


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


# --------------------------------------------------------------------------
# optimizer
# --------------------------------------------------------------------------

def _path_str(path) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def nci_param_labels(params) -> Any:
    """'encoder' vs 'decoder' LR groups (main_models.py:3401-3426):
    shared+encoder at the encoder LR, everything else decode-side."""
    def label(path, _):
        top = _path_str(path).split("/")[0]
        return "encoder" if top in ("shared", "encoder") else "decoder"
    return jax.tree_util.tree_map_with_path(label, params)


def no_decay_mask(params) -> Any:
    """True where weight decay applies (reference no_decay = bias +
    LayerNorm weights; RMSNorm/LayerNorm params and biases excluded)."""
    def check(path, _):
        p = _path_str(path).lower()
        leaf = p.split("/")[-1]
        is_norm = "norm" in p and leaf in ("weight", "scale", "bias")
        return not (is_norm or leaf == "bias")
    return jax.tree_util.tree_map_with_path(check, params)


def linear_warmup_decay(lr: float, warmup_steps: int,
                        total_steps: int) -> optax.Schedule:
    """HF get_linear_schedule_with_warmup."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(warmup_steps, 1)
        up = step / warm
        down = jnp.maximum(total_steps - step, 0.0) / jnp.maximum(
            total_steps - warmup_steps, 1)
        return lr * jnp.where(step < warmup_steps, up, down)
    return schedule


def make_optimizer(cfg: TrainConfig, params, total_steps: int,
                   labels: Optional[Any] = None) -> optax.GradientTransformation:
    """AdamW groups with per-label LRs + global-norm clip."""
    if labels is None:
        labels = nci_param_labels(params)

    def adamw(lr, wd):
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(
                learning_rate=linear_warmup_decay(lr, cfg.warmup_steps,
                                                  total_steps),
                eps=cfg.adam_epsilon, weight_decay=wd,
                # path-based mask recomputed on whatever (possibly
                # label-masked) subtree this transform sees
                mask=no_decay_mask),
        )

    transforms = {
        "encoder": adamw(cfg.learning_rate, cfg.weight_decay),
        "decoder": adamw(cfg.decoder_learning_rate, cfg.weight_decay),
        "docenc": adamw(cfg.docenc_learning_rate, 0.0),
        "frozen": optax.set_to_zero(),
    }
    opt = optax.multi_transform(transforms, labels)
    if cfg.gradient_accumulation > 1:
        # reference derives accumulation as max(8/ngpu, 1)
        # (main.py:739-740); here an explicit config knob applied as
        # optax.MultiSteps — updates fire every k-th microbatch
        opt = optax.MultiSteps(opt, every_k_schedule=int(
            cfg.gradient_accumulation))
    return opt


def init_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params),
                      jnp.zeros((), jnp.int32))


# --------------------------------------------------------------------------
# NCI training step (headline config: CE on code labels, optional R-drop)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NCIStepConfig:
    rdrop: float = 0.0
    rdrop_loss: str = "Contrast"


def nci_loss_fn(model: NCIT5, params, batch, rng,
                step_cfg: NCIStepConfig) -> Tuple[jnp.ndarray, Dict]:
    """batch: query_ids (b, Lq), query_mask, codes (b, M)."""
    dims = model.dims
    codes = batch["codes"]
    _, dec_in = make_labels(codes, dims.kary, dims.max_output_length)
    labels = compact_labels(codes, dims)
    input_ids, mask = batch["query_ids"], batch["query_mask"]
    deterministic = step_cfg.rdrop <= 0 and rng is None

    if step_cfg.rdrop > 0:
        # two stochastic passes of the doubled batch (modeling_t5.py:
        # 2364-2391): duplicate inputs, one forward with dropout
        input_ids = jnp.concatenate([input_ids, input_ids], 0)
        mask = jnp.concatenate([mask, mask], 0)
        dec_in = jnp.concatenate([dec_in, dec_in], 0)
        labels = jnp.concatenate([labels, labels], 0)

    kwargs = {}
    if not deterministic:
        kwargs = {"rngs": {"dropout": rng}}
    logits, enc_h, dec_h, _ = model.apply(
        {"params": params}, input_ids, mask, dec_in,
        deterministic=deterministic, **kwargs)

    ce = L.nci_ce_loss(logits, labels)
    metrics = {"nci_loss": ce}
    loss = ce
    if step_cfg.rdrop > 0:
        b = logits.shape[0] // 2
        if step_cfg.rdrop_loss == "KL":
            dist = L.rdrop_kl(logits[:b], logits[b:])
        elif step_cfg.rdrop_loss == "Contrast":
            dist = L.rdrop_contrast(dec_h[:b], dec_h[b:])
        else:
            dist = L.rdrop_l2(logits[:b], logits[b:])
        loss = ce + step_cfg.rdrop * dist
        metrics["dist_loss"] = dist
    metrics["loss"] = loss
    return loss, metrics


def make_nci_train_step(model: NCIT5, optimizer,
                        step_cfg: NCIStepConfig = NCIStepConfig(),
                        donate: bool = True):
    """Jitted train step; under a mesh, shard batch along 'data' and the
    grads all-reduce automatically."""

    def step(state: TrainState, batch, rng):
        def lf(p):
            return nci_loss_fn(model, p, batch, rng, step_cfg)
        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_nci_train_chunk(model: NCIT5, optimizer,
                         step_cfg: NCIStepConfig = NCIStepConfig()):
    """K train steps fused into ONE program via ``lax.scan``.

    On a tunneled TPU every dispatch is an RPC with a ~35 ms floor, so a
    per-step python loop caps training at ~25 steps/s regardless of the
    model; scanning K steps per dispatch amortizes the floor to
    ~35/K ms/step (compile-once, K is static).  Semantically identical
    to K calls of :func:`make_nci_train_step`.

    chunk(state, batches, rng) where each leaf of ``batches`` is stacked
    (K, B, ...); rng is split per step (None = deterministic).
    Returns (state, metrics of the LAST step — matching what a per-step
    loop would report at the chunk boundary).
    """

    def chunk(state: TrainState, batches, rng):
        K = jax.tree.leaves(batches)[0].shape[0]
        if rng is not None:
            rngs = jax.random.split(rng, K)
        else:
            rngs = jnp.zeros((K, 2), jnp.uint32)

        def body(state, xs):
            batch, r = xs
            def lf(p):
                return nci_loss_fn(model, p, batch,
                                   r if rng is not None else None,
                                   step_cfg)
            (loss, metrics), grads = jax.value_and_grad(
                lf, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), metrics

        state, metrics = jax.lax.scan(body, state, (batches, rngs))
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return jax.jit(chunk, donate_argnums=(0,))


# --------------------------------------------------------------------------
# twin-tower training step (contrastive with sampled hard negatives)
# --------------------------------------------------------------------------

def make_twin_train_step(tower_module, optimizer, family: str = "t5",
                         negatives_x_device: Optional[str] = None):
    """batch: query_ids/mask (b, Lq), doc_ids/mask (b*(1+neg), Ld)
    grouped per query with the positive first (co-loss,
    ``document_encoder.py:61-102``)."""
    from ..models import twin_tower as tt

    def rep(params, ids, mask):
        if family == "t5":
            from ..models.t5 import T5Model
            return tower_module.apply({"params": params}, ids, mask,
                                      method=T5Model.first_token_rep)
        from ..models.bert import BertEncoderModel
        return tower_module.apply({"params": params}, ids, mask,
                                  method=BertEncoderModel.cls_rep)

    def step(state: TrainState, batch):
        def lf(p):
            q = rep(p, batch["query_ids"], batch["query_mask"])
            d = rep(p, batch["doc_ids"], batch["doc_mask"])
            loss, _ = tt.contrastive_loss(q, d,
                                          axis_name=negatives_x_device)
            return loss, {"co_loss": loss}
        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))
