"""Training orchestration: epochs, alternating stages, validation-driven
artifact regeneration.

Rebuilds the reference's training choreography
(``T5FineTunerWithValidation``):

* **alt-stage switching** (``on_train_epoch_start``,
  ``main_models.py:2838-2867``): epochs alternate between NCI-training
  and twin/VQ-training phases by re-labeling parameter groups
  (fixnci/fixpq/fixdocenc) — here by swapping which jitted step runs,
* **validation-driven regeneration** (``on_validation_epoch_start``,
  ``main_models.py:4215-4273``): when the document tower is trainable,
  every validation re-embeds the corpus, refits the RQ codebooks (with
  Hungarian alignment to the previous fit so code labels stay stable,
  ``pq.py:600-611``), rebuilds the CSR index, and re-evaluates,
* **checkpointing on recall** with top-k retention + the artifact cache
  (``main.py:89-170``, ``main_models.py:4337-4364``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from ..config import MEVIConfig
from ..eval.run_eval import Evaluator
from ..eval.searcher import build_fine_index
from ..index.build import build_rq_index, embed_corpus
from ..ops import rq as rq_ops
from ..utils.logging import MetricsLogger
from .checkpoints import ArtifactCache, CheckpointManager


@dataclasses.dataclass
class LoopConfig:
    num_epochs: int = 10
    val_every: int = 1                 # epochs between validations
    refit_rq: bool = False             # re-cluster when tower trains
    rq_iters: int = 10
    align_codebooks: bool = True       # Hungarian label stability
    alt_epochs: Optional[tuple] = None  # (nci_epochs, cycle) alt schedule
    monitor: str = "recall100"
    seed: int = 42


class TrainLoop:
    """Drives (train step(s), datasets, evaluator, artifact jobs)."""

    def __init__(self, cfg: MEVIConfig, loop: LoopConfig,
                 nci_model, steps: Dict[str, Callable],
                 state, dataset_fn: Callable[[int], Any],
                 tower_rep: Optional[Callable] = None,
                 doc_tokens: Optional[np.ndarray] = None,
                 doc_masks: Optional[np.ndarray] = None,
                 eval_inputs: Optional[dict] = None,
                 ckpt_dir: str = "ckpts", log_dir: str = "logs"):
        """steps: {'nci': step_fn, 'twin': step_fn (optional)} — each
        maps (state, batch, rng) -> (state, metrics).
        dataset_fn(epoch) -> iterator of batches for the active stage.
        eval_inputs: {queries, query_ids, query_mask, gt_docids}.
        """
        self.cfg = cfg
        self.loop = loop
        self.nci_model = nci_model
        self.steps = steps
        self.state = state
        self.dataset_fn = dataset_fn
        self.tower_rep = tower_rep
        self.doc_tokens = doc_tokens
        self.doc_masks = doc_masks
        self.eval_inputs = eval_inputs
        self.ckpts = CheckpointManager(ckpt_dir, keep=2,
                                       monitor=loop.monitor, mode="max")
        self.cache = ArtifactCache(f"{ckpt_dir}/artifacts")
        self.logger = MetricsLogger(log_dir, "trainloop")
        self.codebooks: Optional[np.ndarray] = None
        self.doc_codes: Optional[np.ndarray] = None
        self.fine_index = None
        self.start_epoch = 0
        self._rng = np.random.default_rng(loop.seed)
        self._key = jax.random.PRNGKey(loop.seed)

    # -- resume (reference: --resume_from_checkpoint, main.py:128,158;
    #    hyperparameter surgery try_modify_ckpt is unnecessary here — the
    #    config lives outside the checkpoint) ------------------------------

    def save_state(self, tag: str, metric: Optional[float] = None,
                   force: bool = False):
        """Full-state checkpoint (params + opt state + step + epoch)."""
        payload = {"params": self.state.params,
                   "opt_state": self.state.opt_state,
                   "step": self.state.step,
                   "epoch": np.asarray(self.start_epoch, np.int32)}
        return self.ckpts.save(tag, payload, metric=metric, force=force)

    def resume(self, tag: Optional[str] = None) -> bool:
        """Restore the full train state from ``tag`` (or the best saved
        checkpoint); returns True when something was restored."""
        from .trainer import TrainState
        tag = tag or self.ckpts.best_tag()
        if tag is None:
            return False
        template = {"params": self.state.params,
                    "opt_state": self.state.opt_state,
                    "step": self.state.step,
                    "epoch": np.asarray(0, np.int32)}
        restored = self.ckpts.restore(tag, template)
        self.state = TrainState(restored["params"], restored["opt_state"],
                                restored["step"])
        self.start_epoch = int(restored["epoch"]) + 1
        return True

    # -- stage scheduling (alt NCI / twin) --------------------------------

    def stage_for_epoch(self, epoch: int) -> str:
        if self.loop.alt_epochs is None or "twin" not in self.steps:
            return "nci"
        nci_part, cycle = self.loop.alt_epochs
        return "nci" if (epoch % cycle) < nci_part else "twin"

    # -- artifact regeneration --------------------------------------------

    def regenerate_index(self, tower_params) -> None:
        """Re-embed corpus + refit RQ + rebuild CSR (validation-start
        semantics)."""
        assert self.tower_rep is not None
        emb = embed_corpus(
            lambda i, m: self.tower_rep(tower_params, i, m),
            self.doc_tokens, self.doc_masks,
            batch_size=self.cfg.train.encode_batch_size)
        old = self.codebooks
        arts = build_rq_index(self.cfg, emb, seed=self.loop.seed,
                              iters=self.loop.rq_iters)
        codebooks = np.asarray(arts.codebooks)
        if old is not None and self.loop.align_codebooks:
            codebooks = rq_ops.align_codebooks(old, codebooks,
                                               self.cfg.rq.dist_mode)
            # re-assign with the aligned books so labels stay stable
            import jax.numpy as jnp
            codes = np.asarray(rq_ops.assign(
                jnp.asarray(emb), jnp.asarray(codebooks),
                self.cfg.rq.pq_type, self.cfg.rq.dist_mode))
        else:
            codes = np.asarray(arts.codes)
        self.codebooks = codebooks
        self.doc_codes = codes
        self.fine_index = build_fine_index(codes, emb, self.cfg.rq.kary)

    # -- validation --------------------------------------------------------

    def validate(self, params, query_rep_fn=None) -> Dict[str, float]:
        if self.eval_inputs is None or self.fine_index is None:
            return {}
        ev = Evaluator(self.nci_model, params, self.cfg.infer,
                       fine_index=self.fine_index,
                       query_rep_fn=query_rep_fn,
                       doc_codes=self.doc_codes)
        out = ev.evaluate(self.eval_inputs["queries"],
                          self.eval_inputs["query_ids"],
                          self.eval_inputs["query_mask"],
                          self.eval_inputs["gt_docids"],
                          batch_size=self.cfg.train.eval_batch_size)
        flat = {}
        if out.coarse:
            for k, v in out.coarse["recall"].items():
                flat[f"coarse_recall{k}"] = v
        if out.fine:
            for k, v in out.fine["recall"].items():
                flat[f"recall{k}"] = v
            for k, v in out.fine["mrr"].items():
                flat[f"mrr{k}"] = v
        flat["ndoc"] = out.ndoc_per_query
        return flat

    # -- main loop ----------------------------------------------------------

    def run(self, query_rep_fn=None) -> Any:
        for epoch in range(self.start_epoch, self.loop.num_epochs):
            self.start_epoch = epoch
            stage = self.stage_for_epoch(epoch)
            step = self.steps[stage]
            metrics = {}
            for batch in self.dataset_fn(epoch):
                self._key, sub = jax.random.split(self._key)
                self.state, metrics = step(self.state, batch, sub)
            self.logger.log({f"train_{k}": float(v)
                             for k, v in metrics.items()}
                            | {"epoch": epoch, "stage": stage},
                            int(self.state.step))

            if (epoch + 1) % self.loop.val_every == 0:
                params = self.state.params
                is_joint = isinstance(params, dict) and "nci" in params
                if self.loop.refit_rq and is_joint:
                    self.regenerate_index(params["tower"])
                nci_params = params["nci"] if is_joint else params
                val = self.validate(nci_params, query_rep_fn)
                if val:
                    self.logger.log(val, int(self.state.step))
                    metric = val.get(self.loop.monitor,
                                     val.get("recall100", 0.0))
                else:
                    # no eval set: rank checkpoints by train loss
                    metric = -float(metrics.get("loss", 0.0))
                self.save_state(f"epoch{epoch}", metric=metric)
        return self.state
