"""Experiment logging: jsonl metrics + optional wandb/tensorboard.

The reference logs to WandB (run name encoding ~20 hyperparameters,
``main.py:861-945``) with a TensorBoard fallback.  Here the primary sink
is an append-only metrics.jsonl (machine-readable, survives any backend),
with wandb attached when available and configured.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def run_name(tag: str, cfg) -> str:
    """Compact run name from the load-bearing config dims (the
    reference's important_info_list idea without the 20-field blob)."""
    rq = cfg.rq
    return (f"{tag}_{cfg.dataset}_rq{rq.subvector_num}x{rq.subvector_bits}"
            f"_d{rq.emb_size}_b{cfg.train.train_batch_size}")


class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "run",
                 use_wandb: bool = False, wandb_project: str = "mevi_tpu",
                 config: Optional[Dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=wandb_project, name=name,
                                         config=config or {})
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        flat = {k: (float(v) if hasattr(v, "item") or
                    isinstance(v, (int, float)) else v)
                for k, v in metrics.items()}
        rec = {"ts": time.time(), "step": step, **flat}
        self._fh.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(flat, step=step)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
