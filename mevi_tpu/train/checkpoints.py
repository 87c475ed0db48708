"""Checkpointing: orbax for params/opt-state + a content-addressed
artifact cache.

The reference keeps (a) lightning checkpoints with metric-encoded
filenames and top-k retention (``main.py:89-170``) and (b) an artifact
cache of doc embeddings / codebooks / cluster pickles keyed by
config+epoch (``get_current_path``, ``main_models.py:2944-2978``), with
best-k embedding files retained in sync with the recall leaderboard
(``main_models.py:4337-4364``).  Both are rebuilt here:

* ``CheckpointManager``: orbax save/restore with a metric-ranked keep-k,
* ``ArtifactCache``: numpy artifacts under ``<root>/<key>/<name>``, where
  ``key`` comes from ``MEVIConfig.artifact_key`` — regenerate lazily,
  never recompute what a previous run already produced.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
from typing import Any, Dict, Optional

import numpy as np


class ArtifactCache:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, key: str, name: str) -> str:
        d = osp.join(self.root, key)
        os.makedirs(d, exist_ok=True)
        return osp.join(d, name)

    def has(self, key: str, name: str) -> bool:
        return osp.exists(self.path(key, name))

    def save_array(self, key: str, name: str, arr) -> str:
        p = self.path(key, name)
        np.save(p + ".tmp.npy", np.asarray(arr))
        os.replace(p + ".tmp.npy", p)
        return p

    def load_array(self, key: str, name: str) -> np.ndarray:
        return np.load(self.path(key, name))

    def save_json(self, key: str, name: str, obj) -> str:
        p = self.path(key, name)
        with open(p, "w") as fw:
            json.dump(obj, fw)
        return p

    def load_json(self, key: str, name: str):
        with open(self.path(key, name)) as fr:
            return json.load(fr)


class CheckpointManager:
    """Orbax-backed params checkpoints with metric-ranked retention
    (save_top_k semantics, ``main.py:96-127``)."""

    def __init__(self, directory: str, keep: int = 2,
                 monitor: str = "recall100", mode: str = "max"):
        import orbax.checkpoint as ocp
        self.directory = osp.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        self.monitor = monitor
        self.mode = mode
        self._ckptr = ocp.StandardCheckpointer()
        self._board_path = osp.join(self.directory, "leaderboard.json")
        self._board: Dict[str, float] = {}
        if osp.exists(self._board_path):
            with open(self._board_path) as fr:
                self._board = json.load(fr)
        # A pre-existing board written under a DIFFERENT monitor/mode
        # holds incomparable values (e.g. loss ~2.3 vs hit@10 <= 1 under
        # mode=max would permanently outrank every new entry and keep=k
        # pruning would evict the genuinely best new checkpoints).
        # Demote the stale entries to the worst possible rank: old tags
        # stay restorable (resume still finds them via best_tag while no
        # new entry exists) but any new metric value outranks them.
        meta_p = osp.join(self.directory, "leaderboard.meta.json")
        if self._board and osp.exists(meta_p):
            try:
                with open(meta_p) as fr:
                    meta = json.load(fr)
            except Exception:
                meta = {}
            if (meta.get("monitor", monitor), meta.get("mode", mode)) \
                    != (monitor, mode):
                with open(osp.join(self.directory,
                                   "leaderboard.prev.json"), "w") as fw:
                    json.dump({"meta": meta, "board": self._board}, fw,
                              indent=1)
                demoted = float("-inf") if mode == "max" else float("inf")
                self._board = {t: demoted for t in self._board}
                self._flush_board()

    def _flush_board(self):
        with open(self._board_path, "w") as fw:
            json.dump(self._board, fw, indent=1)
        # persist what the floats MEAN: a consumer opening the
        # directory later (bench bundle discovery, the quality eval
        # stage) must rank with the same monitor/mode the writer used —
        # a dev-recall board read as mode=min would pick the WORST tag
        with open(osp.join(self.directory, "leaderboard.meta.json"),
                  "w") as fw:
            json.dump({"monitor": self.monitor, "mode": self.mode}, fw)

    @classmethod
    def from_dir(cls, directory: str, keep: int = 2,
                 default_monitor: str = "loss",
                 default_mode: str = "min") -> "CheckpointManager":
        """Open an existing checkpoint dir ranking by whatever monitor
        its writer recorded (falls back to the given defaults for
        pre-meta boards)."""
        meta_p = osp.join(osp.abspath(directory), "leaderboard.meta.json")
        monitor, mode = default_monitor, default_mode
        if osp.exists(meta_p):
            try:
                with open(meta_p) as fr:
                    meta = json.load(fr)
                monitor = meta.get("monitor", monitor)
                mode = meta.get("mode", mode)
            except Exception:
                pass
        return cls(directory, keep=keep, monitor=monitor, mode=mode)

    def _rank_key(self, value: float) -> float:
        return value if self.mode == "max" else -value

    def save(self, tag: str, state: Any, metric: Optional[float] = None,
             force: bool = False) -> Optional[str]:
        """Save when within top-k by the monitored metric."""
        if metric is not None and not force and len(self._board) >= self.keep:
            worst = min(self._rank_key(v) for v in self._board.values())
            if self._rank_key(metric) <= worst:
                return None
        path = osp.join(self.directory, tag)
        if osp.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        self._board[tag] = float(metric) if metric is not None else 0.0
        # evict beyond keep
        if metric is not None and len(self._board) > self.keep:
            order = sorted(self._board, key=lambda t:
                           self._rank_key(self._board[t]))
            for tag_out in order[:len(self._board) - self.keep]:
                victim = osp.join(self.directory, tag_out)
                if osp.exists(victim):
                    shutil.rmtree(victim)
                del self._board[tag_out]
        self._flush_board()
        return path

    def best_tag(self) -> Optional[str]:
        if not self._board:
            return None
        return max(self._board, key=lambda t: self._rank_key(
            self._board[t]))

    def restore(self, tag: str, template: Any) -> Any:
        return self._ckptr.restore(osp.join(self.directory, tag),
                                   template)


def restore_tree_host(path: str):
    """Restore an orbax checkpoint to HOST numpy arrays, ignoring the
    shardings it was saved with.  A ``StandardCheckpointer().restore``
    without a target replays the saved device assignment and fails
    when the checkpoint was written on different hardware (e.g. a
    TPU-trained bundle restored for a CPU smoke run)."""
    import jax
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path)
    tree = getattr(meta, "item_metadata", meta)   # StepMetadata wrapper
    tree = getattr(tree, "tree", tree)
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(path, restore_args=restore_args)


def save_params_npz(path: str, params) -> None:
    """Flat npz snapshot of a flax params pytree ('/'-joined paths) —
    a light-weight alternative to orbax for single-array-tree bundles
    (tower params shipped with quality/bench bundles)."""
    import jax
    import numpy as np
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(getattr(p, "key", str(p)) for p in kp)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str):
    """Inverse of :func:`save_params_npz` (nested dict pytree)."""
    import numpy as np
    out = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out
