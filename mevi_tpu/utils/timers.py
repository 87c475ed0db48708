"""Timing / profiling utilities.

Replaces the reference's ad-hoc timer plumbing — encoder/decoder split
timers with CUDA sync inside generate() (``generation_utils.py:111-114``)
and the nci/knn split in infer (``main_models.py:3558-3560``) — with
named sections that block on device work, plus a jax.profiler trace
context for deep dives.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class SectionTimers:
    """Named wall-clock sections with device sync at the boundaries."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        if self.sync:
            # drain pending device work so the section measures itself
            jax.effects_barrier()
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        elif self.sync:
            jax.effects_barrier()
        self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.times.items():
            if not ts:
                continue
            out[name] = {
                "count": len(ts),
                "total_s": sum(ts),
                "mean_ms": 1e3 * sum(ts) / len(ts),
                "min_ms": 1e3 * min(ts),
            }
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as fw:
            json.dump(self.summary(), fw, indent=1)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace when a log dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
