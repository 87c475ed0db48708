"""Timers, logging, config artifact keys."""

import json
import os.path as osp

import numpy as np

from mevi_tpu.utils.logging import MetricsLogger, run_name
from mevi_tpu.utils.timers import SectionTimers, profiler_trace


def test_section_timers():
    t = SectionTimers(sync=False)
    with t.section("a"):
        sum(range(1000))
    with t.section("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0


def test_timers_dump(tmp_path):
    t = SectionTimers(sync=False)
    with t.section("x"):
        pass
    p = str(tmp_path / "times.json")
    t.dump(p)
    assert "x" in json.load(open(p))


def test_profiler_trace_noop():
    with profiler_trace(None):
        pass


def test_metrics_logger(tmp_path):
    lg = MetricsLogger(str(tmp_path), "run1")
    lg.log({"loss": np.float32(1.5), "note": "hi"}, step=3)
    lg.close()
    rec = json.loads(open(osp.join(str(tmp_path),
                                   "run1_metrics.jsonl")).read())
    assert rec["loss"] == 1.5 and rec["step"] == 3


def test_run_name():
    from mevi_tpu.config import MEVIConfig
    name = run_name("nci", MEVIConfig().finalize())
    assert "rq4x5" in name and "marco" in name
