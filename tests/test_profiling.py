"""Trace parsing + XLA cost analysis (utils/profiling.py)."""

import gzip
import json
import os

import jax
import jax.numpy as jnp

from mevi_tpu.utils import profiling as P


def test_device_op_seconds_aggregates_tensorcore_lanes(tmp_path):
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0 (TensorCore)"}},
        {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "host threads"}},
        {"ph": "M", "pid": 9, "tid": 3, "name": "thread_name",
         "args": {"name": "python"}},
        # two device ops (dur in microseconds)
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.1",
         "ts": 0, "dur": 1500},
        {"ph": "X", "pid": 1, "tid": 2, "name": "dot.7",
         "ts": 2000, "dur": 500},
        # a host event that must NOT count
        {"ph": "X", "pid": 9, "tid": 3, "name": "python_call",
         "ts": 0, "dur": 999999},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as fw:
        json.dump({"traceEvents": events}, fw)
    total, per_op = P.device_op_seconds(str(tmp_path))
    assert abs(total - 0.002) < 1e-9
    assert abs(per_op["fusion.1"] - 0.0015) < 1e-12
    assert "python_call" not in per_op


def test_device_op_seconds_excludes_module_lane(tmp_path):
    """An 'XLA Modules' lane in the same TensorCore process duplicates
    the op events as whole-module spans; counting it doubles device
    time (advisor round-3 finding) — only the 'XLA Ops' lane counts."""
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0 (TensorCore)"}},
        {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 1, "tid": 4, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 1, "tid": 5, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.1",
         "ts": 0, "dur": 1500},
        {"ph": "X", "pid": 1, "tid": 4, "name": "jit_step",
         "ts": 0, "dur": 1500},       # module span: must NOT count
        {"ph": "X", "pid": 1, "tid": 5, "name": "step 3",
         "ts": 0, "dur": 1500},       # step span: must NOT count
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as fw:
        json.dump({"traceEvents": events}, fw)
    total, per_op = P.device_op_seconds(str(tmp_path))
    assert abs(total - 0.0015) < 1e-9
    assert "jit_step" not in per_op and "step 3" not in per_op


def test_device_op_seconds_tensorcore_fallback(tmp_path):
    """Capture with no 'XLA Ops' lane: fall back to TensorCore process
    threads, still excluding Steps/Modules lanes."""
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0 (TensorCore)"}},
        {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name",
         "args": {"name": "ops-lane"}},
        {"ph": "M", "pid": 1, "tid": 4, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "dot.1",
         "ts": 0, "dur": 1000},
        {"ph": "X", "pid": 1, "tid": 4, "name": "jit_step",
         "ts": 0, "dur": 1000},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as fw:
        json.dump({"traceEvents": events}, fw)
    total, per_op = P.device_op_seconds(str(tmp_path))
    assert abs(total - 0.001) < 1e-9
    assert "jit_step" not in per_op


def test_compiled_flops_matmul():
    f = jax.jit(lambda a, b: a @ b)
    a = jnp.ones((64, 128), jnp.float32)
    b = jnp.ones((128, 32), jnp.float32)
    fl = P.compiled_flops(f, a, b)
    if fl is not None:           # some backends omit cost analysis
        assert fl >= 2 * 64 * 128 * 32 * 0.5
