"""Focused trace capture of the incremental beam at serving shapes.

Debug companion to profile_beam.py: captures ONE trace of n beam
dispatches, then dumps every process/thread lane with its total X-event
time so lane-filter mismatches are visible, followed by the op
breakdown from utils.profiling.device_op_seconds.
"""

import gzip
import glob
import json
import os
import shutil
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mevi_jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mevi_tpu.models.nci import NCIDims, NCIT5
from mevi_tpu.models.t5 import T5Dims
from mevi_tpu.decode.beam import nci_beam_search_incremental
from mevi_tpu.utils import profiling as P


def fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    B = int(os.environ.get("B", 512))
    NB, KARY, M, QLEN = 10, 32, 4, 32
    dt = jnp.bfloat16
    t5 = T5Dims(num_layers=12, num_decoder_layers=6, d_model=768,
                d_kv=64, d_ff=3072, num_heads=12, dropout_rate=0.0,
                dtype=dt)
    model = NCIT5(NCIDims(t5=t5, kary=KARY, max_output_length=M + 2))
    ids = jnp.ones((B, QLEN), jnp.int32)
    mask = jnp.ones((B, QLEN), jnp.int32)
    dec_in = jnp.zeros((B, M + 2), jnp.int32)

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    t0 = time.time()
    params = jax.jit(lambda k: cast(
        model.init(k, ids, mask, dec_in)["params"]))(jax.random.PRNGKey(0))
    fetch(params)
    print(f"params ready {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)
    tables = jax.jit(lambda p: model.apply(
        {"params": p}, method=NCIT5.head_level_tables))(params)
    fetch(tables)
    pawa_tables = None
    if os.environ.get("PAWA_TABLES", "1") != "0":
        t0 = time.time()
        pawa_tables = jax.jit(lambda p, lt: model.apply(
            {"params": p}, method=NCIT5.pawa_prefix_tables,
            level_tables=lt))(params, tables)
        fetch(pawa_tables)
        print(f"pawa prefix tables built {time.time()-t0:.1f}s "
              f"(levels {sorted(pawa_tables['T'])})", file=sys.stderr,
              flush=True)

    def beam(i):
        return nci_beam_search_incremental(
            model, params, ids + (i % 2), mask, NB, level_tables=tables,
            pawa_tables=pawa_tables)

    fetch(beam(0))   # compile
    fetch(beam(1))
    n = 3
    trace_dir = "/tmp/mevi_trace_beamonly"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for i in range(n):
            fetch(beam(i))

    # lane census
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    print("trace files:", paths, flush=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fr:
        data = json.load(fr)
    ev = data.get("traceEvents", [])
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    lane_time = {}
    lane_n = {}
    for e in ev:
        if e.get("ph") != "X":
            continue
        key = (pnames.get(e.get("pid"), "?"),
               tnames.get((e.get("pid"), e.get("tid")), "?"))
        lane_time[key] = lane_time.get(key, 0.0) + e.get("dur", 0) * 1e-6
        lane_n[key] = lane_n.get(key, 0) + 1
    for k in sorted(lane_time, key=lambda k: -lane_time[k])[:20]:
        print(f"lane {k}: {lane_time[k]*1e3:.1f} ms over {lane_n[k]} "
              f"events", flush=True)

    total, per_op = P.device_op_seconds(trace_dir)
    print(f"[trace] beam: device {total/n*1e3:.2f} ms/call", flush=True)
    for op, s in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"    {s*1e3/n:8.3f} ms  {op[:100]}", flush=True)


if __name__ == "__main__":
    main()
