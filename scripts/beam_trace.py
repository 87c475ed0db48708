"""Trace the NCI beam at serving config and write BEAMTRACE_r05.json.

Captures device-op time of ``nci_beam_search_incremental`` (T5-base
NCI + PAWA-4, RQ 4x32, batch BT_B x 10 beams, bf16) via
``jax.profiler`` (works over the tunnel), aggregates the per-op
breakdown into layout-vs-compute categories, and reports MFU from XLA
``cost_analysis`` FLOPs — the round-4 capture method
(``BEAMTRACE_r04.json``), now scripted so the heads-last-attention and
per-layer-tuple-entry passes (committed 89fbd8e / f37b92a, measured
null in r04) get real rows.

Env: BT_B (batch, 512), BT_OUT, BT_LABEL (row name in the artifact).
"""

import json
import os
import os.path as osp
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mevi_jax_cache")
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mevi_tpu.decode.beam import nci_beam_search_incremental
from mevi_tpu.models.nci import NCIDims, NCIT5
from mevi_tpu.models.t5 import T5Dims
from mevi_tpu.utils import profiling as P


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    return out


def categorize(per_op):
    cats = {"fusion": 0.0, "copy": 0.0, "conv_fusions": 0.0,
            "reshape": 0.0, "copy_done_dma": 0.0, "other": 0.0}
    for name, sec in per_op.items():
        n = name.lower()
        if "copy-done" in n or "copy_done" in n:
            cats["copy_done_dma"] += sec
        elif n.startswith("copy") or ".copy" in n:
            cats["copy"] += sec
        elif "conv" in n:
            cats["conv_fusions"] += sec
        elif "fusion" in n:
            cats["fusion"] += sec
        elif "reshape" in n or "transpose" in n:
            cats["reshape"] += sec
        else:
            cats["other"] += sec
    return cats


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    on_tpu = dev.platform != "cpu"
    B = int(os.environ.get("BT_B", 512 if on_tpu else 4))
    NB, KARY, M, QLEN = 10, 32, 4, 32
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu:
        t5 = T5Dims(num_layers=12, num_decoder_layers=6, d_model=768,
                    d_kv=64, d_ff=3072, num_heads=12, dropout_rate=0.0,
                    dtype=dt)
        dims = NCIDims(t5=t5, kary=KARY, max_output_length=M + 2)
    else:
        t5 = T5Dims(vocab_size=128, num_layers=2, num_decoder_layers=2,
                    d_model=32, d_kv=8, d_ff=64, num_heads=4,
                    dropout_rate=0.0)
        dims = NCIDims(t5=t5, kary=KARY, max_output_length=M + 2,
                       adaptor_layer_num=1, adaptor_num_heads=4)
    model = NCIT5(dims)
    ids = jnp.ones((B, QLEN), jnp.int32)
    mask = jnp.ones((B, QLEN), jnp.int32)

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    t0 = time.time()
    params = jax.jit(lambda k: cast(model.init(
        k, ids, mask, jnp.zeros((B, M + 2), jnp.int32))["params"]))(
        jax.random.PRNGKey(0))
    fetch(params)
    log(f"params {time.time()-t0:.1f}s")
    level_tables = jax.jit(
        lambda p: model.apply({"params": p},
                              method=NCIT5.head_level_tables))(params)

    def beam(i):
        return fetch(nci_beam_search_incremental(
            model, params, ids + (i % 2), mask, NB,
            level_tables=level_tables)[0])

    t0 = time.time()
    beam(0)
    log(f"compiled + first run {time.time()-t0:.1f}s")
    dt_dev, per_op = P.traced_stage_seconds(
        beam, n=3, trace_dir="/tmp/mevi_trace_beamtrace")
    cats = categorize(per_op)
    try:
        fl = P.compiled_flops(nci_beam_search_incremental, model,
                              params, ids, mask, NB,
                              level_tables=level_tables)
    except Exception as e:
        log(f"flops failed: {e!r}")
        fl = None
    mfu = (round(fl / max(dt_dev, 1e-9) / P.TPU_V5E_BF16_PEAK * 100, 1)
           if (fl and on_tpu) else None)
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:20]
    out = {
        "what": ("NCI beam device time at serving config "
                 f"(batch {B}, {NB} beams, T5-base NCI + PAWA-4, "
                 "RQ 4x32)"),
        "label": os.environ.get(
            "BT_LABEL", "r05 heads-last + per-layer tuple entries"),
        "beam_device_ms": round(dt_dev * 1e3, 1),
        "beam_mfu_pct": mfu,
        "trace_breakdown_ms": {k: round(v / 3 * 1e3, 2)
                               for k, v in cats.items()},
        "top_ops_ms": [[n, round(s / 3 * 1e3, 2)] for n, s in top],
        "history": {"r04_baseline": 97.1, "rows_major_entries": 88.9},
    }
    out_p = os.environ.get("BT_OUT", osp.join(REPO, "BEAMTRACE_r05.json"))
    with open(out_p, "w") as fw:
        fw.write(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: out[k] for k in
                      ("beam_device_ms", "beam_mfu_pct",
                       "trace_breakdown_ms")}), flush=True)


if __name__ == "__main__":
    main()
