"""Compute the data-ceiling bounds for a quality workdir's dev set.

Usage: [CEIL_WORKDIR=data/quality_r03] [CEIL_N=1024] [CEIL_FORCE_CPU=1]
       python scripts/data_ceiling.py [out.json]

Reads spec.json + dev_docs.npy + dev_tokens.npy + codes.npy from the
workdir, computes the Bayes bound and the oracle single-vector-tower
bound (mevi_tpu/eval/ceiling.py), prints one JSON line and writes it
next to the workdir's QUALITY output so trained numbers can be read as
measured/ceiling.
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


def main():
    if os.environ.get("CEIL_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    from mevi_tpu.data import synth
    from mevi_tpu.eval.ceiling import ceiling_report

    workdir = os.environ.get("CEIL_WORKDIR",
                             osp.join(REPO, "data", "quality_r03"))
    n = int(os.environ.get("CEIL_N", 1024))
    spec = synth.load_spec(osp.join(workdir, "spec.json"))
    draws = synth.make_draws(spec)
    codes = np.load(osp.join(workdir, "codes.npy"))
    gt = np.load(osp.join(workdir, "dev_docs.npy"))[:n]
    tok = np.load(osp.join(workdir, "dev_tokens.npy"))[:n]
    tab = synth.make_tables(spec)
    t0 = time.time()
    rep = ceiling_report(spec, tab, draws, codes, tok, gt)
    rep.update({"workdir": osp.relpath(workdir, REPO), "n_dev": len(gt),
                "ndoc": spec.ndoc, "info_dropout": spec.info_dropout,
                "secs": round(time.time() - t0, 1)})
    out = sys.argv[1] if len(sys.argv) > 1 else \
        osp.join(workdir, "CEILING.json")
    with open(out, "w") as fw:
        fw.write(json.dumps(rep) + "\n")
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
