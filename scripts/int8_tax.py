"""Controlled int8-vs-bf16 quality cost at EQUAL geometry.

BASELINE.json's north star is "match quality at equal index memory";
int8 is the only full-corpus single-chip mode (8.84M bf16 OOMs), so the
int8 quantization tax must be measured, not assumed.  This runs the
bench child twice at the SAME corpus size / seed / batch / codebooks —
once bf16, once int8 — and writes one artifact with both recall sets
side by side plus the deltas.

Env: TAX_NDOC (default 4,421,000 = half MARCO, bf16 fits), TAX_OUT,
BENCH_CKPT (inherited; auto-discovered by bench.py when a complete
quality bundle exists — then trained_* recalls are compared too),
BENCH_BATCH etc. pass through to the children.
"""

import json
import os
import os.path as osp
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

RECALL_KEYS = (
    "recall100_beam_coarse", "recall100_oracle_coarse",
    "oracle_cluster_coverage", "trained_coarse_hit@10",
    "trained_fine_recall@100", "value", "int8_scale", "ndoc_per_query",
)


def run_child(ndoc, dtype):
    env = dict(os.environ, BENCH_CHILD=str(ndoc), BENCH_DTYPE=dtype)
    r = subprocess.run([sys.executable, osp.join(REPO, "bench.py")],
                       env=env, stdout=subprocess.PIPE,
                       timeout=int(os.environ.get("TAX_TIMEOUT", 1800)))
    lines = r.stdout.decode().strip().splitlines()
    line = next((x for x in reversed(lines) if x.startswith("{")), None)
    if r.returncode != 0 or line is None:
        raise SystemExit(f"bench child failed: ndoc={ndoc} dtype={dtype} "
                         f"rc={r.returncode}")
    return json.loads(line)


def main():
    ndoc = int(os.environ.get("TAX_NDOC", 4_421_000))
    out_p = os.environ.get("TAX_OUT", osp.join(REPO, "INT8TAX_r04.json"))
    results = {}
    for dtype in ("bf16", "int8"):
        obj = run_child(ndoc, dtype)
        results[dtype] = {k: obj[k] for k in RECALL_KEYS if k in obj}
        print(f"{dtype}: {results[dtype]}", file=sys.stderr, flush=True)
        import time
        time.sleep(20)            # let the chip claim recycle
    out = {"metric": "int8_quality_tax", "ndoc": ndoc,
           "bf16": results["bf16"], "int8": results["int8"]}
    for k in RECALL_KEYS:
        a, b = results["bf16"].get(k), results["int8"].get(k)
        if isinstance(a, (int, float)) and isinstance(b, (int, float)) \
                and ("recall" in k or "hit" in k):
            out[f"delta_{k}"] = round(float(b) - float(a), 4)
    with open(out_p, "w") as fw:
        fw.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
