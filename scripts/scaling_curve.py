"""Trained-pipeline quality vs corpus size (recall-vs-scale curve).

Round-4 paired the 3362 q/s headline with fine recall@100 = 0.156 at
8.84M docs (bundle trained at 1M) and no curve existed to show what
scaling costs.  This drives the bench CHILD (one subprocess per corpus
size, the exact serving path: trained tower + NCI beam -> Pallas fine
stage, int8 index) across SC_SIZES and collects the trained_* keys
into SCALING_r05.json, one sidecar per size (a re-run resumes at the
missing sizes; SC_FRESH=1 re-measures everything).

Env: SC_SIZES (comma ints, default 1000000,2210455,4420911,8841823),
SC_DTYPE (int8), SC_OUT, SC_STAGE_DIR, BENCH_CKPT (bundle override),
SC_TIMEOUT per child (default 3000 s).
"""

import json
import os
import os.path as osp
import subprocess
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
KEEP = ("ndoc", "trained_coarse_hit@1", "trained_coarse_hit@10",
        "trained_fine_recall@100", "trained_fine_mrr@10",
        "trained_fine_recall@100_beam_major",
        "trained_fine_mrr@10_beam_major",
        "trained_ndoc_per_query", "cluster_sizes", "value",
        "corpus_dtype", "batch", "cap")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sizes = [int(s) for s in os.environ.get(
        "SC_SIZES", "1000000,2210455,4420911,8841823").split(",")]
    dtype = os.environ.get("SC_DTYPE", "int8")
    side_dir = os.environ.get("SC_STAGE_DIR",
                              osp.join(REPO, "data", "scaling_stages"))
    out_p = os.environ.get("SC_OUT", osp.join(REPO, "SCALING_r05.json"))
    timeout = int(os.environ.get("SC_TIMEOUT", 3000))
    os.makedirs(side_dir, exist_ok=True)

    # optional cap sweep at the largest size (the recall/throughput
    # trade of the fine-stage row budget): SC_CAPS="1024,2048"
    jobs = [(n, None) for n in sizes]
    for cap in [int(c) for c in os.environ.get("SC_CAPS", "").split(",")
                if c]:
        jobs.append((sizes[-1], cap))

    for ndoc, cap in jobs:
        tag = f"size_{ndoc}_{dtype}" + (f"_cap{cap}" if cap else "")
        side_p = osp.join(side_dir, f"{tag}.json")
        if osp.exists(side_p) and not os.environ.get("SC_FRESH"):
            log(f"{tag}: cached")
            continue
        env = dict(os.environ, BENCH_CHILD=str(ndoc), BENCH_DTYPE=dtype)
        if cap:
            env["BENCH_CAP"] = str(cap)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, osp.join(REPO, "bench.py")], env=env,
                stdout=subprocess.PIPE, timeout=timeout)
        except subprocess.TimeoutExpired:
            log(f"size {ndoc}: child timed out")
            continue
        line = next((x for x in reversed(
            r.stdout.decode().strip().splitlines())
            if x.startswith("{")), None)
        if r.returncode != 0 or not line:
            log(f"size {ndoc}: child failed rc={r.returncode}")
            continue
        obj = json.loads(line)
        row = {k: obj[k] for k in KEEP if k in obj}
        row["secs"] = round(time.time() - t0, 1)
        with open(side_p, "w") as fw:
            fw.write(json.dumps(row) + "\n")
        log(f"size {ndoc}: fine recall@100 "
            f"{row.get('trained_fine_recall@100')} "
            f"({row['secs']}s)")

    rows = []
    for ndoc, cap in jobs:
        tag = f"size_{ndoc}_{dtype}" + (f"_cap{cap}" if cap else "")
        side_p = osp.join(side_dir, f"{tag}.json")
        if osp.exists(side_p):
            with open(side_p) as fr:
                rows.append(json.load(fr))
    out = {"metric": "trained_recall_vs_corpus_size", "dtype": dtype,
           "bundle": os.environ.get("BENCH_CKPT", "auto"),
           "curve": rows}
    with open(out_p, "w") as fw:
        fw.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
