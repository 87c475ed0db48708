#!/bin/bash
# Round-5 follow-up chip queue: eval-stage re-run (beam-major metrics +
# served-arrays npz) and a bench re-capture (beam-major trained keys).
# Same sentinel pattern as r05_queue.sh (/tmp/r05b_done_*).
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/mevi_jax_cache
cd /root/repo
W=/root/repo/data/quality_r05
LOG=${R05B_LOG:-/tmp/r05b_queue.log}

log() { echo "$(date -u +%F,%H:%M:%S) $*" >> "$LOG"; }

probe() {
  timeout 2700 python -c \
    "import jax; print(jax.devices()[0].platform)" 2>/dev/null \
    | grep -q .
}

wait_up() {
  while true; do
    [ -f /tmp/tpu_up_b ] && return 0
    log "probing chip..."
    probe && { touch /tmp/tpu_up_b; return 0; }
    log "chip down; sleeping 240s"
    sleep 240
  done
}

run_stage() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  [ -f "/tmp/r05b_done_$name" ] && return 0
  log "stage $name start: $*"
  if timeout "$tmo" "$@" >> "$LOG" 2>&1; then
    touch "/tmp/r05b_done_$name"; log "stage $name OK"; return 0
  fi
  log "stage $name FAILED rc=$?"
  rm -f /tmp/tpu_up_b
  return 1
}

for attempt in 1 2 3 4 5 6; do
  log "=== attempt $attempt ==="
  wait_up

  run_stage adc16 4200 env NQ_STAGE=adc NQ_ADC_TAG=16 \
    NQ_ADC_LEVELS=16 python scripts/nq_scale_demo.py || continue

  run_stage eval2 4200 env QF_WORKDIR=$W QF_STAGE=eval \
    QF_OUT=/root/repo/QUALITY_r05.json \
    python scripts/quality_full.py || continue

  run_stage bench2 5400 env BENCH_CKPT=$W \
    bash -c 'python bench.py > /root/repo/BENCH_verify_r05.json' \
    || continue

  # seed the top-size scaling sidecar from the fresh bench rung (same
  # harness), then measure the mid sizes live
  python - <<'EOF'
import json, time
src = "data/bench_stages/rung_8841823_int8.json"
dst = "data/scaling_stages/size_8841823_int8.json"
keep = ("ndoc", "trained_coarse_hit@1", "trained_coarse_hit@10",
        "trained_fine_recall@100", "trained_fine_mrr@10",
        "trained_fine_recall@100_beam_major",
        "trained_fine_mrr@10_beam_major",
        "trained_ndoc_per_query", "cluster_sizes", "value",
        "corpus_dtype", "batch", "cap")
obj = json.load(open(src))["result"]
row = {k: obj[k] for k in keep if k in obj}
row["secs"] = None
row["seeded_from"] = "bench rung_8841823_int8 (same BENCH_CHILD harness)"
open(dst, "w").write(json.dumps(row) + "\n")
EOF

  # mid sizes have no sidecars yet -> measured live; the top size is
  # freshly seeded above -> skipped (cached)
  run_stage scaling2 9000 env BENCH_CKPT=$W \
    SC_SIZES=1000000,2210455,4420911,8841823 \
    python scripts/scaling_curve.py || continue

  log "=== all stages done ==="
  touch /tmp/r05b_all_done
  break
done
