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

  run_stage eval2 4200 env QF_WORKDIR=$W QF_STAGE=eval \
    QF_OUT=/root/repo/QUALITY_r05.json \
    python scripts/quality_full.py || continue

  run_stage bench2 5400 env BENCH_CKPT=$W \
    bash -c 'python bench.py > /root/repo/BENCH_verify_r05.json' \
    || continue

  log "=== all stages done ==="
  touch /tmp/r05b_all_done
  break
done
