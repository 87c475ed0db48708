#!/bin/bash
# Round-5 chip measurement queue (CLAUDE.md tunnel-outage pattern):
# waits for the tunneled TPU to answer, then runs the full capture
# sequence with per-stage sentinels (/tmp/r05_done_*) so a re-run after
# an outage resumes at the failed stage. One chip process at a time.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/mevi_jax_cache
cd /root/repo
W=/root/repo/data/quality_r05
LOG=${R05_LOG:-/tmp/r05_queue.log}

log() { echo "$(date -u +%F,%H:%M:%S) $*" >> "$LOG"; }

probe() {
  timeout 2700 python -c \
    "import jax; print(jax.devices()[0].platform)" 2>/dev/null \
    | grep -q .
}

wait_up() {
  while true; do
    [ -f /tmp/tpu_up ] && return 0
    # a separate watcher owns probing while alive (avoid two clients
    # racing for the single chip claim); its pid is exported as
    # R05_WATCHER_PID by the launcher
    if [ -n "${R05_WATCHER_PID:-}" ] && [ -e "/proc/$R05_WATCHER_PID" ]
    then
      sleep 120
      continue
    fi
    log "probing chip..."
    probe && { touch /tmp/tpu_up; return 0; }
    log "chip down; sleeping 240s"
    sleep 240
  done
}

run_stage() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  [ -f "/tmp/r05_done_$name" ] && return 0
  log "stage $name start: $*"
  if timeout "$tmo" "$@" >> "$LOG" 2>&1; then
    touch "/tmp/r05_done_$name"; log "stage $name OK"; return 0
  fi
  log "stage $name FAILED rc=$?"
  rm -f /tmp/tpu_up          # re-probe before the next attempt
  return 1
}

for attempt in 1 2 3 4 5 6 7 8; do
  log "=== attempt $attempt ==="
  wait_up

  # data stage is normally pre-staged on CPU; run it here if missing
  run_stage data 3600 env QF_WORKDIR=$W QF_STAGE=data QF_EPOCHS=4 \
    python scripts/quality_full.py || continue

  TRAIN_RESUME=""
  [ -f /tmp/r05_train_started ] && TRAIN_RESUME="QF_RESUME=1"
  touch /tmp/r05_train_started
  run_stage train 12000 env QF_WORKDIR=$W QF_STAGE=train QF_EPOCHS=4 \
    QF_SCAN=16 $TRAIN_RESUME python scripts/quality_full.py || continue

  TOWER_RESUME=""
  [ -f /tmp/r05_tower_started ] && TOWER_RESUME="QF_TOWER_RESUME=1"
  touch /tmp/r05_tower_started
  run_stage tower 9000 env QF_WORKDIR=$W QF_STAGE=tower \
    QF_TOWER_STEPS=24000 $TOWER_RESUME \
    python scripts/quality_full.py || continue

  run_stage eval 4200 env QF_WORKDIR=$W QF_STAGE=eval \
    QF_OUT=/root/repo/QUALITY_r05.json \
    python scripts/quality_full.py || continue

  # quick chip stages first so short windows still land artifacts
  run_stage beamtrace 3000 python scripts/beam_trace.py || continue

  run_stage bench 5400 env BENCH_CKPT=$W \
    bash -c 'python bench.py > /root/repo/BENCH_verify_r05.json' \
    || continue

  run_stage nqadc 4200 env NQ_STAGE=adc \
    python scripts/nq_scale_demo.py || continue

  run_stage scaling 12000 env BENCH_CKPT=$W SC_CAPS=1024,2048 \
    python scripts/scaling_curve.py || continue

  # CPU-only: DP-infer parity of the fresh bundle on the virtual mesh
  run_stage sharded_r05 7200 env QF_STAGE=sharded QF_SHARD_B=16 \
    QF_WORKDIR=$W python scripts/quality_full.py || continue

  log "=== all stages done ==="
  touch /tmp/r05_all_done
  break
done
