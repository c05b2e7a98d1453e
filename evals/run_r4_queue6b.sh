#!/bin/bash
# Round-4 master queue (queue6): everything still pending, SERIAL.
# Lesson of tonight: two chip clients starve each other through the
# relay (the "wedges" were queue2 steps contending with the rebuilt 10M
# build) — exactly one chip job may exist at a time. This queue chains
# after queue3 (WAIT_PID) and is the only launcher of chip work.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r4_results.jsonl
LOGS=evals/artifacts/r4_logs
mkdir -p "$LOGS"

if [ -n "${WAIT_PID:-}" ]; then
  echo "waiting for queue3 pid $WAIT_PID ..." >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "queue3 gone; starting $(date -u +%H:%M:%S)" >&2
fi

# hard deadline: the round driver runs bench.py on the chip after the
# session's turns end — nothing of ours may still hold the chip then.
# Steps are skipped once past DEADLINE_EPOCH and each step's timeout is
# clamped to the time remaining.
DEADLINE_EPOCH=${DEADLINE_EPOCH:-0}

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE_EPOCH" -gt 0 ]; then
    local now rem
    now=$(date +%s); rem=$((DEADLINE_EPOCH - now))
    if [ "$rem" -lt 120 ]; then
      echo "=== $name SKIPPED (past deadline) $(date -u +%H:%M:%S)" >&2
      return
    fi
    [ "$t" -gt "$rem" ] && t=$rem
  fi
  echo "=== $name $(date -u +%H:%M:%S) ===" >&2
  if timeout "$t" "$@" >>"$OUT" 2>"$LOGS/$name.log"; then
    echo "--- $name OK $(date -u +%H:%M:%S)" >&2
  else
    echo "--- $name FAILED (see $LOGS/$name.log) $(date -u +%H:%M:%S)" >&2
  fi
}

# IVF-PQ 10M with decompose-pinned knobs (coverage 1.0 @ nprobe 16;
# the 0.80 first row was the ADC top-C cut, fixed by rf=64)
run ivfpq_10m 7200 \
  python evals/ivfpq_device_check.py --n 10000000 --d 96 --nprobe 16 \
    --rescore-factor 64

# int8-payload IVF (new engine) at 10M and 1M — moved ahead of the
# long recompute steps: plain IVF at 10M OOMs device-resident (17.8G
# vs 15.75G HBM: padded f32 corpus + bf16 bucket copies at d=96->128
# lane padding), so ivf8 IS the 10M device-resident IVF row.
run ivf8_10m 5400 \
  python evals/device_time.py --backend ivf8 --n 10000000 --d 96 --b 512
run ivf8_1m 2700 \
  python evals/device_time.py --backend ivf8 --n 1000000 --d 128 --b 2048

# pruned-recompute at 100k, target >= 0.95 (adaptive wave fix landed)
run recompute_100k 5400 \
  env RS_R=48 RS_L=96 RS_BEAMS=96 RS_VISITED=512 \
      LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

# pruned-recompute at 1M chunks (VERDICT #3 at scale): bert-base
# encoder inside the traversal, single-pass R48 graph. Watchdog exits
# 17 on a relay wedge; retry resumes the graph build from checkpoint.
for attempt in 1 2; do
  T=12600
  if [ "$DEADLINE_EPOCH" -gt 0 ]; then
    REM=$(( DEADLINE_EPOCH - $(date +%s) ))
    [ "$REM" -lt 120 ] && { echo "=== recompute_1m SKIPPED (deadline)" >&2; break; }
    [ "$T" -gt "$REM" ] && T=$REM
  fi
  echo "=== recompute_1m attempt $attempt $(date -u +%H:%M:%S) ===" >&2
  if timeout "$T" \
    env RS_N=1000000 RS_R=48 RS_L=96 RS_PASSES=1 RS_BEAMS=96 \
        RS_VISITED=512 RS_CKPT=evals/artifacts/recompute_1m.ckpt \
        LEANN_BUILD_STALL_S=900 \
    python evals/recompute_scale.py >>"$OUT" 2>>"$LOGS/recompute_1m.log"
  then
    echo "--- recompute_1m OK $(date -u +%H:%M:%S)" >&2; break
  fi
  echo "--- recompute_1m attempt $attempt failed $(date -u +%H:%M:%S)" >&2
done

# 10M single-pass E=4 build, time-boxed: the wave checkpoint persists
# whatever completes (round 5 resumes it). run_build_10m.sh already
# loops resume-on-exit-17.
run build_10m 10800 bash evals/run_build_10m.sh

# serve rows (only useful if the build above completed)
run xla_10m_p1 2700 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96 \
    --artifact evals/artifacts/vamana_n10000000_r48_l64.npz
run xla_10m_p1_e4 2700 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96 \
    --expansions 4 \
    --artifact evals/artifacts/vamana_n10000000_r48_l64.npz

echo "queue6 done $(date -u +%H:%M:%S)" >&2
