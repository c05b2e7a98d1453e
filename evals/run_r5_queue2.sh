#!/bin/bash
# Round-5 queue 2 (chains after queue1): config-3 at 1M — VERDICT #2,
# deferred two rounds. Embed 1M chunks with bert-base on-chip, build
# R=48/L=96 single-pass, prune, dedup-cached recompute rows. bf16
# cache (1.5GB at 1M x 768) keeps the pruned engine in HBM budget.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r5_results.jsonl
LOGS=evals/artifacts/r5_logs
ADIR=evals/artifacts
mkdir -p "$LOGS"

if [ -f /tmp/queue1.pid ]; then
  while kill -0 "$(cat /tmp/queue1.pid)" 2>/dev/null; do sleep 30; done
fi

retry_run() { # name, timeout_s, attempts, cmd... (resume via ckpt)
  local name=$1 t=$2 att=$3; shift 3
  for i in $(seq 1 "$att"); do
    echo "=== $name attempt $i $(date -u +%H:%M:%S) ===" >&2
    if timeout "$t" "$@" >>"$OUT" 2>>"$LOGS/$name.log"; then
      echo "--- $name OK $(date -u +%H:%M:%S)" >&2; return 0
    fi
    echo "--- $name attempt $i failed rc=$? $(date -u +%H:%M:%S)" >&2
    sleep 20
  done
  echo "--- $name FAILED after $att attempts" >&2; return 1
}

retry_run config3_1m 14400 2 \
  env RS_N=1000000 RS_T=48 RS_R=48 RS_L=96 RS_PASSES=1 \
      RS_BEAMS=64,96 RS_VISITED=512 \
      RS_CKPT="$ADIR/config3_1m_build.ckpt" \
      LEANN_RECOMPUTE_CACHE_DTYPE=bf16 LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

echo "queue2 done $(date -u +%H:%M:%S)" >&2
