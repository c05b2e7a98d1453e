#!/bin/bash
# Round-4 queue 10: recompute_100k with the segmented traversal (the
# crash was the relay's per-dispatch execution wall limit), a clean
# ivf-pq retiming (queue9's row was contended by a concurrent bisect),
# and the config-4 latency row with the unified-k program lattice +
# deterministic warm.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r4_results.jsonl
LOGS=evals/artifacts/r4_logs
mkdir -p "$LOGS"

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name $(date -u +%H:%M:%S) ===" >&2
  if timeout "$t" "$@" >>"$OUT" 2>"$LOGS/$name.log"; then
    echo "--- $name OK $(date -u +%H:%M:%S)" >&2
  else
    echo "--- $name FAILED (see $LOGS/$name.log) $(date -u +%H:%M:%S)" >&2
  fi
}

run recompute_100k 7200 \
  env RS_R=48 RS_L=96 RS_BEAMS=64,96 RS_VISITED=512 \
      LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

run hybrid_1m 2400 \
  env LEANN_BATCH_DEBUG=1 \
  python evals/hybrid_latency.py --n 1000000 --d 128 --clients 32 \
    --duration 20 --windows 0,2,8

run ivfpq_10m 5400 \
  python evals/ivfpq_device_check.py --n 10000000 --d 96 --nprobe 16 \
    --rescore-factor 64

echo "queue10 done $(date -u +%H:%M:%S)" >&2
