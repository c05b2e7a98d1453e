#!/bin/bash
# Round-5 queue 1 (strictly serial; single-tenancy — memory:
# axon-relay-limits). Steps:
#   1. hybrid_1m re-run with the batcher slot-gate fix (flush sizes
#      were 1-7 under load; VERDICT #1's residual-600ms root cause)
#   2. serving QPS-vs-clients curve (VERDICT #9)
#   3. recompute 100k with the cross-query dedup cache (VERDICT #3;
#      baseline: r4 row 1.92 QPS @ 0.9586, same knobs)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r5_results.jsonl
LOGS=evals/artifacts/r5_logs
mkdir -p "$LOGS"

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name $(date -u +%H:%M:%S) ===" >&2
  if timeout "$t" "$@" >>"$OUT" 2>"$LOGS/$name.log"; then
    echo "--- $name OK $(date -u +%H:%M:%S)" >&2
  else
    echo "--- $name FAILED rc=$? (see $LOGS/$name.log) $(date -u +%H:%M:%S)" >&2
  fi
}

run hybrid_1m_slotgate 2400 \
  env LEANN_BATCH_DEBUG=1 \
  python evals/hybrid_latency.py --n 1000000 --d 128 --clients 32 \
    --duration 20 --windows 0,2,8

run hybrid_clients_curve 3600 \
  bash -c '
    for c in 8 64 128; do
      python evals/hybrid_latency.py --n 1000000 --d 128 --clients $c \
        --duration 20 --windows 8
    done'

run recompute_100k_dedup 7200 \
  env RS_N=100000 RS_R=48 RS_L=96 RS_BEAMS=64,96 RS_VISITED=512 \
      LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

echo "queue1 done $(date -u +%H:%M:%S)" >&2
