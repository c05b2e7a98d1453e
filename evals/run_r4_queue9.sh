#!/bin/bash
# Round-4 queue 9: hardware rows for the two root-cause fixes
# (residual-int8 payloads; chunked recompute encoder forwards).
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

# 1. recompute at 100k with chunked per-hop forwards (the two worker
#    crashes were the unchunked ~12k-sequence live set)
run recompute_100k 5400 \
  env RS_R=48 RS_L=96 RS_BEAMS=64,96 RS_VISITED=512 \
      LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

# 2. residual-int8 retries (host replication predicts ~0.96 at 1M)
run ivf8_1m 2400 \
  python evals/device_time.py --backend ivf8 --n 1000000 --d 128 --b 2048

run ivf8_10m 5400 \
  python evals/device_time.py --backend ivf8 --n 10000000 --d 96 --b 512

# 3. ivf-pq 10M with residual-int8 rescore (the 0.8428 row's loss was
#    the raw-int8 rescore, not ADC survival)
run ivfpq_10m 5400 \
  python evals/ivfpq_device_check.py --n 10000000 --d 96 --nprobe 16 \
    --rescore-factor 64

echo "queue9 done $(date -u +%H:%M:%S)" >&2
