#!/bin/bash
# Round-3 triaged battery for a short chip window (~45 min).
# Runs AFTER the ivf/flat@8k step; ordered quick->long, artifact-producing
# build in the middle so fused/sharded rows can reuse it.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r3_results.jsonl
LOGS=evals/artifacts/r3_logs
mkdir -p "$LOGS"

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name $(date -u +%H:%M:%S) ===" >&2
  if timeout "$t" "$@" >>"$OUT" 2>"$LOGS/$name.log"; then
    echo "--- $name OK $(date -u +%H:%M:%S)" >&2
  else
    echo "--- $name FAILED (see $LOGS/$name.log) $(date -u +%H:%M:%S)" >&2
  fi
}

# config-0 recall parity at 20k x 768 (validates the 4096 seed-pool
# floor on chip; quick)
run config0 1200 python evals/run_eval.py --configs 0 --scale 1.0

# 1M x 128 R48 L80 2-pass pipelined build -> canonical artifact
# (measures VERDICT weak #4 AND feeds every graph row below + bench.py)
run build_1m 2400 env LEANN_BUILD_PROFILE=1 python evals/build_artifact.py

# fused graph engine device-time on the artifact (VERDICT weak #1)
run vamana_1m 1200 \
  python evals/device_time.py --backend vamana --n 1000000 --d 128

# fused kernel under shard_map on the real chip (VERDICT weak #3)
run sharded_fused 900 \
  python evals/sharded_device_check.py --n 1000000 --d 128

# sharded PQ engine on hardware (per-shard DEEP-100M-footprint program)
run sharded_pq 900 \
  python evals/sharded_device_check.py --n 1000000 --d 128 --engine pq

# PQ fused engine 1M shakeout (honest negative on the bench mixture)
run pq_1m 1200 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 16 --ksub 256

echo "session battery done" >&2
