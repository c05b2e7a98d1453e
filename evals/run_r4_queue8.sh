#!/bin/bash
# Round-4 queue 8: retries for queue7's two failures, strictly serial
# (single-tenancy, RESULTS_r4 §4c).
#
# 1. pq_1m_res — first attempt died in AOT compile: the residual
#    (coarse=2 + fine=16) ADC needs 68.9MB scoped vmem vs the 64MB
#    limit set in round 4's first fix. pallas_kernels.tpu_compiler_options
#    now requests 80MB (v5e VMEM is 128MB).
# 2. recompute_100k — first attempt died with "TPU worker process
#    crashed" at the FIRST search execute (beam 96, visited 512; the
#    embed + graph build phases completed). Pure-XLA program, so retry
#    with a progressive beam ladder to find/ride out the fault point.
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

# 0. hybrid serving retry #2: plain+hybrid now share one device
#    dispatch per flush, BM25 scores once per row, warmup compiles the
#    real pow-2 flush buckets (the first retry still sat at ~930ms p50
#    because each mix was its own ~90ms relay dispatch)
run hybrid_1m 2400 \
  python evals/hybrid_latency.py --n 1000000 --d 128 --clients 32 \
    --duration 20 --windows 0,2,8

run pq_1m_res 3600 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 16 --coarse 2 \
    --ksub 256

run recompute_100k 5400 \
  env RS_R=48 RS_L=96 RS_BEAMS=64,96 RS_VISITED=512 \
      LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

echo "queue8 done $(date -u +%H:%M:%S)" >&2
