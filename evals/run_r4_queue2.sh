#!/bin/bash
# Round-4 TPU queue 2: config-4 latency, the 10M block, recompute, and
# the 10M graph ladder (single-pass build -> serve rows -> refine ->
# re-measure). Ordered so truth rows land at every step even if the
# round ends mid-ladder (VERDICT r3 #1: ship measurements, not scripts).
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

# pq_1m retry: first attempt hit the Mosaic scoped-vmem OOM (54.76M
# stack vs 16M limit); retried with the raised per-jit limit. PQ
# codebooks/codes are cached from the first attempt.
run pq_1m 2700 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 16 --ksub 256

# sharded retries: first attempts round-tripped the 6GB packed blocks
# through the host relay (fixed: blocks stay on device) / timed out in
# host PQ prep
run sharded_fused 2700 \
  python evals/sharded_device_check.py --n 1000000 --d 128
run sharded_pq 2700 \
  python evals/sharded_device_check.py --n 1000000 --d 128 --engine pq

# config 4: hybrid p50/p99 at 1M through the HTTP server + batcher
run hybrid_1m 1800 \
  python evals/hybrid_latency.py --n 1000000 --d 128 --clients 32 \
    --duration 20 --windows 0,2,8

# DEEP-10M IVF as a DEVICE-TIME row (VERDICT #2)
run ivf_10m 5400 \
  python evals/device_time.py --backend ivf --n 10000000 --d 96

# IVF-PQ at DEEP-10M (the 100M-class one-chip footprint)
run ivfpq_10m 7200 \
  python evals/ivfpq_device_check.py --n 10000000 --d 96 --nprobe 16

# pruned-recompute at 100k with the r3 levers, trimmed to the target
# config (VERDICT #3: >= 0.95)
run recompute_100k 5400 \
  env RS_R=48 RS_L=96 RS_BEAMS=96 RS_VISITED=512 \
  python evals/recompute_scale.py

# 10M graph ladder: single-pass E=4 build first (cheapest artifact)...
run build_10m_p1 10800 \
  env ART_N=10000000 ART_D=96 ART_L=64 ART_PASSES=1 ART_EXPANSIONS=4 \
  python evals/build_artifact.py
# ...then serve rows on it (E=2 and E=4)
run xla_10m_p1 2700 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96
run xla_10m_p1_e4 2700 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96 \
    --expansions 4
# ...then the refine pass (resumable second pass) and re-measure
run refine_10m 14400 \
  python evals/refine_artifact.py --n 10000000 --d 96 --l 64
run xla_10m_p2 2700 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96 \
    --artifact evals/artifacts/vamana_n10000000_r48_l64p2.npz
run xla_10m_p2_e4 2700 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96 \
    --expansions 4 \
    --artifact evals/artifacts/vamana_n10000000_r48_l64p2.npz

# opportunistic tail: gather roofline + PQ positive-regime row
run gather_10m 3600 \
  python evals/gather_roofline.py --n 10000000 --b 2048 --r 48
run pq_lowdim_500k 7200 \
  python evals/pq_device_check.py --n 500000 --d 96 --m 16 --ksub 256 \
    --corpus lowdim --opq --rescore bf16

echo "queue2 done $(date -u +%H:%M:%S)" >&2
