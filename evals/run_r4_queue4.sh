#!/bin/bash
# Round-4 TPU queue 4: everything after build_10m_p1 (which this
# script waits for). Ordered so truth rows land at every step even if
# the round ends mid-ladder. Fixes landed since queue2/3:
#  - adaptive vamana wave size (recompute_100k OOM at 768d)
#  - gather-free one-hot ADC in ivf_pq (15.7s/batch -> matmul-shaped)
#  - ivfpq rf=64 per evals/ivfpq_decompose.py (ADC top-C cut was the
#    binding constraint: rf16 0.88 -> rf64 0.99 of covered oracle)
#  - new int8-payload IVF engine (ops/ivf_int8.py)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r4_results.jsonl
LOGS=evals/artifacts/r4_logs
mkdir -p "$LOGS"

# wait for the in-flight 10M build (if still running)
if [ -n "${WAIT_PID:-}" ]; then
  echo "waiting for build pid $WAIT_PID ..." >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "build done $(date -u +%H:%M:%S)" >&2
fi

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name $(date -u +%H:%M:%S) ===" >&2
  if timeout "$t" "$@" >>"$OUT" 2>"$LOGS/$name.log"; then
    echo "--- $name OK $(date -u +%H:%M:%S)" >&2
  else
    echo "--- $name FAILED (see $LOGS/$name.log) $(date -u +%H:%M:%S)" >&2
  fi
}

# 10M graph serve rows on the fresh single-pass E=4 artifact (VERDICT #2)
run xla_10m_p1 2700 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96 \
    --artifact evals/artifacts/vamana_n10000000_r48_l64.npz
run xla_10m_p1_e4 2700 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96 \
    --expansions 4 \
    --artifact evals/artifacts/vamana_n10000000_r48_l64.npz

# DEEP-10M IVF device row (B=512: the B=2048 probed-bucket gather
# transient OOM'd; QPS is B-flat per the B-scaling rows)
run ivf_10m 5400 \
  python evals/device_time.py --backend ivf --n 10000000 --d 96 --b 512

# int8-payload IVF at 10M and 1M (new engine; kmeans cached at 10M)
run ivf8_10m 5400 \
  python evals/device_time.py --backend ivf8 --n 10000000 --d 96 --b 512
run ivf8_1m 2700 \
  python evals/device_time.py --backend ivf8 --n 1000000 --d 128 --b 2048

# PQ fused-kernel device rows (nested-jit compiler_options fix landed)
run pq_1m 2700 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 16 --ksub 256

# config 4 retry: pow-2 batch bucketing landed after the first run
# measured ~900ms p50 from per-flush-size recompiles
run hybrid_1m 1800 \
  python evals/hybrid_latency.py --n 1000000 --d 128 --clients 32 \
    --duration 20 --windows 0,2,8

# pruned-recompute at 100k, target >= 0.95 (adaptive wave fix landed)
run recompute_100k 5400 \
  env RS_R=48 RS_L=96 RS_BEAMS=96 RS_VISITED=512 \
  python evals/recompute_scale.py

# IVF-PQ 10M retry: one-hot ADC + rf=64 (decompose-pinned knobs)
run ivfpq_10m 7200 \
  python evals/ivfpq_device_check.py --n 10000000 --d 96 --nprobe 16 \
    --rescore-factor 64

# residual-PQ 1M row (kernel-feasible layout at d=128: mc=2 + mf=16)
run pq_1m_res 3600 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 16 --coarse 2 \
    --ksub 256

echo "queue4 done $(date -u +%H:%M:%S)" >&2
