#!/bin/bash
# Round-4 queue 7: post-VM-restart session. The restart wiped every
# generated artifact (pools, the 1M vamana graph, r4_results.jsonl,
# logs, jax cache) — RESULTS_r4.md holds the committed rows; this queue
# (a) restores the bench headline artifact and (b) runs the still-
# pending hardware rows, strictly serially (single-tenancy lesson,
# RESULTS_r4 §4c). Deadline-guarded so the driver's end-of-round
# bench.py never contends for the chip.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r4_results.jsonl
LOGS=evals/artifacts/r4_logs
mkdir -p "$LOGS"

DEADLINE_EPOCH=${DEADLINE_EPOCH:-0}

wait_ready() { # sentinel path
  while [ ! -f "$1" ]; do sleep 15; done
}

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE_EPOCH" -gt 0 ]; then
    local now rem
    now=$(date +%s); rem=$((DEADLINE_EPOCH - now))
    if [ "$rem" -lt 180 ]; then
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

# 0. the 1M pool must exist before any 1M step (warm_pools.py touches
# the sentinel only after np.save returns — see that file's docstring)
wait_ready evals/artifacts/pool_n1000000_d128_c1024_s0.npy.ready

# 1. restore the bench headline artifact (2-pass fused build, the
# committed BENCH_r03 configuration; expected ~1400s cold-cache)
run build_1m 3300 \
  env LEANN_BUILD_STALL_S=900 python evals/build_artifact.py

# 2. config-4 retry: pow-2 batch bucketing landed after the first run
# measured ~900ms p50 from per-flush-size recompiles (RESULTS_r4 §6)
run hybrid_1m 2100 \
  python evals/hybrid_latency.py --n 1000000 --d 128 --clients 32 \
    --duration 20 --windows 0,2,8

# 3. pruned-recompute at 100k, target >= 0.95 (VERDICT #3 first half;
# adaptive wave size fix landed after the 768d OOM)
run recompute_100k 4800 \
  env RS_R=48 RS_L=96 RS_BEAMS=96 RS_VISITED=512 \
      LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

# 4. int8-payload IVF at 1M (new engine's first 1M row)
run ivf8_1m 2100 \
  python evals/device_time.py --backend ivf8 --n 1000000 --d 128 --b 2048

# 10M steps need the big pool
wait_ready evals/artifacts/pool_n10000000_d96_c1024_s0.npy.ready

# 5. IVF-PQ 10M with decompose-pinned knobs (coverage 1.0 @ nprobe 16;
# the 0.7999 first row was the ADC top-C cut, fixed by rf=64 —
# RESULTS_r4 §7a)
run ivfpq_10m 5400 \
  python evals/ivfpq_device_check.py --n 10000000 --d 96 --nprobe 16 \
    --rescore-factor 64

# 6. int8-payload IVF at 10M: THE device-resident 10M IVF row (plain
# f32 IVF OOMs: 17.8G padded corpus + bf16 bucket copies vs 15.75G HBM)
run ivf8_10m 5400 \
  python evals/device_time.py --backend ivf8 --n 10000000 --d 96 --b 512

# 7. residual-PQ 1M row (kernel-feasible layout at d=128: mc=2 + mf=16)
run pq_1m_res 3600 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 16 --coarse 2 \
    --ksub 256

echo "queue7 done $(date -u +%H:%M:%S)" >&2
