#!/bin/bash
# Round-4 TPU queue 1: 1M-scale truth rows (after build_1m + drift row).
# Appends JSON rows to r4_results.jsonl; per-step logs in r4_logs/.
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

# PQ fused kernel first-hardware shakeout at 1M (VERDICT #1 lead row;
# sim predicts the honest negative recall ~0.17 @ b64 on this corpus)
run pq_1m 2700 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 16 --ksub 256

# sharded hardware shakeout (VERDICT #9)
run sharded_fused 1800 \
  python evals/sharded_device_check.py --n 1000000 --d 128
run sharded_pq 1800 \
  python evals/sharded_device_check.py --n 1000000 --d 128 --engine pq

# batch-scaling row (VERDICT #10)
run flat_ivf_8k 2400 \
  python evals/device_time.py --backend flat,ivf --n 1000000 --d 128 \
    --b 8192 --m 32

# residual (two-level) ADC at 1M — same 16B/node, unchanged kernel
run pq_1m_res 3600 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 12 --coarse 2 \
    --ksub 256

echo "queue1 done $(date -u +%H:%M:%S)" >&2
