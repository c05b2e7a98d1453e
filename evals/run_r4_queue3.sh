#!/bin/bash
# Round-4 TPU queue 3: retries with fixes landed after queue2 started.
#  - pq_1m: attempt 2 hit "compiler_options only on top-level jit"
#    (the many-batch scan body called the wrapped jit; now calls the
#    impl).
#  - pq_1m_res: mf=12 does not divide d=128; the kernel-feasible
#    residual layout at d=128 is mc=2 + mf=16 (+2 norm) = 20 columns —
#    20B/node, vs the 10M x 96 design point where mc2+mf12+2 = 16B.
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

# ivf_10m retry: B=2048 OOM'd — the probed-bucket gather materializes
# B*nprobe*cap*d bf16 (~11GB at 10M). IVF QPS is B-flat (see the
# B-scaling rows), so B=512 is the honest same-throughput config.
run ivf_10m 5400 \
  python evals/device_time.py --backend ivf --n 10000000 --d 96 --b 512

run pq_1m 2700 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 16 --ksub 256

run pq_1m_res 3600 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 16 --coarse 2 \
    --ksub 256

# hybrid retry: first run measured p50 ~900ms — every distinct batcher
# flush size compiled a fresh XLA program over the relay (~30s each).
# Engines now bucket the batch dim pow-2.
run hybrid_1m 1800 \
  python evals/hybrid_latency.py --n 1000000 --d 128 --clients 32 \
    --duration 20 --windows 0,2,8

echo "queue3 done $(date -u +%H:%M:%S)" >&2
