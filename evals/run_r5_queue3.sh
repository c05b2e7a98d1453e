#!/bin/bash
# Round-5 queue 3 (chains after queue2):
#   1. ivf8 Pallas bucket-scan A/B at 10M and 1M (VERDICT #5): same
#      engine/knobs, scan swapped via LEANN_IVF8_PALLAS
#   2. PQ fused kernel on 768-d BERT-fixture text embeddings
#      (VERDICT #8): m=64 48:1 and m=16 192:1, both OPQ
#   3. QPS-vs-clients curve at window=0 (the best config per the
#      slot-gate rows; queue1's curve ran window=8)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r5_results.jsonl
LOGS=evals/artifacts/r5_logs
mkdir -p "$LOGS"

if [ -f /tmp/queue2.pid ]; then
  while kill -0 "$(cat /tmp/queue2.pid)" 2>/dev/null; do sleep 30; done
fi

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name $(date -u +%H:%M:%S) ===" >&2
  if timeout "$t" "$@" >>"$OUT" 2>"$LOGS/$name.log"; then
    echo "--- $name OK $(date -u +%H:%M:%S)" >&2
  else
    echo "--- $name FAILED rc=$? (see $LOGS/$name.log) $(date -u +%H:%M:%S)" >&2
  fi
}

# re-queued from queue1: its first attempt started 13s after the
# previous chip client exited and wedged on a mid-restart worker
# (etime 12m, cpu 7s — no dispatch ever completed)
run recompute_100k_dedup 7200 \
  env RS_N=100000 RS_R=48 RS_L=96 RS_BEAMS=64,96 RS_VISITED=512 \
      LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

sleep 45

run ivf8_pallas_10m 4800 \
  env LEANN_IVF8_PALLAS=1 \
  python evals/device_time.py --backend ivf8 --n 10000000 --d 96 --b 512

run pq_text_m64 5400 \
  python evals/pq_device_check.py --n 200000 --corpus text --m 64 --opq \
    --b 2048 --beam 64 --visited 256

run curve_w0 3000 \
  bash -c '
    for c in 8 64 128; do
      # settle: starting a chip client seconds after the previous one
      # exits can catch the TPU worker mid-restart ("TPU backend error
      # (Internal)" killed the w8 64-client run, queue1)
      sleep 45
      python evals/hybrid_latency.py --n 1000000 --d 128 --clients $c \
        --duration 20 --windows 0
    done'

run ivf8_pallas_1m 3600 \
  env LEANN_IVF8_PALLAS=1 \
  python evals/device_time.py --backend ivf8 --n 1000000 --d 128 --b 2048

run pq_text_m16 3600 \
  python evals/pq_device_check.py --n 200000 --corpus text --m 16 --opq \
    --coarse 2 --b 2048 --beam 64 --visited 256

echo "queue3 done $(date -u +%H:%M:%S)" >&2
