#!/bin/bash
# Round-5 queue 5: post-reboot master battery. The mid-round machine
# restart killed queues 1-4 and wiped every untracked artifact (corpus
# pools, the 1M vamana graph, r5_results.jsonl raw rows, .jax_cache).
# This queue re-runs the still-pending steps strictly serially
# (single-tenancy), reordered by VERDICT r4 priority and bounded by a
# deadline guard so the driver's end-of-round bench never contends:
#   1. rebuild the 1M vamana artifact (bench.py's headline fused row
#      needs it on disk at round end)
#   2. recompute_100k with the dedup cache (VERDICT #3 "done" row)
#   3. ivf8 Pallas bucket-scan A/B at 1M (VERDICT #5, cheap arm)
#   4. config-3 at 1M (VERDICT #2 — deferred two rounds, the big one)
#   5. PQ on text embeddings m=64 (VERDICT #8)
#   6. ivf8 baseline+Pallas at 10M (VERDICT #5 at scale)
#   7. PQ text m=16; 8. window-0 client curve (64-client hole)
#   9. 10M two-pass build (VERDICT #4) — LAST: most expensive, has a
#      sanctioned fallback, must not starve guaranteed rows.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r5_results.jsonl
LOGS=evals/artifacts/r5_logs
ADIR=evals/artifacts
mkdir -p "$LOGS"

# no new step starts after this (driver bench needs the chip at round
# end); steps already running are bounded by their own timeouts
DEADLINE=${R5Q5_DEADLINE:-$(( $(date +%s) + 30600 ))}   # default +8.5h

guard() {
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "--- deadline reached, skipping remaining steps $(date -u +%H:%M:%S)" >&2
    exit 0
  fi
}

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  guard
  echo "=== $name $(date -u +%H:%M:%S) ===" >&2
  if timeout "$t" "$@" >>"$OUT" 2>>"$LOGS/$name.log"; then
    echo "--- $name OK $(date -u +%H:%M:%S)" >&2
  else
    echo "--- $name FAILED rc=$? (see $LOGS/$name.log) $(date -u +%H:%M:%S)" >&2
  fi
  # settle: a chip client starting seconds after the previous one exits
  # can catch the TPU worker mid-restart ("TPU backend error (Internal)")
  sleep 45
}

retry_run() { # name, timeout_s, attempts, cmd... (resume via ckpt)
  local name=$1 t=$2 att=$3; shift 3
  for i in $(seq 1 "$att"); do
    guard
    echo "=== $name attempt $i $(date -u +%H:%M:%S) ===" >&2
    if timeout "$t" "$@" >>"$OUT" 2>>"$LOGS/$name.log"; then
      echo "--- $name OK $(date -u +%H:%M:%S)" >&2; sleep 45; return 0
    fi
    echo "--- $name attempt $i failed rc=$? $(date -u +%H:%M:%S)" >&2
    sleep 45
  done
  echo "--- $name FAILED after $att attempts" >&2; return 1
}

# 1. bench headline artifact (717s in r4; wave-checkpointed)
retry_run art_1m 2400 2 \
  env LEANN_BUILD_STALL_S=900 ART_N=1000000 \
  python evals/build_artifact.py

# 2. VERDICT #3: dedup-cache recompute row (r4 baseline: 1.92 QPS @ 0.9586)
run recompute_100k_dedup 7200 \
  env RS_N=100000 RS_R=48 RS_L=96 RS_BEAMS=64,96 RS_VISITED=512 \
      LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

# 3. VERDICT #5 (1M arm): same engine/knobs, scan swapped via env
run ivf8_base_1m 3600 \
  python evals/device_time.py --backend ivf8 --n 1000000 --d 128 --b 2048
run ivf8_pallas_1m 3600 \
  env LEANN_IVF8_PALLAS=1 \
  python evals/device_time.py --backend ivf8 --n 1000000 --d 128 --b 2048

# 4. VERDICT #2: config-3 at 1M (checkpointed; attempt 2 resumes)
retry_run config3_1m 12600 2 \
  env RS_N=1000000 RS_T=48 RS_R=48 RS_L=96 RS_PASSES=1 \
      RS_BEAMS=64,96 RS_VISITED=512 \
      RS_CKPT="$ADIR/config3_1m_build.ckpt" \
      LEANN_RECOMPUTE_CACHE_DTYPE=bf16 LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

# 5. VERDICT #8: PQ fused kernel on 768-d BERT-fixture text embeddings
run pq_text_m64 5400 \
  python evals/pq_device_check.py --n 200000 --corpus text --m 64 --opq \
    --b 2048 --beam 64 --visited 256

# 6. VERDICT #5 (10M arm): corpus gen ~15 min host-side, then A/B
run ivf8_base_10m 4800 \
  python evals/device_time.py --backend ivf8 --n 10000000 --d 96 --b 512
run ivf8_pallas_10m 4800 \
  env LEANN_IVF8_PALLAS=1 \
  python evals/device_time.py --backend ivf8 --n 10000000 --d 96 --b 512

# 7. PQ text, deep-compression arm
run pq_text_m16 3600 \
  python evals/pq_device_check.py --n 200000 --corpus text --m 16 --opq \
    --coarse 2 --b 2048 --beam 64 --visited 256

# 8. window-0 client curve (64-client hole from the w8 curve)
run curve_w0 3000 \
  bash -c '
    for c in 8 64 128; do
      sleep 45
      python evals/hybrid_latency.py --n 1000000 --d 128 --clients $c \
        --duration 20 --windows 0
    done'

# 9. VERDICT #4: 10M two-pass E=4 graph — last by design
retry_run build_10m 10800 3 \
  env ART_N=10000000 ART_D=96 ART_L=64 ART_PASSES=1 ART_EXPANSIONS=4 \
      LEANN_BUILD_STALL_S=900 \
  python evals/build_artifact.py
retry_run refine_10m 10800 2 \
  env LEANN_BUILD_STALL_S=900 \
  python evals/refine_artifact.py --n 10000000 --d 96 --l 64
if [ -f "$ADIR/vamana_n10000000_r48_l64p2.npz" ]; then
  run graph10m_row 5400 \
    python evals/device_time.py --backend xla-graph --n 10000000 \
      --d 96 --beam 96 --expansions 2 \
      --artifact "$ADIR/vamana_n10000000_r48_l64p2.npz"
fi

echo "queue5 done $(date -u +%H:%M:%S)" >&2
