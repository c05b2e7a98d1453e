#!/bin/bash
# Round-5 queue 2 (chains after queue1; strictly serial chip use):
#   1. config-3 at 1M (VERDICT #2, deferred two rounds): embed 1M
#      chunks with bert-base on-chip, single-pass R=48/L=96 build,
#      prune, dedup-cached recompute serve rows. bf16 cache (1.5GB at
#      1M x 768) keeps the whole pruned engine under the HBM budget.
#   2. config-2 10M single-pass E=4 build (resumable; retries pick up
#      the wave checkpoint after a watchdog exit 17)
#   3. refine pass over the 10M artifact (two-pass total; VERDICT #4)
#   4. xla-graph 10M device row vs the refined artifact (target >=0.95)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r5_results.jsonl
LOGS=evals/artifacts/r5_logs
ADIR=evals/artifacts
mkdir -p "$LOGS"

# wait for queue1 (single-tenancy: exactly one chip client)
if [ -f /tmp/queue1.pid ]; then
  while kill -0 "$(cat /tmp/queue1.pid)" 2>/dev/null; do sleep 30; done
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

retry_run() { # name, timeout_s, attempts, cmd... (resume via ckpt)
  local name=$1 t=$2 att=$3; shift 3
  for i in $(seq 1 "$att"); do
    echo "=== $name attempt $i $(date -u +%H:%M:%S) ===" >&2
    if timeout "$t" "$@" >>"$OUT" 2>>"$LOGS/$name.log"; then
      echo "--- $name OK $(date -u +%H:%M:%S)" >&2; return 0
    fi
    echo "--- $name attempt $i failed rc=$? $(date -u +%H:%M:%S)" >&2
    sleep 20
  done
  echo "--- $name FAILED after $att attempts" >&2; return 1
}

retry_run config3_1m 16200 3 \
  env RS_N=1000000 RS_T=48 RS_R=48 RS_L=96 RS_PASSES=1 \
      RS_BEAMS=64,96 RS_VISITED=512 \
      RS_CKPT="$ADIR/config3_1m_build.ckpt" \
      LEANN_RECOMPUTE_CACHE_DTYPE=bf16 LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

retry_run build_10m 13200 4 \
  env ART_N=10000000 ART_D=96 ART_L=64 ART_PASSES=1 ART_EXPANSIONS=4 \
      LEANN_BUILD_STALL_S=900 \
  python evals/build_artifact.py

retry_run refine_10m 13200 3 \
  env LEANN_BUILD_STALL_S=900 \
  python evals/refine_artifact.py --n 10000000 --d 96 --l 64

# serve row for the refined graph (renames to the l64 name the
# device_time default expects only if refine produced the p2 file)
if [ -f "$ADIR/vamana_n10000000_r48_l64p2.npz" ]; then
  run graph10m_row 5400 \
    python evals/device_time.py --backend xla-graph --n 10000000 \
      --d 96 --beam 96 --expansions 2 \
      --artifact "$ADIR/vamana_n10000000_r48_l64p2.npz"
fi

echo "queue2 done $(date -u +%H:%M:%S)" >&2
