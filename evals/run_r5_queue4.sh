#!/bin/bash
# Round-5 queue 4 (chains after queue3, runs LAST by design): the
# config-2 10M two-pass E=4 graph (VERDICT #4) is the most expensive
# (~3h) and has a sanctioned fallback (re-scope to ivf8 with the
# decision recorded), so it must not starve the guaranteed rows in
# queue3. Build is wave-checkpointed; retries resume.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r5_results.jsonl
LOGS=evals/artifacts/r5_logs
ADIR=evals/artifacts
mkdir -p "$LOGS"

if [ -f /tmp/queue3.pid ]; then
  while kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; do sleep 30; done
fi

retry_run() { # name, timeout_s, attempts, cmd...
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

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name $(date -u +%H:%M:%S) ===" >&2
  if timeout "$t" "$@" >>"$OUT" 2>"$LOGS/$name.log"; then
    echo "--- $name OK $(date -u +%H:%M:%S)" >&2
  else
    echo "--- $name FAILED rc=$? (see $LOGS/$name.log) $(date -u +%H:%M:%S)" >&2
  fi
}

retry_run build_10m 10800 4 \
  env ART_N=10000000 ART_D=96 ART_L=64 ART_PASSES=1 ART_EXPANSIONS=4 \
      LEANN_BUILD_STALL_S=900 \
  python evals/build_artifact.py

retry_run refine_10m 10800 3 \
  env LEANN_BUILD_STALL_S=900 \
  python evals/refine_artifact.py --n 10000000 --d 96 --l 64

if [ -f "$ADIR/vamana_n10000000_r48_l64p2.npz" ]; then
  run graph10m_row 5400 \
    python evals/device_time.py --backend xla-graph --n 10000000 \
      --d 96 --beam 96 --expansions 2 \
      --artifact "$ADIR/vamana_n10000000_r48_l64p2.npz"
fi

echo "queue4 done $(date -u +%H:%M:%S)" >&2
