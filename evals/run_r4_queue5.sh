#!/bin/bash
# Round-4 TPU queue 5: after queue4. Closes VERDICT #3's at-scale half
# (pruned-recompute at 1M chunks with the bert-base encoder) and adds a
# 10M graph beam-ladder fallback row for the recall-vs-QPS curve.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r4_results.jsonl
LOGS=evals/artifacts/r4_logs
mkdir -p "$LOGS"

# wait for queue4 (pass its log path via WAIT_LOG)
if [ -n "${WAIT_LOG:-}" ]; then
  echo "waiting for queue4 ($WAIT_LOG) ..." >&2
  while ! grep -q "queue4 done" "$WAIT_LOG" 2>/dev/null; do sleep 30; done
  echo "queue4 done; starting queue5 $(date -u +%H:%M:%S)" >&2
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

# 10M graph serve, beam 96: the recall ladder point between the
# beam-64 rows and a refine pass (config-2 fallback evidence)
run xla_10m_b96 2700 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96 \
    --expansions 4 --beam 96 \
    --artifact evals/artifacts/vamana_n10000000_r48_l64.npz

# pruned-recompute at 1M chunks (VERDICT #3): bert-base encoder inside
# the traversal, single-pass R48 graph, serve-time beam as the recall
# lever. Watchdog exits 17 on a relay wedge; the retry resumes the
# graph build from the wave checkpoint (the embed phase re-runs).
for attempt in 1 2 3; do
  echo "=== recompute_1m attempt $attempt $(date -u +%H:%M:%S) ===" >&2
  if timeout 12600 \
    env RS_N=1000000 RS_R=48 RS_L=96 RS_PASSES=1 RS_BEAMS=96 \
        RS_VISITED=512 RS_CKPT=evals/artifacts/recompute_1m.ckpt \
        LEANN_BUILD_STALL_S=900 \
    python evals/recompute_scale.py >>"$OUT" 2>>"$LOGS/recompute_1m.log"
  then
    echo "--- recompute_1m OK $(date -u +%H:%M:%S)" >&2; break
  fi
  echo "--- recompute_1m attempt $attempt failed $(date -u +%H:%M:%S)" >&2
done

echo "queue5 done $(date -u +%H:%M:%S)" >&2
