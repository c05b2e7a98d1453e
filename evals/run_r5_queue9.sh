#!/bin/bash
# Round-5 queue 9: config-3 1M final push. The R64/L128 two-pass graph
# (v4) reached 0.9484 @ beam 128 / visited 1024 — 0.0016 under the
# 0.95 bar. Both expensive phases are now disk-cached (embed pool +
# graph), so this is sweep-only: wider beam (160) and a 2048 visited
# pool (at R=64 each hop expands more nodes, so the 1024 log can bind
# where it didn't at R=48).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r5_results.jsonl
LOGS=evals/artifacts/r5_logs
mkdir -p "$LOGS"

if [ -f /tmp/r5q8.pid ]; then
  while kill -0 "$(cat /tmp/r5q8.pid)" 2>/dev/null; do sleep 20; done
fi
sleep 45

DEADLINE=${R5Q9_DEADLINE:-$(( $(date +%s) + 4800 ))}
guard() {
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "--- deadline, skipping remaining steps $(date -u +%H:%M:%S)" >&2
    exit 0
  fi
}
guard

echo "=== config3_1m_v5 $(date -u +%H:%M:%S) ===" >&2
if timeout 2400 \
  env RS_N=1000000 RS_T=48 RS_R=64 RS_L=128 RS_PASSES=2 \
      RS_BEAMS=128,160 RS_VISITED=2048 \
      LEANN_RECOMPUTE_SEEDS=8192 \
      LEANN_RECOMPUTE_CACHE_DTYPE=bf16 LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py >>"$OUT" 2>>"$LOGS/config3_1m_v5.log"
then
  echo "--- config3_1m_v5 OK $(date -u +%H:%M:%S)" >&2
else
  echo "--- config3_1m_v5 FAILED rc=$? $(date -u +%H:%M:%S)" >&2
fi
# pq-on-text m64, attempt 4: attempts 1-3 OOMed in the fused build
# engine's repack phase — the auto heuristic (blocks < 9GB, tuned at
# d=128) wrongly chose the fused engine for 200k x 768; with the
# d-aware HBM peak check the auto path now takes the XLA engine
sleep 45
guard
echo "=== pq_text_m64 $(date -u +%H:%M:%S) ===" >&2
if timeout 2700 \
  python evals/pq_device_check.py --n 200000 --corpus text --m 64 --opq \
    --b 2048 --beam 64 --visited 256 >>"$OUT" 2>>"$LOGS/pq_text_m64.log"
then
  echo "--- pq_text_m64 OK $(date -u +%H:%M:%S)" >&2
else
  echo "--- pq_text_m64 FAILED rc=$? $(date -u +%H:%M:%S)" >&2
fi

echo "queue9 done $(date -u +%H:%M:%S)" >&2
