#!/bin/bash
# Round-5 queue 8: config-3 1M endgame. v2 (two-pass R48/L96 graph)
# closed at 0.9277 @ beam 128 with beam/visited saturated — visited
# 1024 -> 2048 changed nothing, beam 96 -> 128 added +0.003. The
# residual misses are entry/graph-coverage bound, so:
#   v3: 8x the query-adaptive seed pool (1024 -> 8192). At 1M a 1024
#       pool is 0.1% corpus coverage vs the 1% that delivered 0.9625
#       at 100k; seeds are the one knob whose cost is a ONE-TIME
#       encode (~8s) + a tiny per-query entry matmul. Embed + graph
#       come from the new disk caches / build ckpt, so this step is
#       sweep-dominated.
#   v4 (only if v3 < 0.95): denser graph R=64/L=128 from the cached
#       embeddings (storage win 7.9x -> ~6.6x, still strong).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r5_results.jsonl
LOGS=evals/artifacts/r5_logs
ADIR=evals/artifacts
mkdir -p "$LOGS"

DEADLINE=${R5Q8_DEADLINE:-$(( $(date +%s) + 14400 ))}

guard() {
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "--- deadline reached, stopping $(date -u +%H:%M:%S)" >&2
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
  sleep 45
}

run config3_1m_v3 5400 \
  env RS_N=1000000 RS_T=48 RS_R=48 RS_L=96 RS_PASSES=2 \
      RS_BEAMS=96,128 RS_VISITED=1024 \
      RS_CKPT="$ADIR/config3_1m_v2_build.ckpt" \
      LEANN_RECOMPUTE_SEEDS=8192 \
      LEANN_RECOMPUTE_CACHE_DTYPE=bf16 LEANN_BUILD_STALL_S=900 \
  python evals/recompute_scale.py

# third hardware attempt for the 1M Pallas arm: attempt 1 died in
# Mosaic lowering (block shapes, fixed 2670259), attempt 2 overflowed
# SMEM with the B=2048 probe table (chunked in 377df56)
run ivf8_pallas_1m 3600 \
  env LEANN_IVF8_PALLAS=1 \
  python evals/device_time.py --backend ivf8 --n 1000000 --d 128 --b 2048

best=$(python - <<'EOF'
import json
best = 0.0
for line in open("evals/artifacts/r5_results.jsonl"):
    try:
        r = json.loads(line)
    except Exception:
        continue
    if r.get("config") == 3 and r.get("n") == 1000000:
        best = max(best, r.get("recall_at_10", 0.0))
print(f"{best:.4f}")
EOF
)
echo "config-3 1M best recall so far: $best" >&2
if python -c "import sys; sys.exit(0 if float('$best') < 0.95 else 1)"; then
  run config3_1m_v4 9000 \
    env RS_N=1000000 RS_T=48 RS_R=64 RS_L=128 RS_PASSES=2 \
        RS_BEAMS=128 RS_VISITED=1024 \
        RS_CKPT="$ADIR/config3_1m_v4_build.ckpt" \
        LEANN_RECOMPUTE_SEEDS=8192 \
        LEANN_RECOMPUTE_CACHE_DTYPE=bf16 LEANN_BUILD_STALL_S=900 \
    python evals/recompute_scale.py
else
  echo "--- v4 skipped: 0.95 met at R48/L96" >&2
fi

# pq-on-text retries: three ResourceExhausted failures so far, all in
# the 200k x 768 graph build (repack_rows device_put) and all within
# ~1 min of a heavy or abnormally-exited predecessor — while the SAME
# build code at 1M x 768 succeeds in config-3's processes. Working
# theory: the worker reclaims a dead client's HBM asynchronously, so
# these run LAST with 4-minute settles.
sleep 240
run pq_text_m64 5400 \
  python evals/pq_device_check.py --n 200000 --corpus text --m 64 --opq \
    --b 2048 --beam 64 --visited 256
sleep 240
run pq_text_m16 3600 \
  python evals/pq_device_check.py --n 200000 --corpus text --m 16 --opq \
    --coarse 2 --b 2048 --beam 64 --visited 256

echo "queue8 done $(date -u +%H:%M:%S)" >&2
