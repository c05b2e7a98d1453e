#!/bin/bash
# 10M single-pass E=4 vamana build with resume-on-stall: the watchdog
# exits 17 on a wedged relay dispatch and the next attempt resumes from
# the wave checkpoint (leann_tpu/ops/vamana.py).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export ART_N=10000000 ART_D=96 ART_L=64 ART_PASSES=1 ART_EXPANSIONS=4
LOG=evals/artifacts/r4_logs/build_10m_p1.log
for attempt in 1 2 3 4 5 6; do
  echo "=== build attempt $attempt $(date -u +%H:%M:%S)" >>"$LOG"
  python evals/build_artifact.py >>"$LOG" 2>&1
  rc=$?
  [ $rc -eq 0 ] && { echo "=== build OK $(date -u +%H:%M:%S)" >>"$LOG"; exit 0; }
  echo "=== attempt $attempt rc=$rc $(date -u +%H:%M:%S)" >>"$LOG"
  sleep 20
done
echo "=== build FAILED after retries" >>"$LOG"
exit 1
