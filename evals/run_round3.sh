#!/bin/bash
# Round-3 measurement battery (run on the real TPU chip).
# Fills every TBD row in evals/RESULTS_r3.md. Each step appends JSON to
# evals/artifacts/r3_results.jsonl and full logs to evals/artifacts/r3_logs/.
# Steps are independent; rerun any that fail. Ordered so the quick,
# high-priority rows land first in case the chip window is short; the
# multi-hour steps (10M refine pass, hardness sweep) run last.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
OUT=evals/artifacts/r3_results.jsonl
LOGS=evals/artifacts/r3_logs
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

# 1. device-time truth at 1M x 128: ivf + fused graph (flat already
# done). --trace captures one op-level device profile per backend —
# the roofline evidence behind the amortized numbers (kept in /tmp;
# summarize into RESULTS_r3, don't commit the raw trace).
run ivf_vamana_1m 3600 \
  python evals/device_time.py --backend ivf,vamana --n 1000000 --d 128 \
    --trace /tmp/r3_trace

# 1b. batch-scaling check: flat + ivf at B=8192 (VERDICT r2 next #1)
run flat_ivf_8k 3600 \
  python evals/device_time.py --backend flat,ivf --n 1000000 --d 128 \
    --b 8192

# 6. config-0 recall parity at 20k x 768 (quick; validates the 4096
# seed-pool floor on chip)
run config0 3600 python evals/run_eval.py --configs 0 --scale 1.0

# 4. fused kernel under shard_map on the real chip (Mosaic-in-shard_map
# hardware shakeout; single shard == the per-shard DEEP program)
run sharded_fused 3600 \
  python evals/sharded_device_check.py --n 1000000 --d 128

# 4b. sharded PQ engine (Mosaic PQ kernel in shard_map on hardware;
# single shard == the per-shard DEEP-100M-footprint program)
run sharded_pq 3600 \
  python evals/sharded_device_check.py --n 1000000 --d 128 --engine pq

# 2a. PQ fused engine at 1M x 128 (first-hardware shakeout of the PQ
# kernel; recall at 1M measured by sim first — see RESULTS_r3 2.;
# single-level collapses at 1M too: 0.23 @ beam 96, /tmp/pqsim1m.log)
run pq_1m 3600 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 16 --ksub 256

# 2a'. residual mode at 1M (the fix; same total 16 code columns)
run pq_1m_res 5400 \
  python evals/pq_device_check.py --n 1000000 --d 128 --m 12 --coarse 2 \
    --ksub 256

# 2a''. the PQ engine's POSITIVE regime on chip: intrinsic-dim-16
# corpus (real descriptor corpora live here — RESULTS_r3 section 2
# lowdim sim: 0.97/0.995 recall at 200k) + OPQ rotation folded into
# the LUT. Builds + caches the lowdim 1M graph on first run (~10-25min
# device). This is the PQ engine's headline row; pq_1m above is its
# honest negative on the max-entropy bench mixture.
run pq_lowdim_1m 10800 \
  python evals/pq_device_check.py --n 1000000 --d 96 --m 16 --ksub 256 \
    --corpus lowdim --opq --rescore bf16

# 2a''': rotation + residual composed — the best 16B/node variant on
# the lowdim corpus (sim: 0.977/0.996 vs 0.970/0.995 OPQ alone).
# Reuses the lowdim graph the step above built.
run pq_lowdim_1m_resopq 7200 \
  python evals/pq_device_check.py --n 1000000 --d 96 --m 12 --coarse 2 \
    --ksub 256 --corpus lowdim --opq --rescore bf16

# 2b. XLA row-gather at 10M single-pass graph (the round-2 serving
# path; the refined-graph row below is the flagship)
run xla_10m 7200 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96

# 2b'. random row-gather roofline at 10M: XLA take vs Pallas DMA
# descriptors. Decides whether a pointer-gather traversal kernel
# (VERDICT r2 #2) can beat the XLA path — see ops/gather_score.py.
run gather_10m 3600 \
  python evals/gather_roofline.py --n 10000000 --b 2048 --r 48

# 3. build-wave pipelining: 1M x 128 R48 L80 2-pass end-to-end
# (ART_OUT to a scratch path: the committed artifact must not change
# mid-round — the oracle/PQ caches key on it)
run build_1m 5400 \
  env ART_N=1000000 ART_D=128 ART_R=48 ART_L=80 \
      ART_OUT=/tmp/vamana_rebuild_check.npz LEANN_BUILD_PROFILE=1 \
  python evals/build_artifact.py

# 5. pruned-recompute sweep (beam x visited) at 100k; denser graph
# (R48/L96) + wide beams — the hardness-ladder recipe for >= 0.95
run recompute_100k 7200 \
  env RS_R=48 RS_L=96 RS_BEAMS=64,96,128 RS_VISITED=256 \
  python evals/recompute_scale.py

# 2c. second Vamana pass over the 10M artifact (recall 0.902 -> target
# >= 0.95), then the DEEP-10M flagship row: XLA graph engine on the
# refined graph. LONG (~2-3h device time).
run refine_10m 14400 \
  python evals/refine_artifact.py --n 10000000 --d 96 --l 64
run xla_10m_p2 7200 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96 \
    --artifact evals/artifacts/vamana_n10000000_r48_l64p2.npz

# 2c'. expansion sweep on the refined graph: E=4 halves sequential
# gather rounds at the same gathered-row count — if the XLA engine is
# round-latency-bound (not row-bound) this is a near-2x QPS lever.
# CPU check (2026-08-18, 1M beam 64): E=2 recall 0.9933, E=4 0.9943 —
# no recall cost (wider per-hop candidate blocks slightly help).
run xla_10m_p2_e4 5400 \
  python evals/device_time.py --backend xla-graph --n 10000000 --d 96 \
    --artifact evals/artifacts/vamana_n10000000_r48_l64p2.npz \
    --expansions 4

# 2d. PQ fused engine at DEEP-10M shape: records the honest negative
# (CPU sim predicts recall collapse ~0.07-0.25 — RESULTS_r3 2.); cheap
# because the PQ codes and oracle are cached. Runs LAST of the 10M rows.
run pq_10m 5400 \
  python evals/pq_device_check.py --n 10000000 --d 96 --m 16 --ksub 256 \
    --rescore bf16

# 2e. residual (two-level) PQ at DEEP-10M: the fix for 2d's collapse —
# coarse-PQ (mc=2) removes cluster-center energy, fine PQ (mf=12)
# encodes the residual, 2 norm columns close the l2 algebra; same
# 16B/node record geometry, UNCHANGED kernel. Encoding 10M on first
# run ~20-30min host time; cached thereafter.
run pq_10m_res 10800 \
  python evals/pq_device_check.py --n 10000000 --d 96 --m 12 --coarse 2 \
    --ksub 256 --rescore bf16

# 2f. IVF-PQ (ADC-compressed buckets + int8 rescore — the 100M-class
# one-chip footprint, ops/ivf_pq.py) at the DEEP-10M shape; the bf16
# IVF row above is its direct baseline on the same corpus/k-means.
run ivfpq_10m 7200 \
  python evals/ivfpq_device_check.py --n 10000000 --d 96 --nprobe 16

# 8. hardness sweep at 200k (all 9 configs, ivf + graph)
run hardness 10800 python evals/hardness_sweep.py --n 200000 --d 128

# 2g. the row the bf16 engine CANNOT serve: 30M x 96 on one chip
# (bf16 IVF needs 17.3GB resident > v5e HBM; IVF-PQ needs ~3.7GB).
# First run generates + caches the 30M pool (~45min host, 11.6GB
# disk); runs LAST so the core rows land first if the window is short.
run ivfpq_30m 10800 \
  python evals/ivfpq_device_check.py --n 30000000 --d 96 --nprobe 16 \
    --host-oracle

echo "battery done; results in $OUT" >&2
