#!/bin/bash
# Probe the TPU tunnel every 5 minutes; when the handshake succeeds,
# launch the round-3 measurement battery exactly once.
# Run inside tmux: the battery takes hours.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
STAMP=/tmp/r3_battery_started
while true; do
  if [ -f "$STAMP" ]; then
    echo "battery already started; watchdog exiting" >&2
    exit 0
  fi
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" 2>/dev/null; then
    echo "TPU up at $(date -u)" >&2
    touch "$STAMP"
    bash evals/run_round3.sh
    echo "battery finished at $(date -u)" >&2
    exit 0
  fi
  echo "TPU still down at $(date -u); retrying in 300s" >&2
  sleep 300
done
