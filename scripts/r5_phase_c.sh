#!/bin/bash
# Round-5 phase C chip queue (corrected phase B remainder):
#   1. multi-point sweep through the sweep runner, TPU lane
#   2. iterative exact-GP comparison arm at the reference's adam_0.01
#   3. M=4096 protocol point end-to-end (2000 adam steps, checkpointed)
# Each step is gated on a live tunnel probe: the remote TPU re-admits
# slowly after a killed client, and a failed probe silently demotes the
# sweep to its CPU lane.
set -u
cd /root/repo
LOG=/tmp/r5_phase_c.log
: > "$LOG"

wait_tunnel() {
  for i in $(seq 1 20); do
    if timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "=== $(date +%T) tunnel OK (attempt $i) ===" | tee -a "$LOG"
      return 0
    fi
    sleep 30
  done
  echo "=== $(date +%T) tunnel NOT reachable after 20 attempts ===" | tee -a "$LOG"
  return 1
}

run() {
  local name=$1 tmo=$2; shift 2
  wait_tunnel
  echo "=== $(date +%T) START $name ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "=== $(date +%T) END $name rc=$? ===" | tee -a "$LOG"
}

run sweep 3600 python -m cglb_tpu.experiments.sweep \
  cglb_tpu/experiments/grids/tpu-proof.toml -p 1

run exactgp 2700 python -m cglb_tpu.experiments.cli -t fp64 \
  -l runs/compare/Wilson_kin40k/gpr-Matern32-fp64/0 -s 0 \
  train -n 500 -d Wilson_kin40k -o adam_0.01 gpr -m exactgp -k Matern32

run m4096 6600 python -m cglb_tpu.experiments.cli -t fp64 \
  -l runs/kin40k-2000-adam-M4096 -s 0 \
  train -n 2000 --ckpt-every 100 -d Wilson_kin40k -o adam_0.01 \
  cglb -m cglb -k Matern32 -i cv -M 4096

echo "=== $(date +%T) PHASE C DONE ===" | tee -a "$LOG"
