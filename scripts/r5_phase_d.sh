#!/bin/bash
# Round-5 phase D chip queue (final evidence passes):
#   1. iterative exact-GP arm at adam_0.001 (lr=0.01 drifts off the
#      subset-warmed basin on this stand-in; 0.001 is also a reference
#      CLI choice)
#   2. sweep (fixed single-worker TPU lane)
#   3. fine-holdout CGLB scipy4 + SGPR comparison arms (interval 2, so the
#      time-to-metric figure has real curves for the L-BFGS arms)
set -u
cd /root/repo
LOG=/tmp/r5_phase_d.log
: > "$LOG"

wait_tunnel() {
  for i in $(seq 1 20); do
    if timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "=== $(date +%T) tunnel OK (attempt $i) ===" | tee -a "$LOG"
      return 0
    fi
    sleep 30
  done
  echo "=== $(date +%T) tunnel NOT reachable ===" | tee -a "$LOG"
  return 1
}

run() {
  local name=$1 tmo=$2; shift 2
  wait_tunnel
  echo "=== $(date +%T) START $name ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "=== $(date +%T) END $name rc=$? ===" | tee -a "$LOG"
}

CLI="python -m cglb_tpu.experiments.cli"
D=Wilson_kin40k

run exactgp 2700 $CLI -t fp64 \
  -l runs/compare/$D/gpr-Matern32-fp64/0 -s 0 \
  train -n 500 --holdout-interval 10 -d $D -o adam_0.001 \
  gpr -m exactgp -k Matern32

run sweep 3600 python -m cglb_tpu.experiments.sweep \
  cglb_tpu/experiments/grids/tpu-proof.toml -p 1

run cglb-fine 1800 $CLI -t fp64 \
  -l runs/compare/$D/cglb-Matern32-fp64-M2048/0 -s 0 \
  train -n 2000 --holdout-interval 2 -d $D -o scipy4 \
  cglb -m cglb -k Matern32 -i cv -M 2048

run sgpr-fine 1800 $CLI -t fp64 \
  -l runs/compare/$D/sgpr-Matern32-fp64-M2048/0 -s 0 \
  train -n 2000 --holdout-interval 2 -d $D -o scipy \
  sgpr -m sgpr -k Matern32 -i cv -M 2048

echo "=== $(date +%T) PHASE D DONE ===" | tee -a "$LOG"
