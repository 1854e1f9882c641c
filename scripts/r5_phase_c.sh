#!/bin/bash
# Round-5 phase C chip queue (corrected phase B remainder):
#   1. multi-point sweep through the sweep runner, TPU lane
#   2. iterative exact-GP comparison arm at the reference's adam_0.01
#   3. M=4096 protocol point end-to-end (2000 adam steps, checkpointed)
set -u
cd /root/repo
LOG=/tmp/r5_phase_c.log
: > "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
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
