#!/bin/bash
# Round-5 phase A chip queue (serialized; the v5e has one chip):
#   1. scipy4 protocol re-run  -> runs/kin40k-2000-scipy4-r4   (PERF.md citation)
#   2. SGPR comparison arm     -> runs/compare/...             (headline figure)
#   3. exactgp comparison arm  -> runs/compare/...             (headline figure)
#   4. adam protocol re-run    -> runs/kin40k-2000-adam-r4     (PERF.md citation)
# Each step is bounded by `timeout`; failures don't stop the queue.
set -u
cd /root/repo
LOG=${LOG:-/tmp/r5_phase_a.log}
: > "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $(date +%T) START $name ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "=== $(date +%T) END $name rc=$? ===" | tee -a "$LOG"
}

CLI="python -m cglb_tpu.experiments.cli"
D=Wilson_kin40k

run scipy4 1800 $CLI -t fp64 -l runs/kin40k-2000-scipy4-r4 -s 0 \
  train -n 2000 -d $D -o scipy4 cglb -m cglb -k Matern32 -i cv -M 2048

run sgpr 1800 $CLI -t fp64 -l runs/compare/$D/sgpr-Matern32-fp64-M2048/0 -s 0 \
  train -n 2000 -d $D -o scipy sgpr -m sgpr -k Matern32 -i cv -M 2048

run exactgp 2700 $CLI -t fp64 -l runs/compare/$D/gpr-Matern32-fp64/0 -s 0 \
  train -n 500 -d $D -o staged gpr -m exactgp -k Matern32

run adam 2700 $CLI -t fp64 -l runs/kin40k-2000-adam-r4 -s 0 \
  train -n 2000 -d $D -o adam_0.01 cglb -m cglb -k Matern32 -i cv -M 2048

echo "=== $(date +%T) PHASE A DONE ===" | tee -a "$LOG"
