#!/bin/bash
# Round-5 phase B chip queue (after r5_phase_a.sh):
#   1. dispatch-bounded training at N=2^20, FULL CG depth (closes the
#      large-N asterisk; compare vs runs/largen-1m-6step capped baseline)
#   2. real multi-point sweep through the sweep runner (M 128..2048)
#   3. M=4096 protocol point end-to-end (2000 adam steps, checkpointed)
set -u
cd /root/repo
LOG=${LOG:-/tmp/r5_phase_b.log}
: > "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $(date +%T) START $name ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "=== $(date +%T) END $name rc=$? ===" | tee -a "$LOG"
}

run largen-dispatch 3000 env JAX_ENABLE_X64=true python scripts/large_n_aot.py \
  --n 1048576 --d 8 --m 1024 --devices 1 --execute --steps 6 \
  --max-cg-iters 100 --bounded 8

run sweep 3600 python -m cglb_tpu.experiments.sweep \
  cglb_tpu/experiments/grids/tpu-proof.toml -p 1

run m4096 6300 python -m cglb_tpu.experiments.cli -t fp64 \
  -l runs/kin40k-2000-adam-M4096 -s 0 --ckpt-every 100 \
  train -n 2000 -d Wilson_kin40k -o adam_0.01 cglb -m cglb -k Matern32 -i cv -M 4096

echo "=== $(date +%T) PHASE B DONE ===" | tee -a "$LOG"
