#!/bin/bash
# Round-5 phase E: the M=4096 protocol point, re-run with both prediction
# memory fixes (mixed one-shot predict path + memory-aware metric batch).
set -u
cd /root/repo
LOG=/tmp/r5_m4096.log

for i in $(seq 1 20); do
  if timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "=== $(date +%T) tunnel OK ===" | tee -a "$LOG"; break
  fi; sleep 30
done
echo "=== $(date +%T) START m4096-take3 ===" | tee -a "$LOG"
timeout 7200 python -m cglb_tpu.experiments.cli -t fp64 \
  -l runs/kin40k-2000-adam-M4096 -s 0 \
  train -n 2000 --ckpt-every 100 -d Wilson_kin40k -o adam_0.01 \
  cglb -m cglb -k Matern32 -i cv -M 4096 >> "$LOG" 2>&1
echo "=== $(date +%T) END m4096-take3 rc=$? ===" | tee -a "$LOG"
