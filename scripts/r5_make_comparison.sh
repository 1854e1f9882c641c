#!/bin/bash
# Assemble the reference's headline three-model comparison from the
# round-5 chip runs (reference role: cglb_experiments/plotting.py:98-172,
# the CGLB vs SGPR vs Iterative-GP time-to-metric figure).
#
# The CGLB arms are the protocol runs (kin40k-2000-{scipy4,adam}-r4),
# mirrored into the <root>/<dataset>/<uid>/<seed> layout the plot walker
# expects; SGPR and the iterative exact GP trained directly into the tree.
set -eu
cd /root/repo
D=Wilson_kin40k
ROOT=runs/compare

mirror() { # mirror <src-logdir> <uid>
  local src=$1 uid=$2 dst="$ROOT/$D/$2/0"
  mkdir -p "$dst"
  cp "$src"/logs.json "$src"/results.json "$dst"/
  [ -f "$src"/model.json ] && cp "$src"/model.json "$dst"/
}

# the scipy4 uid dir is trained directly by scripts/r5_phase_d.sh with a
# fine holdout interval; only the adam protocol run is mirrored in
mirror runs/kin40k-2000-adam-r4  cglb-Matern32-fp64-M2048-adam

mkdir -p runs/plots
python -m cglb_tpu.experiments.plotcli -r "$ROOT" metrics -m test/rmse -o runs/plots
python -m cglb_tpu.experiments.plotcli -r "$ROOT" metrics -m test/nlpd -o runs/plots
python -m cglb_tpu.experiments.plotcli -r "$ROOT" results_table -f markdown \
  -o runs/plots/results_table.md
cat runs/plots/results_table.md
