"""Sweep runner: expands TOML grid files into CLI invocations and runs them.

First-party replacement for the reference's external `xpert` runner
(cglb_experiments/xpert-main.toml:15-35, xpert-ablations.toml:15-69): a TOML
file declares a command template plus per-axis value lists; the cross product
is expanded, `{uid}` is templated into the logdir, and runs execute as
subprocesses with a bounded worker pool (the TPU analogue of xpert's
`num_proc` + `gpu_indices` pinning is one process per chip via
`JAX_PLATFORMS`/visible-device env, or plain sequential on a single chip).

Grid file format (compatible in spirit with the reference's):

    [sweep]
    cmd = "python -m cglb_tpu.experiments.cli -b jax -t fp64 -l {logdir}/{uid} -s {seed} train -n {num_steps} -d {dataset} cglb -m cglb -k Matern32 -i cv -M {M}"
    logdir = "./logdir"
    num_steps = 2000

    [sweep.grid]
    dataset = ["Wilson_kin40k", "Wilson_pol"]
    M = [1024, 2048]
    seed = [999, 888, 777]

Every key in [sweep.grid] is crossed; scalar keys under [sweep] are constants.
`uid` is auto-built from the grid point (e.g. "dataset=Wilson_pol/M=2048/999").
"""

from __future__ import annotations

import itertools
import shlex
import subprocess
import sys
import tomllib
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List

import click

__all__ = ["expand_grid", "run_sweep", "main"]


def expand_grid(spec: Dict) -> List[Dict]:
    """Cross product of [sweep.grid] lists merged over [sweep] constants.

    A file may hold ONE ``[sweep]`` table or SEVERAL ``[[sweep]]`` blocks
    (the reference's xpert format uses multiple ``[[exp]]`` blocks for
    experiment families with different axes, e.g. the cglb-with-voption vs
    cglbn2m ablations at xpert-ablations.toml:17-63); each block expands
    independently and the points concatenate."""
    sweeps = spec.get("sweep", spec)
    if isinstance(sweeps, dict):
        sweeps = [sweeps]
    points = []
    for block in sweeps:
        sweep = dict(block)
        grid = sweep.pop("grid", {})
        keys = list(grid.keys())
        for combo in itertools.product(*(grid[k] for k in keys)):
            point = dict(sweep)
            point.update(dict(zip(keys, combo)))
            uid_parts = []
            for k, v in zip(keys, combo):
                uid_parts.append(f"{k}={v}" if k != "seed" else str(v))
            point.setdefault("uid", "/".join(uid_parts))
            points.append(point)
    return points


def _render(point: Dict) -> str:
    cmd = point["cmd"]
    return cmd.format(**{k: v for k, v in point.items() if k != "cmd"})


def run_sweep(grid_file, num_proc: int = 1, dry_run: bool = False,
              restart: bool = False) -> int:
    with open(grid_file, "rb") as f:
        spec = tomllib.load(f)
    points = expand_grid(spec)
    cmds = []
    for point in points:
        cmd = _render(point)
        logdir = None
        # skip completed runs unless restart (xpert `restart=false` semantics)
        results_marker = None
        if "-l" in cmd:
            toks = shlex.split(cmd)
            try:
                logdir = toks[toks.index("-l") + 1]
                results_marker = Path(logdir) / "results.json"
            except (ValueError, IndexError):
                pass
        if (not restart and results_marker is not None
                and results_marker.exists()):
            print(f"[skip] {cmd}")
            continue
        cmds.append(cmd)

    if dry_run:
        for cmd in cmds:
            print(cmd)
        return 0

    def _run(cmd) -> int:
        print(f"[run] {cmd}", flush=True)
        proc = subprocess.run(shlex.split(cmd))
        if proc.returncode != 0:
            print(f"[fail rc={proc.returncode}] {cmd}", file=sys.stderr)
            return 1
        return 0

    if num_proc <= 1:
        results = [_run(cmd) for cmd in cmds]
    elif cmds:
        # Warm the persistent XLA compilation cache on the FIRST point before
        # fanning out: cold fp64/mixed CGLB compiles are minutes (PERF.md),
        # and num_proc parallel cold starts would each pay that compile for
        # the same (shape, config) instead of hitting the cache written by
        # the first run.
        results = [_run(cmds[0])]
        with ThreadPoolExecutor(max_workers=num_proc) as pool:
            results += list(pool.map(_run, cmds[1:]))
    else:
        results = []
    return sum(results)


@click.command()
@click.argument("grid_file", type=click.Path(exists=True))
@click.option("-p", "--num-proc", default=1, type=int)
@click.option("--dry-run", is_flag=True, default=False)
@click.option("--restart/--no-restart", default=False,
              help="re-run grid points that already have results.json")
def main(grid_file, num_proc, dry_run, restart):
    sys.exit(1 if run_sweep(grid_file, num_proc, dry_run, restart) else 0)


if __name__ == "__main__":
    main()
