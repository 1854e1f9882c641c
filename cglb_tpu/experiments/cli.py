"""Experiment CLI.

Preserves the reference's command *grammar* (cglb_experiments/cli.py:52-326):

    cglb -b jax -t fp64 -l LOGDIR -s SEED \
        train -n 2000 -d Wilson_pol -o scipy \
        cglb -m cglb -k Matern32 -i cv -M 2048 [-e 1.0 --vjoint --vzero]

but the implementation is the framework's own: the command tree is generated
from two declarative tables (``_OPTIONS``: reusable option factories keyed by
name; ``_LEAVES``: model-leaf -> option set + config builder), and every leaf
funnels into one ``_Action.execute`` dispatcher instead of per-model callback
clones.  ``train``/``metric`` groups carry an ``_Action`` describing what to
do with the model the leaf builds; ``gpr_metric`` and ``baseline`` are plain
commands.

New vs reference: ``-o lbfgs`` (pure-JAX on-device L-BFGS), ``-o lbfgs_native``
(first-party C++ driver), ``-o scipy4`` (the torch backend's 4-restart
schedule with inducing-point freezing), ``-o scipy_tol`` (adaptive
CG-tolerance schedule: tightens max_error 10x each time scipy converges with
budget left — a refinement/plateau diagnostic, not a stall rescue; see
PERF.md "scipy_tol showdown", utils/training.scipy_tol_minimize),
and ``--matvec {auto,dense,streaming}``
replacing the ``--keops`` toggle (streaming = Pallas blockwise matvec;
``--keops``/``--no-keops`` kept as compatible aliases).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, Optional

import click
import numpy as np

from ..configs import GPRConfig
from ..utils.logging import Logger
from ..utils.serialization import dump_json
from .baselines import linear_baseline, meanpred_baseline
from .click_types import (
    BackendType,
    Context,
    DatasetType,
    GPRConfigType,
    InducingVariableConfigType,
    KernelConfigType,
    SGPRConfigType,
)
from .datasets import DatasetBundle

_default_logdir = "./logdir"

_HOLDOUT_INTERVAL = 20


# ---------------------------------------------------------------------------
# The action carried from the train/metric group down to the model leaf.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _Action:
    """What to do once a leaf command has built its model config."""

    session: Context
    dataset: DatasetBundle
    kind: str  # "train" | "metric"
    num_steps: int = 0
    optimizer: Optional[str] = None
    metric_dst: Optional[Path] = None
    ckpt_every: int = 0   # periodic full-state checkpoint interval (iters)
    resume: bool = False  # continue from logdir/checkpoint.json if present
    holdout_interval: int = _HOLDOUT_INTERVAL  # metric/params logging cadence

    def execute(self, model_cfg, param_file: Optional[str] = None) -> None:
        backend = self.session.backend
        model = backend.create_model(
            model_cfg, self.dataset.train, seed=self.session.seed
        )
        if param_file:
            model = backend.load(model, param_file)
        if self.kind == "train":
            self._train(backend, model)
        else:
            self._metric(backend, model)

    def _train(self, backend, model) -> None:
        logdir = self.session.logdir
        datasets = self.dataset.to_tuple()
        num_steps = self.num_steps
        done = 0
        ckpt = Path(logdir, "checkpoint.json")
        if self.resume and ckpt.exists():
            model = backend.load_checkpoint(model, ckpt)
            done = int(getattr(model, "last_checkpoint_extra", {})
                       .get("iters_done", 0))
            num_steps = max(num_steps - done, 0)
        metrics_fn = backend.metrics_fn(model, datasets)
        logger = Logger(
            logdir,
            metrics_fn,
            lambda: backend.model_parameters(model),
            self.holdout_interval,
            include_feval_log=True,
        )
        res = backend.optimize(model, datasets, num_steps, logger,
                               self.optimizer,
                               checkpoint_every=self.ckpt_every,
                               checkpoint_dir=logdir if self.ckpt_every
                               else None,
                               checkpoint_offset=done,
                               resume_extra=getattr(
                                   model, "last_checkpoint_extra", None))
        backend.save(model, logdir)

        meta = {"id": logdir, "data": self.dataset.provenance}
        meta.update(getattr(res, "info", None) or {})
        # train-time CG cost stats: the final-eval `cg/steps` in the metrics
        # is a post-convergence artifact (CG at the converged warm start
        # takes ~0 steps — the reference shares this flaw, tensorflow/
        # interface.py:424-427); protocol audits need the per-feval series
        # summarized alongside it.
        train_stats = {}
        for key in ("cg/steps", "cg/error"):
            # scipy paths log every feval; the on-device adam path has no
            # per-feval host readback (dispatch-bound), so fall back to the
            # holdout-sampled series (every `--holdout-interval` steps)
            series = (logger.logs.get(f"{key}-per-feval")
                      or logger.logs.get(key) or [])
            finite = np.asarray(
                [v for v in series if np.isfinite(v)], dtype=float)
            if finite.size:
                train_stats[f"{key}_train_mean"] = float(finite.mean())
                train_stats[f"{key}_train_max"] = float(finite.max())
                # the mean is dominated by line-search PROBE episodes at
                # extreme hyperparameters (a handful of fevals with CG
                # error ~1e4 swamp a converged value of ~0.2); the median
                # is the audit-grade central tendency of the series
                train_stats[f"{key}_train_median"] = float(
                    np.median(finite))
        dump_json({**metrics_fn(), **train_stats, **meta},
                  Path(logdir, "results.json"))
        dump_json({**logger.logs, **meta}, Path(logdir, "logs.json"))

    def _metric(self, backend, model) -> None:
        results = backend.metrics_fn(model, self.dataset.to_tuple())()
        results["id"] = str(self.metric_dst.parent)
        results["data"] = self.dataset.provenance
        np.save(self.metric_dst, results)


# ---------------------------------------------------------------------------
# Declarative option + leaf tables.  Each leaf command = an option set drawn
# from _OPTIONS plus a builder from the collected click kwargs to a ModelConfig.
# ---------------------------------------------------------------------------

_OPTIONS: Dict[str, Callable] = {
    "model_gpr": lambda: click.option(
        "-m", "--model-class", type=GPRConfigType(), required=True
    ),
    "model_sparse": lambda: click.option(
        "-m", "--model-class", type=SGPRConfigType(), required=True
    ),
    "kernel": lambda: click.option(
        "-k", "--kernel", type=KernelConfigType(), required=True
    ),
    "inducing": lambda: click.option(
        "-i", "--inducing-variable", type=InducingVariableConfigType(),
        required=True,
    ),
    "M": lambda: click.option(
        "-M", "--num-inducing-variables", default=100, type=int
    ),
    "params": lambda: click.option(
        "-p", "--param_file", type=click.Path(readable=True), required=False
    ),
    "max_error": lambda: click.option(
        "-e", "--max_error", type=float, default=1.0
    ),
    "vjoint": lambda: click.option("--vjoint/--no-vjoint", default=False),
    "vzero": lambda: click.option("--vzero/--no-vzero", default=False),
}


def _gpr_config(o):
    return o["model_class"](o["kernel"]())


def _sparse_config(o):
    return o["model_class"](
        o["kernel"](), o["inducing_variable"](o["num_inducing_variables"])
    )


def _cglb_config(o):
    return o["model_class"](
        o["kernel"](),
        o["inducing_variable"](o["num_inducing_variables"]),
        o["max_error"],
        o["vjoint"],
        o["vzero"],
    )


_GPR_OPTS = ("model_gpr", "kernel", "params")
_SPARSE_OPTS = ("model_sparse", "kernel", "inducing", "M", "params")
_CGLB_OPTS = _SPARSE_OPTS + ("max_error", "vjoint", "vzero")

# leaf name -> (option keys, kwargs -> ModelConfig)
_LEAVES: Dict[str, tuple] = {
    "sgpr": (_SPARSE_OPTS, _sparse_config),
    "sgprn2m": (_SPARSE_OPTS, _sparse_config),
    "cglb": (_CGLB_OPTS, _cglb_config),
    "cglbn2m": (_CGLB_OPTS, _cglb_config),
    "cglbnm2": (_CGLB_OPTS, _cglb_config),
    "gpr": (_GPR_OPTS, _gpr_config),
}


def _attach_leaves(group: click.Group) -> None:
    """Generate one leaf command per _LEAVES row under `group`."""
    for name, (opt_keys, build) in _LEAVES.items():

        @click.pass_context
        def leaf(ctx, _build=build, **kwargs):
            action: _Action = ctx.obj
            action.execute(_build(kwargs), kwargs.get("param_file"))

        cmd = leaf
        for key in reversed(opt_keys):
            cmd = _OPTIONS[key]()(cmd)
        group.command(name=name)(cmd)


# ---------------------------------------------------------------------------
# Command tree.
# ---------------------------------------------------------------------------


@click.group()
@click.option("-b", "--backend", type=BackendType(), default="jax")
@click.option("-t", "--float-type", type=click.Choice(["fp32", "fp64"]),
              default="fp64")
@click.option("-l", "--logdir", type=click.Path(file_okay=False),
              default=_default_logdir)
@click.option("-s", "--seed", type=int, default=0)
@click.option("--matvec", type=click.Choice(["auto", "dense", "streaming"]),
              default="auto", help="kernel matvec implementation for CG")
@click.option("--keops/--no-keops", "keops", default=None,
              help="compat alias: --keops == --matvec streaming")
@click.option("--common-dtype", type=click.Choice(["float64", "mixed"]),
              default="mixed",
              help="mixed (default) = df32 kernel profile + fp64 solves, "
                   "fp64-grade accuracy without emulated-fp64 transcendentals;"
                   " float64 = all-fp64 (see PERF.md)")
@click.option("--mesh", type=int, default=0,
              help="multi-chip: shard CGLB training over a 1-D data mesh of "
                   "this many devices (-1 = all visible); 0/1 = single device")
@click.option("--max-cg-iters", type=int, default=100,
              help="CG iteration cap (reference hardcodes 100, tensorflow/"
                   "models.py:36-38).  At N>=1M each CG iteration is a multi-"
                   "second streaming matvec: cap it to bound single-dispatch "
                   "time (warm-started training measures 7.2 mean / 20 max "
                   "steps per feval at the kin40k protocol point, PERF.md)")
@click.option("--dispatch-bound", type=int, default=0,
              help="adam-family training: run the dispatch-bounded step "
                   "with this many CG iterations per device dispatch "
                   "(0 = monolithic).  Full CG depth under per-dispatch "
                   "wall-time limits — remote-worker watchdogs / "
                   "preemption windows at N>=1M (parallel/dispatch.py)")
@click.pass_context
def main(ctx, backend, float_type, logdir, seed, matvec, keops, common_dtype,
         mesh, max_cg_iters, dispatch_bound):
    logdir_path = Path(logdir).expanduser().resolve()
    logdir_path.mkdir(exist_ok=True, parents=True)
    if keops is not None:
        matvec = "streaming" if keops else "dense"
    backend.configure_backend(logdir=str(logdir_path), matvec=matvec,
                              common_dtype=common_dtype, mesh=mesh,
                              max_cg_iters=max_cg_iters,
                              dispatch_bound=dispatch_bound)
    backend.set_default_float(float_type)
    backend.set_default_jitter(float_type)
    backend.set_seed(seed)
    ctx.obj = Context(backend, seed, str(logdir_path))


_optimizer_choices = click.Choice(
    ["scipy", "scipy4", "scipy_tol", "lbfgs", "lbfgs_native", "staged",
     "adam_0.1", "adam_0.01", "adam_0.001"]
)


@main.group()
@click.option("-n", "--num-steps", default=100, type=int)
@click.option("-d", "--dataset", type=DatasetType(), required=True)
@click.option("-o", "--optimizer", type=_optimizer_choices, default="scipy")
@click.option("--ckpt-every", default=0, type=int,
              help="write logdir/checkpoint.json (params + CG warm start) "
                   "every K accepted iterations; 0 disables")
@click.option("--resume", is_flag=True, default=False,
              help="continue from logdir/checkpoint.json if present "
                   "(remaining step budget = num-steps - iters already done)")
@click.option("--holdout-interval", default=_HOLDOUT_INTERVAL, type=int,
              help="record holdout metrics + params every K optimizer "
                   "steps (StopWatch-excluded; finer intervals give "
                   "higher-resolution time-to-metric curves for short "
                   "L-BFGS runs)")
@click.pass_context
def train(ctx, dataset, num_steps, optimizer, ckpt_every, resume,
          holdout_interval):
    ctx.obj = _Action(session=ctx.obj, dataset=dataset, kind="train",
                      num_steps=num_steps, optimizer=optimizer,
                      ckpt_every=ckpt_every, resume=resume,
                      holdout_interval=holdout_interval)


@main.group()
@click.option("-d", "--dataset", type=DatasetType(), required=True)
@click.pass_context
def metric(ctx, dataset):
    session: Context = ctx.obj
    ctx.obj = _Action(session=session, dataset=dataset, kind="metric",
                      metric_dst=Path(session.logdir, "metric.npy"))


_attach_leaves(train)
_attach_leaves(metric)


@main.command("gpr_metric")
@click.option("-d", "--dataset", type=DatasetType(), required=True)
@click.option("-k", "--kernel", type=KernelConfigType(), required=True)
@click.option("-p", "--param_file", type=click.Path(readable=True),
              required=True)
@click.pass_context
def gpr_metric(ctx, dataset, kernel, param_file):
    session: Context = ctx.obj
    dst = Path(Path(param_file).parent, "gpr_metric.npy")
    action = _Action(session=session, dataset=dataset, kind="metric",
                     metric_dst=dst)
    action.execute(GPRConfig(kernel()), param_file)


@main.command()
@click.option("-d", "--dataset", type=DatasetType(), required=True)
@click.argument("baseline", type=click.Choice(["mean", "linear"]))
@click.pass_context
def baseline(ctx, baseline, dataset):
    session: Context = ctx.obj
    fns = {"linear": linear_baseline, "mean": meanpred_baseline}
    results = fns[baseline](dataset)
    results["id"] = baseline
    results["data"] = dataset.provenance
    dump_json(results, Path(session.logdir, "results.json"))


if __name__ == "__main__":
    main()
