"""Experiment CLI.

Preserves the reference's command grammar (cglb_experiments/cli.py:52-326):

    cglb -b jax -t fp64 -l LOGDIR -s SEED \
        train -n 2000 -d Wilson_pol -o scipy \
        cglb -m cglb -k Matern32 -i cv -M 2048 [-e 1.0 --vjoint --vzero]

Command tree: ``train``/``metric`` groups with per-model leaf commands generated
from a shared action table (sgpr/sgprn2m/cglb/cglbn2m/cglbnm2/gpr), plus
``gpr_metric`` and ``baseline`` commands.  Training writes results.json,
logs.json, and model.json to the logdir.

New vs reference: ``-o lbfgs`` selects the pure-JAX on-device L-BFGS, and
``--matvec {auto,dense,streaming}`` replaces the ``--keops`` toggle (streaming =
Pallas blockwise matvec; ``--keops``/``--no-keops`` kept as compatible aliases).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import click
import numpy as np

from ..configs import GPRConfig, ModelConfig
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


@dataclass(frozen=True)
class ExecuteContext:
    main_ctx: Context
    dataset: DatasetBundle
    callback_fn: Callable[[Any], Any]
    extra_args: Dict = field(default_factory=dict)


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
              default="float64",
              help="mixed = bf16-packed/f32 common terms (~4.5x faster fevals"
                   " at ~1e-4 relative bound error)")
@click.pass_context
def main(ctx, backend, float_type, logdir, seed, matvec, keops, common_dtype):
    logdir_path = Path(logdir).expanduser().resolve()
    logdir_path.mkdir(exist_ok=True, parents=True)
    if keops is not None:
        matvec = "streaming" if keops else "dense"
    backend.configure_backend(logdir=str(logdir_path), matvec=matvec,
                              common_dtype=common_dtype)
    backend.set_default_float(float_type)
    backend.set_default_jitter(float_type)
    backend.set_seed(seed)
    ctx.obj = Context(backend, seed, str(logdir_path))


def create_optimize_fn(backend, dataset_bundle, logdir, num_steps, seed,
                       optimizer) -> Callable:
    def optimize_fn(model):
        datasets = dataset_bundle.to_tuple()
        holdout_interval = 20
        metrics_fn = backend.metrics_fn(model, datasets)
        logger = Logger(
            logdir,
            metrics_fn,
            lambda: backend.model_parameters(model),
            holdout_interval,
            include_feval_log=True,
        )
        backend.optimize(model, datasets, num_steps, logger, optimizer)
        backend.save(model, logdir)

        results = metrics_fn()
        results["id"] = logdir
        logs = logger.logs
        logs["id"] = logdir
        dump_json(results, Path(logdir, "results.json"))
        dump_json(logs, Path(logdir, "logs.json"))

    return optimize_fn


def create_metric_fn(backend, dataset_bundle, destination: Path) -> Callable:
    def metric_fn(model):
        metrics_fn = backend.metrics_fn(model, dataset_bundle.to_tuple())
        results = metrics_fn()
        results["id"] = str(destination.parent)
        np.save(destination, results)

    return metric_fn


_optimizer_choices = click.Choice(
    ["scipy", "lbfgs", "lbfgs_native", "staged", "adam_0.1", "adam_0.01",
     "adam_0.001"]
)


@main.group()
@click.option("-n", "--num-steps", default=100, type=int)
@click.option("-d", "--dataset", type=DatasetType(), required=True)
@click.option("-o", "--optimizer", type=_optimizer_choices, default="scipy")
@click.pass_context
def train(ctx, dataset, num_steps, optimizer):
    main_ctx: Context = ctx.obj
    optimize_fn = create_optimize_fn(
        main_ctx.backend, dataset, main_ctx.logdir, num_steps, main_ctx.seed,
        optimizer,
    )
    ctx.obj = ExecuteContext(main_ctx=main_ctx, dataset=dataset,
                             callback_fn=optimize_fn)


@main.group()
@click.option("-d", "--dataset", type=DatasetType(), required=True)
@click.pass_context
def metric(ctx, dataset):
    main_ctx: Context = ctx.obj
    dst = Path(main_ctx.logdir, "metric.npy")
    predict_fn = create_metric_fn(main_ctx.backend, dataset, dst)
    ctx.obj = ExecuteContext(main_ctx=main_ctx, dataset=dataset,
                             callback_fn=predict_fn)


@main.command()
@click.option("-d", "--dataset", type=DatasetType(), required=True)
@click.option("-k", "--kernel", type=KernelConfigType(), required=True)
@click.option("-p", "--param_file", type=click.Path(readable=True), required=True)
@click.pass_context
def gpr_metric(ctx, dataset, kernel, param_file):
    main_ctx: Context = ctx.obj
    params_path = Path(param_file)
    dst = Path(params_path.parent, "gpr_metric.npy")
    fn = create_metric_fn(main_ctx.backend, dataset, dst)
    ctx.obj = ExecuteContext(main_ctx=main_ctx, dataset=dataset, callback_fn=fn)
    _execute_cb_on_model(ctx, GPRConfig(kernel()), param_file)


@main.command()
@click.option("-d", "--dataset", type=DatasetType(), required=True)
@click.argument("baseline", type=click.Choice(["mean", "linear"]))
@click.pass_context
def baseline(ctx, baseline, dataset):
    main_ctx: Context = ctx.obj
    fns = {"linear": linear_baseline, "mean": meanpred_baseline}
    results = fns[baseline](dataset)
    results["id"] = baseline
    dump_json(results, Path(main_ctx.logdir, "results.json"))


gpr_options = [
    click.option("-m", "--model-class", type=GPRConfigType(), required=True),
    click.option("-k", "--kernel", type=KernelConfigType(), required=True),
    click.option("-p", "--param_file", type=click.Path(readable=True),
                 required=False),
]

sgpr_options = [
    click.option("-m", "--model-class", type=SGPRConfigType(), required=True),
    click.option("-k", "--kernel", type=KernelConfigType(), required=True),
    click.option("-i", "--inducing-variable", type=InducingVariableConfigType(),
                 required=True),
    click.option("-M", "--num-inducing-variables", default=100, type=int),
    click.option("-p", "--param_file", type=click.Path(readable=True)),
]

cglb_options = sgpr_options + [
    click.option("-e", "--max_error", type=float, default=1.0),
    click.option("--vjoint/--no-vjoint", default=False),
    click.option("--vzero/--no-vzero", default=False),
]


def add_options(options):
    def _wrapper(f):
        for option in reversed(options):
            f = option(f)
        return f

    return _wrapper


def _execute_cb_on_model(ctx, model_config: ModelConfig,
                         params_file: Optional[str] = None):
    exec_ctx: ExecuteContext = ctx.obj
    main_ctx = exec_ctx.main_ctx
    model = main_ctx.backend.create_model(
        model_config, exec_ctx.dataset.train, seed=main_ctx.seed
    )
    if params_file:
        model = main_ctx.backend.load(model, params_file)
    exec_ctx.callback_fn(model)


def _execute_cb_sgpr(ctx, model_class, kernel, inducing_variable,
                     num_inducing_variables, param_file):
    m = model_class(kernel(), inducing_variable(num_inducing_variables))
    _execute_cb_on_model(ctx, m, param_file)


def _execute_cb_cglb(ctx, model_class, kernel, inducing_variable,
                     num_inducing_variables, param_file, max_error, vjoint,
                     vzero):
    m = model_class(
        kernel(), inducing_variable(num_inducing_variables), max_error, vjoint,
        vzero,
    )
    _execute_cb_on_model(ctx, m, param_file)


def _execute_cb_gpr(ctx, model_class, kernel, param_file):
    _execute_cb_on_model(ctx, model_class(kernel()), param_file)


action_configs = [
    ("sgpr", (sgpr_options, _execute_cb_sgpr)),
    ("sgprn2m", (sgpr_options, _execute_cb_sgpr)),
    ("cglb", (cglb_options, _execute_cb_cglb)),
    ("cglbn2m", (cglb_options, _execute_cb_cglb)),
    ("cglbnm2", (cglb_options, _execute_cb_cglb)),
    ("gpr", (gpr_options, _execute_cb_gpr)),
]

train_actions = {
    k: train.command(k)(add_options(o)(click.pass_context(c)))
    for k, (o, c) in action_configs
}

metric_actions = {
    k: metric.command(k)(add_options(o)(click.pass_context(c)))
    for k, (o, c) in action_configs
}


if __name__ == "__main__":
    main()
