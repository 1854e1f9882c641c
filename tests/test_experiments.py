import json
from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from cglb_tpu.backend import Jax
from cglb_tpu.configs import (
    CGLBConfig,
    GPRConfig,
    InducingVariableConfig,
    Matern32Config,
    SGPRConfig,
)
from cglb_tpu.experiments.baselines import linear_baseline, meanpred_baseline
from cglb_tpu.experiments.datasets import DatasetBundle, get_dataset, norm
from cglb_tpu.utils.serialization import dump_json, load_json


def test_dataset_normalization_uses_train_stats():
    b = get_dataset("snelson1d", split=0)
    xtr, ytr = b.train
    np.testing.assert_allclose(np.mean(xtr, axis=0), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.std(xtr, axis=0), 1.0, atol=1e-4)
    # train/test split proportions
    n = xtr.shape[0] + b.test[0].shape[0]
    assert n == 200
    assert xtr.shape[0] == int(200 * 0.67)


def test_dataset_split_deterministic_by_seed():
    a = get_dataset("snelson1d", split=3)
    b = get_dataset("snelson1d", split=3)
    c = get_dataset("snelson1d", split=4)
    np.testing.assert_array_equal(a.train[0], b.train[0])
    assert not np.array_equal(a.train[0], c.train[0])


def test_synthetic_shape_registry():
    b = get_dataset("synth_500x4")
    assert b.train[0].shape[1] == 4
    assert b.train[0].shape[0] + b.test[0].shape[0] == 500


def test_synthetic_hard_variant():
    """The _hard stand-in: same shapes, deterministic, much lower noise
    (protocol-length optimization trajectories — PERF.md)."""
    b = get_dataset("synth_500x4_hard")
    b2 = get_dataset("synth_500x4_hard")
    assert b.train[0].shape[1] == 4
    assert b.train[0].shape[0] + b.test[0].shape[0] == 500
    assert b.synthetic
    np.testing.assert_array_equal(b.train[1], b2.train[1])
    # target differs from the plain variant and carries ~5% noise: a linear
    # fit must leave most variance unexplained (multi-scale nonlinearity)
    plain = get_dataset("synth_500x4")
    assert not np.array_equal(plain.train[1], b.train[1])


def test_baselines_produce_finite_metrics():
    b = get_dataset("snelson1d")
    for fn in (meanpred_baseline, linear_baseline):
        res = fn(b)
        assert np.isfinite(res["test/rmse"])
        assert np.isfinite(res["test/nlpd"])
    # linear should beat mean on rmse for this smooth data
    assert linear_baseline(b)["test/rmse"] <= meanpred_baseline(b)["test/rmse"] + 0.1


def test_serialization_roundtrip(tmp_path):
    obj = {"a": np.arange(6, dtype=np.float64).reshape(2, 3), "b": 1.5,
           "c": [np.float64(2.5)], "d": "x"}
    p = tmp_path / "obj.json"
    dump_json(obj, p)
    back = load_json(p)
    np.testing.assert_allclose(back["a"], obj["a"])
    assert back["a"].dtype == np.float64
    assert back["b"] == 1.5 and back["d"] == "x"


def test_backend_create_save_load_roundtrip(tmp_path, rng):
    data = get_dataset("synth_200x3").train
    cfg = SGPRConfig(Matern32Config(), InducingVariableConfig(8))
    model = Jax.create_model(cfg, data, seed=0)
    e1 = model.elbo()
    Jax.save(model, tmp_path)
    # perturb then load back
    model2 = Jax.create_model(cfg, data, seed=1)
    model2 = Jax.load(model2, Path(tmp_path) / "model.json")
    # loaded params give the same elbo up to inducing-point differences?  No —
    # inducing points are saved too, so everything matches.
    np.testing.assert_allclose(model2.elbo(), e1, rtol=1e-8)


def test_backend_metrics_cglb(tmp_path):
    data_bundle = get_dataset("synth_200x3")
    cfg = CGLBConfig(Matern32Config(), InducingVariableConfig(16))
    model = Jax.create_model(cfg, data_bundle.train, seed=0)
    metrics = Jax.metrics_fn(model, data_bundle.to_tuple())()
    for key in ("elbo", "titsias_upper_bound", "cg_lower_bound", "loss",
                "cg/steps", "cg/error", "train/rmse", "test/rmse",
                "train/nlpd", "test/nlpd"):
        assert key in metrics, key
        assert np.isfinite(metrics[key]), key
    assert metrics["elbo"] <= metrics["cg_lower_bound"] + 1e-6
    assert metrics["cg_lower_bound"] <= metrics["titsias_upper_bound"] + 1e-6


def test_backend_optimize_cglb_scipy_improves(tmp_path):
    data_bundle = get_dataset("synth_200x3")
    cfg = CGLBConfig(Matern32Config(), InducingVariableConfig(12))
    model = Jax.create_model(cfg, data_bundle.train, seed=0)
    metrics_before = Jax.metrics_fn(model, data_bundle.to_tuple())()
    Jax.optimize(model, data_bundle.to_tuple(), num_steps=25, optimizer="scipy")
    metrics_after = Jax.metrics_fn(model, data_bundle.to_tuple())()
    assert metrics_after["loss"] < metrics_before["loss"] - 1.0
    # z-scored targets: a trained GP must beat the mean predictor (rmse=1.0)
    assert metrics_after["test/rmse"] < 1.0


def test_cli_end_to_end_train_cglb(tmp_path):
    from cglb_tpu.experiments.cli import main as cli_main

    runner = CliRunner()
    result = runner.invoke(
        cli_main,
        [
            "-b", "jax", "-t", "fp64", "-l", str(tmp_path), "-s", "0",
            "train", "-n", "10", "-d", "synth_150x2", "-o", "scipy",
            "cglb", "-m", "cglb", "-k", "Matern32", "-i", "cv", "-M", "8",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert (tmp_path / "results.json").exists()
    assert (tmp_path / "logs.json").exists()
    assert (tmp_path / "model.json").exists()
    results = load_json(tmp_path / "results.json")
    assert np.isfinite(results["cg_lower_bound"])
    # train-time CG cost summaries (the final-eval cg/steps is a
    # post-convergence artifact; see cli._train)
    assert results["cg/steps_train_mean"] > 0
    assert results["cg/steps_train_max"] >= results["cg/steps_train_mean"]
    assert np.isfinite(results["cg/error_train_mean"])
    # the median is the probe-robust audit stat (cli._train): bounded by
    # the max, and finite whenever the mean is
    assert np.isfinite(results["cg/error_train_median"])
    assert (results["cg/steps_train_median"]
            <= results["cg/steps_train_max"])
    logs = load_json(tmp_path / "logs.json")
    assert "loss" in logs and len(logs["loss"]) >= 1


def test_cli_train_cglb_streaming_matvec(tmp_path):
    """--matvec streaming routes the CG through the Pallas operator (interpret
    mode on CPU) for both training and prediction."""
    from cglb_tpu.backend import Jax
    from cglb_tpu.experiments.cli import main as cli_main

    runner = CliRunner()
    result = runner.invoke(
        cli_main,
        [
            "-b", "jax", "-t", "fp64", "-l", str(tmp_path), "-s", "0",
            "--matvec", "streaming",
            "train", "-n", "5", "-d", "synth_150x2", "-o", "scipy",
            "cglb", "-m", "cglb", "-k", "Matern32", "-i", "cv", "-M", "8",
        ],
        catch_exceptions=False,
    )
    Jax.matvec_mode = "auto"  # reset class state for other tests
    assert result.exit_code == 0, result.output
    results = load_json(tmp_path / "results.json")
    assert np.isfinite(results["cg_lower_bound"])
    assert results["elbo"] <= results["cg_lower_bound"] + 1e-5


def test_cli_train_exactgp_staged(tmp_path):
    """`-o staged gpr -m exactgp` routes the iterative exact-GP through the
    reference's staged schedule (backend.optimize; this combination is the
    paper's Iterative-GP comparison arm and regressed once by being gated
    on kind == 'gpr' only)."""
    from cglb_tpu.experiments.cli import main as cli_main

    runner = CliRunner()
    result = runner.invoke(
        cli_main,
        [
            "-b", "jax", "-t", "fp64", "-l", str(tmp_path), "-s", "0",
            "train", "-n", "3", "-d", "synth_150x2", "-o", "staged",
            "gpr", "-m", "exactgp", "-k", "Matern32",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    results = load_json(tmp_path / "results.json")
    assert np.isfinite(results["lml"])
    assert np.isfinite(results["test/rmse"])


def test_cli_train_exactgp_adam_routes_staged(tmp_path, monkeypatch):
    """Reference parity: `-o adam_<lr>` on a GPR-family model runs the
    staged exact-GP schedule with that lr (pytorch/interface.py:326-330
    parses adam_lr from the optimizer name; the torch backend has no
    non-staged adam path for GPR)."""
    import cglb_tpu.utils.training as training
    from cglb_tpu.experiments.cli import main as cli_main

    seen = {}
    orig = training.staged_gpr_optimize

    def spy(loss_fn, params, X, Y, num_steps, logger=None, **kw):
        seen["adam_lr"] = kw.get("adam_lr")
        return orig(loss_fn, params, X, Y, num_steps, logger, **kw)

    monkeypatch.setattr(training, "staged_gpr_optimize", spy)
    runner = CliRunner()
    result = runner.invoke(
        cli_main,
        [
            "-b", "jax", "-t", "fp64", "-l", str(tmp_path), "-s", "0",
            "train", "-n", "2", "-d", "synth_150x2", "-o", "adam_0.01",
            "gpr", "-m", "exactgp", "-k", "Matern32",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert seen["adam_lr"] == 0.01


def test_cli_baseline(tmp_path):
    from cglb_tpu.experiments.cli import main as cli_main

    runner = CliRunner()
    result = runner.invoke(
        cli_main,
        ["-l", str(tmp_path), "baseline", "-d", "synth_150x2", "mean"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    res = load_json(tmp_path / "results.json")
    assert res["id"] == "mean"


def test_cli_metric_sgpr(tmp_path):
    from cglb_tpu.experiments.cli import main as cli_main

    runner = CliRunner()
    result = runner.invoke(
        cli_main,
        [
            "-l", str(tmp_path), "metric", "-d", "synth_150x2",
            "sgpr", "-m", "sgpr", "-k", "rbf", "-i", "cv", "-M", "8",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert (tmp_path / "metric.npy").exists()


def test_full_state_checkpoint_roundtrip(tmp_path):
    from cglb_tpu.configs import CGLBConfig as CfgCGLB

    data_bundle = get_dataset("synth_200x3")
    cfg = CfgCGLB(Matern32Config(), InducingVariableConfig(12))
    model = Jax.create_model(cfg, data_bundle.train, seed=0)
    # run one loss eval to produce a non-trivial v0 warm start
    model.loss_value()
    v_before = np.asarray(model.v0)
    assert np.abs(v_before).max() > 0
    Jax.save_checkpoint(model, tmp_path)

    model2 = Jax.create_model(cfg, data_bundle.train, seed=1)
    model2 = Jax.load_checkpoint(model2, Path(tmp_path) / "checkpoint.json")
    np.testing.assert_allclose(np.asarray(model2.v0), v_before, rtol=1e-12)
    # warm start means zero CG steps on the next eval
    model2.loss_value()
    assert model2.cg_steps == 0


def test_cli_periodic_checkpoint_and_resume(tmp_path):
    """--ckpt-every writes a live full-state checkpoint during training and
    --resume continues with the REMAINING step budget from it (failure
    recovery for protocol-length runs; SURVEY.md 5.4)."""
    from cglb_tpu.experiments.cli import main as cli_main

    base = [
        "-b", "jax", "-t", "fp64", "-l", str(tmp_path), "-s", "0",
        "train", "-d", "synth_150x2", "-o", "scipy",
    ]
    tail = ["cglb", "-m", "cglb", "-k", "Matern32", "-i", "cv", "-M", "8"]
    runner = CliRunner()
    result = runner.invoke(
        cli_main, base + ["-n", "8", "--ckpt-every", "3"] + tail,
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    ckpt = load_json(tmp_path / "checkpoint.json")
    done = ckpt["extra"]["iters_done"]
    assert done >= 3 and done % 3 == 0
    assert ckpt["v0"] is not None  # warm start travels with the checkpoint
    loss_at_ckpt = load_json(tmp_path / "results.json")["loss"]

    # resume with a larger budget: picks up the checkpoint, runs ONLY the
    # remainder, and does not regress the loss
    result = runner.invoke(
        cli_main,
        base + ["-n", str(done + 4), "--ckpt-every", "3", "--resume"] + tail,
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    results = load_json(tmp_path / "results.json")
    assert results["opt/num_iters"] <= 4
    assert results["loss"] <= loss_at_ckpt + 1e-6


def test_dataset_provenance_marks_synthetic():
    """Synthetic stand-ins are visibly marked (VERDICT r1 missing #4): the
    bundle carries source='synthetic', a :synth display name, and the CLI
    writes a 'data' field into results.json."""
    from cglb_tpu.experiments.datasets import get_dataset

    b = get_dataset("snelson1d", dtype=np.float64)
    assert b.synthetic and b.provenance == "synthetic"
    assert b.display_name == "snelson1d:synth"

    # a real on-disk dataset is marked real
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(0)
        np.savez(os.path.join(d, "mydata.npz"),
                 X=rng.normal(size=(30, 2)), Y=rng.normal(size=(30, 1)))
        old = os.environ.get("CGLB_DATA_DIR")
        os.environ["CGLB_DATA_DIR"] = d
        try:
            rb = get_dataset("mydata", dtype=np.float64)
        finally:
            if old is None:
                os.environ.pop("CGLB_DATA_DIR")
            else:
                os.environ["CGLB_DATA_DIR"] = old
    assert not rb.synthetic and rb.display_name == "mydata"


def test_results_json_records_data_provenance(tmp_path):
    """End-to-end through the CLI: results.json/logs.json say the run used
    synthetic data."""
    from click.testing import CliRunner

    from cglb_tpu.experiments.cli import main as cli_main
    from cglb_tpu.utils.serialization import load_json

    logdir = tmp_path / "prov"
    r = CliRunner().invoke(cli_main, [
        "-b", "jax", "-t", "fp64", "-l", str(logdir), "-s", "0",
        "train", "-n", "2", "-d", "synth_40x2", "-o", "lbfgs",
        "sgpr", "-m", "sgpr", "-k", "SquaredExponential", "-i", "cv",
        "-M", "8",
    ])
    assert r.exit_code == 0, r.output
    results = load_json(logdir / "results.json")
    assert results["data"] == "synthetic"
    logs = load_json(logdir / "logs.json")
    assert logs["data"] == "synthetic"


def test_scipy4_freezes_inducing_after_second_attempt(rng):
    """-o scipy4: the torch backend's 4-restart schedule; inducing points
    move in attempts 1-2 and are frozen afterwards
    (reference: pytorch/interface.py:507-543)."""
    from cglb_tpu.utils import training as tr
    from cglb_tpu.models import sgpr as sgpr_mod
    from cglb_tpu.ops import kernels as k

    n = 40
    X = rng.normal(size=(n, 2))
    Y = np.sin(X[:, :1]) + 0.05 * rng.normal(size=(n, 1))
    kern = k.make_kernel("Matern32", 2, dtype=np.float64)
    params = sgpr_mod.SGPRParams.create(kern, X[:6], noise_variance=0.5,
                                        dtype=np.float64)

    def loss_fn(p, state, Xa, Ya):
        return -sgpr_mod.elbo(p, Xa, Ya), state

    import jax.numpy as jnp

    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    # freeze from the very first attempt: inducing must not move at all
    res = tr.scipy_minimize(loss_fn, params, None, 6, attempts=2,
                            freeze_inducing_after=0, data=(Xj, Yj))
    np.testing.assert_array_equal(
        np.asarray(res.params.inducing_Z.raw),
        np.asarray(params.inducing_Z.raw),
    )
    assert not res.params.inducing_Z.trainable
    # normal scipy4 shape: runs and improves the loss
    res4 = tr.scipy_minimize(loss_fn, params, None, 30, attempts=4,
                             freeze_inducing_after=2, data=(Xj, Yj))
    assert res4.final_loss < float(loss_fn(params, None, Xj, Yj)[0])
