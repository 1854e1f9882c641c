import jax.numpy as jnp
import numpy as np
import pytest

from cglb_tpu.backend import Jax
from cglb_tpu.configs import CGLBConfig, GPRConfig, InducingVariableConfig, \
    Matern32Config, SGPRConfig
from cglb_tpu.models import cglb as cglb_mod
from cglb_tpu.models import sgpr as sgpr_mod
from cglb_tpu.ops import kernels as k
from cglb_tpu.utils import flatten as fl
from cglb_tpu.utils import training
from cglb_tpu.utils.inducing import conditional_variance, \
    conditional_variance_numpy


def _data(rng, n=80, d=2):
    X = rng.normal(size=(n, d))
    Y = np.sin(X[:, :1]) + 0.3 * np.cos(X[:, 1:2]) + 0.05 * rng.normal(size=(n, 1))
    return X, Y


def _sgpr_params(rng, X, Y, m=10):
    kern = k.make_kernel("Matern32", X.shape[1], dtype=np.float64)
    Z = X[rng.choice(X.shape[0], m, replace=False)]
    return sgpr_mod.SGPRParams.create(kern, Z, dtype=np.float64)


def test_flatten_roundtrip(rng):
    X, Y = _data(rng)
    params = _sgpr_params(rng, X, Y)
    vec = fl.flatten_trainable(params)
    unflatten = fl.make_unflatten(params)
    params2 = unflatten(vec)
    vec2 = fl.flatten_trainable(params2)
    np.testing.assert_allclose(vec, vec2, rtol=1e-12)
    # perturbed vector lands where expected
    params3 = unflatten(vec + 1.0)
    vec3 = fl.flatten_trainable(params3)
    np.testing.assert_allclose(vec3, vec + 1.0, rtol=1e-12)


def test_parameter_dict_and_assign(rng):
    X, Y = _data(rng)
    params = _sgpr_params(rng, X, Y)
    d = fl.parameter_dict(params)
    assert any("kernel" in key for key in d)
    # roundtrip through assign
    params2 = fl.assign_parameters(params, d)
    d2 = fl.parameter_dict(params2)
    for key in d:
        np.testing.assert_allclose(d[key], d2[key], rtol=1e-9, atol=1e-12)


def test_scipy_minimize_reduces_sgpr_loss(rng):
    X, Y = _data(rng)
    params = _sgpr_params(rng, X, Y)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def loss_fn(p, s):
        return -sgpr_mod.elbo(p, Xj, Yj), s

    l0 = float(loss_fn(params, None)[0])
    res = training.scipy_minimize(loss_fn, params, None, num_steps=40)
    assert res.final_loss < l0 - 1.0
    assert res.num_iters > 0
    # scipy diagnostics surfaced for run artifacts (results.json)
    assert res.info["opt/num_iters"] == res.num_iters
    assert res.info["opt/num_fevals"] >= res.num_iters
    assert res.info["opt/penalty_fevals"] == 0
    for a in res.info["opt/attempts"]:
        assert {"status", "message", "nit", "nfev"} <= set(a)


def test_scipy_minimize_cglb_with_warm_start(rng):
    X, Y = _data(rng)
    params = _sgpr_params(rng, X, Y)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    cfg = cglb_mod.CGLBConfig()
    v0 = cglb_mod.init_v0(X.shape[0])

    def loss_fn(p, carry):
        v = carry.v if isinstance(carry, cglb_mod.CGLBAux) else carry
        return cglb_mod.loss(p, Xj, Yj, v, cfg)

    l0 = float(loss_fn(params, v0)[0])
    res = training.scipy_minimize(loss_fn, params, v0, num_steps=30)
    assert res.final_loss < l0 - 1.0
    assert isinstance(res.state, cglb_mod.CGLBAux)
    assert np.asarray(res.state.v).shape == (1, X.shape[0])


def test_traced_max_error_tightens_cg_in_one_program(rng):
    """cglb.loss's max_error override is a TRACED scalar: tightening it
    drives more CG steps and a higher (tighter) bound WITHOUT recompiling
    — the contract scipy_tol_minimize's level schedule rides on."""
    import jax

    X, Y = _data(rng, n=200, d=2)
    params = _sgpr_params(rng, X, Y, m=8)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    cfg = cglb_mod.CGLBConfig()
    v0 = cglb_mod.init_v0(X.shape[0])

    f = jax.jit(
        lambda me: cglb_mod.loss(params, Xj, Yj, v0, cfg, max_error=me)
    )
    l_loose, aux_loose = f(jnp.asarray(1.0))
    l_tight, aux_tight = f(jnp.asarray(1e-6))
    assert int(aux_tight.cg_steps) > int(aux_loose.cg_steps)
    assert float(aux_tight.cg_residual_error) < float(
        aux_loose.cg_residual_error)
    # tighter CG only RAISES the CGLB bound, i.e. lowers the loss
    assert float(l_tight) <= float(l_loose) + 1e-9
    # both tolerances ran the SAME compiled program
    assert f._cache_size() == 1


def test_scipy_tol_minimize_levels_and_depth(rng):
    """The adaptive schedule walks max_error 1.0 -> 1e-2, stays within the
    step budget, and ends at least as deep as the fixed-tolerance bridge."""
    X, Y = _data(rng, n=120, d=2)
    params = _sgpr_params(rng, X, Y, m=10)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    cfg = cglb_mod.CGLBConfig()
    v0 = cglb_mod.init_v0(X.shape[0])

    def loss_fn(p, carry, Xa, Ya):
        v = carry.v if isinstance(carry, cglb_mod.CGLBAux) else carry
        return cglb_mod.loss(p, Xa, Ya, v, cfg)

    def loss_fn_tol(p, carry, Xa, Ya, me):
        v = carry.v if isinstance(carry, cglb_mod.CGLBAux) else carry
        return cglb_mod.loss(p, Xa, Ya, v, cfg, max_error=me)

    budget = 250  # enough for every level to converge (floor is reached)
    res = training.scipy_tol_minimize(
        loss_fn, loss_fn_tol, params, v0, budget, data=(Xj, Yj))
    levels = res.info["opt/levels"]
    mes = [lv["max_error"] for lv in levels]
    assert mes[0] == pytest.approx(cfg.max_error)
    assert mes == sorted(mes, reverse=True)
    assert len(levels) >= 2
    assert mes[-1] == pytest.approx(1e-2)
    assert res.num_iters <= budget
    assert res.info["opt/num_fevals"] >= res.num_iters
    assert isinstance(res.state, cglb_mod.CGLBAux)

    res_fixed = training.scipy_minimize(
        loss_fn, params, v0, budget, data=(Xj, Yj))
    # level 0 replicates the fixed bridge; later levels only lower the loss
    # (tight bound >= loose bound at the handoff point, L-BFGS monotone)
    assert res.final_loss <= res_fixed.final_loss + 1e-6


def test_scipy_tol_resume_reenters_at_recorded_level(rng):
    """tol_resume (from a killed run's checkpoint) re-enters the schedule
    at the recorded level using the tol-parameterized program, instead of
    re-walking the loose levels; on_level reports the live level."""
    X, Y = _data(rng, n=100, d=2)
    params = _sgpr_params(rng, X, Y, m=8)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    cfg = cglb_mod.CGLBConfig()
    v0 = cglb_mod.init_v0(X.shape[0])

    def loss_fn(p, carry, Xa, Ya):
        v = carry.v if isinstance(carry, cglb_mod.CGLBAux) else carry
        return cglb_mod.loss(p, Xa, Ya, v, cfg)

    def loss_fn_tol(p, carry, Xa, Ya, me):
        v = carry.v if isinstance(carry, cglb_mod.CGLBAux) else carry
        return cglb_mod.loss(p, Xa, Ya, v, cfg, max_error=me)

    seen = []
    res = training.scipy_tol_minimize(
        loss_fn, loss_fn_tol, params, v0, 120, data=(Xj, Yj),
        tol_resume=0.1, on_level=seen.append)
    mes = [lv["max_error"] for lv in res.info["opt/levels"]]
    assert mes[0] == pytest.approx(0.1)  # no re-walk of the 1.0 level
    assert seen == mes
    assert all(m <= 0.1 + 1e-12 for m in mes)


def test_lbfgs_minimize_on_device(rng):
    X, Y = _data(rng)
    params = _sgpr_params(rng, X, Y)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def loss_fn(p, s):
        return -sgpr_mod.elbo(p, Xj, Yj), s

    l0 = float(loss_fn(params, None)[0])
    res = training.lbfgs_minimize(loss_fn, params, None, num_steps=25)
    assert res.final_loss < l0 - 1.0


def test_adam_minimize(rng):
    X, Y = _data(rng)
    params = _sgpr_params(rng, X, Y)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def loss_fn(p, s):
        return -sgpr_mod.elbo(p, Xj, Yj), s

    l0 = float(loss_fn(params, None)[0])
    res = training.adam_minimize(loss_fn, params, None, num_steps=50,
                                 learning_rate=0.05)
    assert res.final_loss < l0


def test_untrainable_params_not_updated(rng):
    X, Y = _data(rng)
    kern = k.make_kernel("Matern32", X.shape[1], dtype=np.float64)
    Z = X[:8]
    params = sgpr_mod.SGPRParams.create(kern, Z, dtype=np.float64,
                                        trainable_inducing=False)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def loss_fn(p, s):
        return -sgpr_mod.elbo(p, Xj, Yj), s

    res = training.scipy_minimize(loss_fn, params, None, num_steps=15)
    np.testing.assert_allclose(
        np.asarray(res.params.inducing_Z.value), Z, rtol=1e-12
    )
    # but the kernel did move
    assert not np.allclose(
        np.asarray(res.params.kernel.variance.value),
        np.asarray(params.kernel.variance.value),
    )


def test_conditional_variance_device_matches_numpy(rng):
    X = rng.normal(size=(60, 3))
    kern = k.make_kernel("Matern32", 3, dtype=np.float64)

    def kd(Xp):
        return np.asarray(k.kdiag(kern, jnp.asarray(Xp)))

    def kc(Xp, z):
        return np.asarray(k.K(kern, jnp.asarray(Xp), jnp.asarray(z)))

    Z1, idx1 = conditional_variance_numpy(X, 8, kd, kc, seed=3)
    Z2, idx2 = conditional_variance(X, 8, kern, seed=3)
    np.testing.assert_array_equal(idx1, idx2)
    np.testing.assert_allclose(Z1, Z2, rtol=1e-12)


def test_conditional_variance_spreads_points(rng):
    """Greedy selection should never pick the same point twice."""
    X = rng.normal(size=(100, 2))
    kern = k.make_kernel("rbf", 2, dtype=np.float64)
    _, idx = conditional_variance(X, 16, kern, seed=0)
    assert len(set(idx.tolist())) == 16


def test_logger_records_feval_cg_stats(rng, tmp_path):
    """Per-feval CG stats land in the logs (reference: callbacks.py:122-125)."""
    from cglb_tpu.backend import Jax
    from cglb_tpu.configs import CGLBConfig, InducingVariableConfig, \
        Matern32Config
    from cglb_tpu.experiments.datasets import get_dataset
    from cglb_tpu.utils.logging import Logger

    bundle = get_dataset("synth_150x2")
    model = Jax.create_model(
        CGLBConfig(Matern32Config(), InducingVariableConfig(8)), bundle.train,
        seed=0,
    )
    metrics_fn = Jax.metrics_fn(model, bundle.to_tuple())
    logger = Logger(str(tmp_path), metrics_fn,
                    lambda: Jax.model_parameters(model), holdout_interval=5,
                    include_feval_log=True, tensorboard=False)
    Jax.optimize(model, bundle.to_tuple(), num_steps=8, logger=logger,
                 optimizer="scipy")
    assert "cg/steps-per-feval" in logger.logs
    assert len(logger.logs["cg/steps-per-feval"]) >= 8
    assert "loss" in logger.logs  # holdout records
    # params exclude inducing points (reference Logger include() filter)
    assert all("inducing" not in k for rec in logger.logs["params"]
               for k in rec)


def test_logger_no_recording_context(tmp_path):
    from cglb_tpu.utils.logging import Logger

    logger = Logger(str(tmp_path), lambda: {"loss": 1.0}, lambda: {},
                    holdout_interval=1, include_feval_log=True,
                    tensorboard=False)
    logger.timer.start()
    with logger.no_recording():
        logger(0)
        logger.log_for_feval(x=1)
    assert "loss" not in logger.logs
    assert "x-per-feval" not in logger.logs
    logger(1)
    assert "loss" in logger.logs


def test_logger_metrics_track_live_params(rng, tmp_path):
    """Mid-run holdout metrics must be evaluated at the CURRENT optimizer
    iterate, not the initial parameters (regression: the model object was
    only updated after scipy finished, so every metric-vs-time curve was
    flat at the init values).  Reference assigns params into the live model
    on every feval (pytorch/optimizer.py:42-46)."""
    from cglb_tpu.backend import Jax
    from cglb_tpu.configs import CGLBConfig, InducingVariableConfig, \
        Matern32Config
    from cglb_tpu.experiments.datasets import get_dataset
    from cglb_tpu.utils.logging import Logger

    bundle = get_dataset("synth_150x2")
    model = Jax.create_model(
        CGLBConfig(Matern32Config(), InducingVariableConfig(8)), bundle.train,
        seed=0,
    )
    metrics_fn = Jax.metrics_fn(model, bundle.to_tuple())
    logger = Logger(str(tmp_path), metrics_fn,
                    lambda: Jax.model_parameters(model), holdout_interval=1,
                    tensorboard=False)
    Jax.optimize(model, bundle.to_tuple(), num_steps=6, logger=logger,
                 optimizer="scipy")
    losses = [float(x) for x in logger.logs["loss"]]
    variances = [float(np.asarray(p[".kernel.variance"]))
                 for p in logger.logs["params"]]
    assert len(losses) >= 3
    assert len(set(np.round(losses, 10))) > 1, "metrics frozen at init params"
    assert len(set(np.round(variances, 12))) > 1, "params frozen in logs"
    assert losses[-1] < losses[0]


def test_scipy_minimize_nan_penalty_backoff(rng):
    """Non-finite losses return a finite penalty bowl, not raw NaN: scipy's
    line search then backs off via interpolation in 1-2 evals instead of
    ~12 blind halvings per probe episode (VERDICT r2 weak #3).  The model:
    a quadratic whose unconstrained optimum sits beyond a NaN cliff, so the
    optimizer repeatedly probes the cliff on its way to the constrained
    optimum — each probe episode must stay short."""
    import jax

    from cglb_tpu.transforms import Param
    from cglb_tpu.struct import pytree_dataclass

    @pytree_dataclass
    class P:
        w: Param

    counts = {"nan": 0, "total": 0, "run": 0, "max_run": 0}

    def record(loss_val):
        counts["total"] += 1
        if not np.isfinite(float(loss_val)):
            counts["nan"] += 1
            counts["run"] += 1
            counts["max_run"] = max(counts["max_run"], counts["run"])
        else:
            counts["run"] = 0

    def counted(p, s):
        w = p.w.value
        loss = jnp.where(
            jnp.max(jnp.abs(w)) > 2.0,
            jnp.asarray(float("nan"), w.dtype),
            jnp.sum((w - 3.0) ** 2),
        )
        # debug.callback: jit- and grad-safe host-side counting
        jax.debug.callback(record, loss, ordered=True)
        return loss, s

    params = P(w=Param(raw=jnp.asarray([0.0, 0.0]), trainable=True))
    res = training.scipy_minimize(counted, params, None, num_steps=60)
    w = np.asarray(res.params.w.value)
    # converged to the cliff-constrained optimum, not stuck or NaN
    assert np.isfinite(res.final_loss)
    assert np.all(w > 1.5) and np.all(w <= 2.0), w
    assert counts["nan"] >= 1, "test never exercised the NaN cliff"
    # the penalty bowl keeps each probe episode short (raw-NaN backoff blind-
    # halves ~12x per episode; the finite bowl interpolates back in 1-2)
    assert counts["max_run"] <= 4, counts
