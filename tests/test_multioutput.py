"""Multi-output (D > 1) and joint-v / fp32-mode coverage."""

import jax.numpy as jnp
import numpy as np
import pytest

from cglb_tpu.models import cglb, gpr, sgpr
from cglb_tpu.ops import kernels as k


def _setup_multi(rng, n=48, d=2, m=8, out=3):
    X = rng.normal(size=(n, d))
    W = rng.normal(size=(d, out))
    Y = np.tanh(X @ W) + 0.05 * rng.normal(size=(n, out))
    kern = k.make_kernel("rbf", d, dtype=np.float64)
    Z = X[rng.choice(n, m, replace=False)]
    params = sgpr.SGPRParams.create(kern, Z, noise_variance=0.4,
                                    output_dim=out, dtype=np.float64)
    gparams = gpr.GPRParams.create(kern, noise_variance=0.4, output_dim=out,
                                   dtype=np.float64)
    return jnp.asarray(X), jnp.asarray(Y), params, gparams


def test_multioutput_bracket(rng):
    """D=3 outputs: ELBO <= CGLB <= LML still holds (shared kernel/noise)."""
    X, Y, params, gparams = _setup_multi(rng)
    cfg = cglb.CGLBConfig(max_error=1e-8, max_cg_iters=300)
    v0 = cglb.init_v0(X.shape[0], output_dim=3)
    b, aux = cglb.bound(params, X, Y, v0, cfg)
    e = float(sgpr.elbo(params, X, Y))
    l = float(gpr.log_marginal_likelihood(gparams, X, Y))
    assert e <= float(b) + 1e-8
    assert float(b) <= l + 1e-8
    assert aux.v.shape == (3, X.shape[0])


def test_multioutput_predict_matches_gpr(rng):
    X, Y, params, gparams = _setup_multi(rng)
    Xs = jnp.asarray(np.random.default_rng(3).normal(size=(7, 2)))
    cfg = cglb.CGLBConfig(max_cg_iters=400)
    v0 = cglb.init_v0(X.shape[0], output_dim=3)
    mean_c, var_c = cglb.predict_f(params, X, Y, v0, Xs, cfg,
                                   cg_tolerance=1e-12)
    mean_g, var_g = gpr.predict_f(gparams, X, Y, Xs)
    assert mean_c.shape == (7, 3)
    np.testing.assert_allclose(np.asarray(mean_c), np.asarray(mean_g),
                               rtol=1e-4, atol=1e-6)


def test_joint_optimization_v_gradients(rng):
    """vjoint mode: v is a trainable input and gradients flow into it."""
    import jax

    X, Y, params, _ = _setup_multi(rng, out=1)
    cfg = cglb.CGLBConfig(joint_optimization=True)
    v0 = jnp.asarray(rng.normal(size=(1, X.shape[0])) * 0.01)

    g = jax.grad(lambda v: cglb.loss(params, X, Y, v, cfg)[0])(v0)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0  # gradient actually flows into v


def test_fp32_mode_end_to_end(rng):
    """fp32 process mode (reference -t fp32): bound finite, CG converges."""
    X = rng.normal(size=(40, 2)).astype(np.float32)
    Y = np.sin(X[:, :1]).astype(np.float32)
    kern = k.make_kernel("Matern32", 2, dtype=np.float32, lower=5e-3)
    params = sgpr.SGPRParams.create(kern, X[:8], noise_variance=0.5,
                                    dtype=np.float32, variance_lower=5e-3)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    cfg = cglb.CGLBConfig(max_error=0.5)
    v0 = cglb.init_v0(40, dtype=np.float32)
    l, aux = cglb.loss(params, Xj, Yj, v0, cfg, jitter=1e-5)
    assert np.isfinite(float(l))
    assert aux.v.dtype == jnp.float32


def test_vjoint_end_to_end_optimizes_v(rng):
    """--vjoint through the Model/backend layer: v0 is a trainable leaf, the
    optimizer actually changes it, and no CG runs (VERDICT r1 missing #2;
    reference: tensorflow/models.py:44-46 trainable v0 Parameter)."""
    from cglb_tpu import configs as C
    from cglb_tpu.backend import Jax
    from cglb_tpu.utils import flatten as fl

    n = 48
    X = rng.normal(size=(n, 2))
    Y = np.sin(X[:, :1]) + 0.05 * rng.normal(size=(n, 1))
    cfg = C.CGLBConfig(
        kernel=C.Matern32Config(),
        inducing_variable=C.InducingVariableConfig(num_variables=8),
        joint_optimization=True,
    )
    model = Jax.create_model(cfg, (X, Y), seed=0)
    assert model.params.v0 is not None and model.params.v0.trainable
    # flattened vector includes the n-dim v block
    base = C.CGLBConfig(
        kernel=C.Matern32Config(),
        inducing_variable=C.InducingVariableConfig(num_variables=8),
    )
    model_plain = Jax.create_model(base, (X, Y), seed=0)
    n_flat = len(fl.flatten_trainable(model.params))
    n_flat_plain = len(fl.flatten_trainable(model_plain.params))
    assert n_flat == n_flat_plain + n

    v_before = np.asarray(model.params.v0.value).copy()
    res = Jax.optimize(model, None, num_steps=8, optimizer="scipy")
    v_after = np.asarray(model.params.v0.value)
    assert np.abs(v_after - v_before).max() > 1e-8, "v never moved"
    assert model.cg_steps == 0, "vjoint must not run CG"
    # model.v0 synced from the trained leaf for prediction/checkpointing
    np.testing.assert_allclose(np.asarray(model.v0), v_after)
    # and a vzero model's v stays zeros under training
    zcfg = C.CGLBConfig(
        kernel=C.Matern32Config(),
        inducing_variable=C.InducingVariableConfig(num_variables=8),
        vzero=True,
    )
    zmodel = Jax.create_model(zcfg, (X, Y), seed=0)
    Jax.optimize(zmodel, None, num_steps=3, optimizer="scipy")
    assert np.abs(np.asarray(zmodel.v0)).max() == 0.0
