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
