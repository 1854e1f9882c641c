"""Native C++ module tests (built on demand with g++; skipped if unavailable)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cglb_tpu.ops import kernels as k
from cglb_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)


def test_native_version():
    lib = native.load_native()
    assert lib.cglb_native_version() == 1


def test_native_conditional_variance_matches_numpy(rng):
    from cglb_tpu.utils.inducing import conditional_variance_numpy

    X = rng.normal(size=(80, 4))
    kern = k.make_kernel("Matern32", 4, dtype=np.float64)

    def kd(Xp):
        return np.asarray(k.kdiag(kern, jnp.asarray(Xp)))

    def kc(Xp, z):
        return np.asarray(k.K(kern, jnp.asarray(Xp), jnp.asarray(z)))

    Z_np, idx_np = conditional_variance_numpy(X, 10, kd, kc, seed=5)
    Z_cc, idx_cc = native.conditional_variance_native(X, 10, kern, seed=5)
    np.testing.assert_array_equal(idx_np, idx_cc)
    np.testing.assert_allclose(Z_np, Z_cc, rtol=1e-12)


def test_native_conditional_variance_rbf(rng):
    X = rng.normal(size=(60, 3))
    kern = k.make_kernel("rbf", 3, dtype=np.float64)
    Z, idx = native.conditional_variance_native(X, 12, kern, seed=0)
    assert len(set(idx.tolist())) == 12
    assert Z.shape == (12, 3)


def test_native_lbfgs_rosenbrock():
    """Classic Rosenbrock: native L-BFGS must reach the optimum."""

    def f_and_g(x):
        a, b = 1.0, 100.0
        f = (a - x[0]) ** 2 + b * (x[1] - x[0] ** 2) ** 2
        g = np.array([
            -2 * (a - x[0]) - 4 * b * x[0] * (x[1] - x[0] ** 2),
            2 * b * (x[1] - x[0] ** 2),
        ])
        return f, g

    opt = native.NativeLBFGS(2, history=10)
    x = np.array([-1.2, 1.0])
    for _ in range(500):
        f, g = f_and_g(x)
        status, x = opt.step(x, f, g)
        if status in (native.NativeLBFGS.CONVERGED, native.NativeLBFGS.FAIL):
            break
    np.testing.assert_allclose(opt.best_x, [1.0, 1.0], atol=1e-5)


def test_native_lbfgs_quadratic_converges_fast():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(20, 20))
    Q = A @ A.T + np.eye(20)
    b = rng.normal(size=20)

    def f_and_g(x):
        return 0.5 * x @ Q @ x - b @ x, Q @ x - b

    opt = native.NativeLBFGS(20)
    x = np.zeros(20)
    for _ in range(300):
        f, g = f_and_g(x)
        status, x = opt.step(x, f, g)
        if status == native.NativeLBFGS.CONVERGED:
            break
    want = np.linalg.solve(Q, b)
    np.testing.assert_allclose(opt.best_x, want, rtol=1e-5, atol=1e-6)


def test_native_lbfgs_trains_sgpr(rng):
    """End-to-end: native L-BFGS drives a jitted SGPR loss."""
    from cglb_tpu.models import sgpr as sgpr_mod
    from cglb_tpu.utils import training

    X = rng.normal(size=(60, 2))
    Y = np.sin(X[:, :1]) + 0.05 * rng.normal(size=(60, 1))
    kern = k.make_kernel("Matern32", 2, dtype=np.float64)
    params = sgpr_mod.SGPRParams.create(kern, X[:8], dtype=np.float64)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def loss_fn(p, s):
        return -sgpr_mod.elbo(p, Xj, Yj), s

    l0 = float(loss_fn(params, None)[0])
    res = training.native_lbfgs_minimize(loss_fn, params, None, num_steps=30)
    assert res.final_loss < l0 - 1.0
