import jax
import jax.numpy as jnp
import numpy as np

from cglb_tpu.ops import kernels as k
from cglb_tpu.models import cglb, gpr, sgpr


def _setup(rng, n=64, d=3, m=12, noise=0.6):
    X = rng.normal(size=(n, d))
    w = rng.normal(size=(d, 1))
    Y = np.tanh(X @ w) + 0.1 * rng.normal(size=(n, 1))
    kern = k.make_kernel("Matern32", d, variance=1.2, lengthscales=1.1,
                         dtype=np.float64)
    Z = X[rng.choice(n, m, replace=False)]
    params = sgpr.SGPRParams.create(kern, Z, noise_variance=noise, dtype=np.float64)
    gparams = gpr.GPRParams.create(kern, noise_variance=noise, dtype=np.float64)
    return jnp.asarray(X), jnp.asarray(Y), params, gparams


def test_cglb_bracket(rng):
    """ELBO <= CGLB <= LML <= Titsias upper (the paper's key property)."""
    X, Y, params, gparams = _setup(rng)
    cfg = cglb.CGLBConfig(max_error=1e-8, max_cg_iters=200)
    v0 = cglb.init_v0(X.shape[0])
    b, aux = cglb.bound(params, X, Y, v0, cfg)
    e = float(sgpr.elbo(params, X, Y))
    l = float(gpr.log_marginal_likelihood(gparams, X, Y))
    u = float(sgpr.upper_bound(params, X, Y))
    assert e <= float(b) + 1e-8, (e, float(b))
    assert float(b) <= l + 1e-8, (float(b), l)
    assert l <= u + 1e-8


def test_cglb_bound_with_loose_cg_still_lower_bound(rng):
    X, Y, params, gparams = _setup(rng)
    l = float(gpr.log_marginal_likelihood(gparams, X, Y))
    for max_error in (10.0, 1.0, 1e-2):
        cfg = cglb.CGLBConfig(max_error=max_error)
        b, _ = cglb.bound(params, X, Y, cglb.init_v0(X.shape[0]), cfg)
        assert float(b) <= l + 1e-8


def test_cglb_vzero_is_lower_bound(rng):
    X, Y, params, gparams = _setup(rng)
    cfg = cglb.CGLBConfig(vzero=True)
    b, aux = cglb.bound(params, X, Y, cglb.init_v0(X.shape[0]), cfg)
    l = float(gpr.log_marginal_likelihood(gparams, X, Y))
    assert float(b) <= l + 1e-8
    assert int(aux.cg_steps) == 0


def test_cglb_logdet_variants_are_lower_bounds(rng):
    X, Y, params, gparams = _setup(rng)
    l = float(gpr.log_marginal_likelihood(gparams, X, Y))
    for variant in ("jensen", "n2m", "nm2"):
        cfg = cglb.CGLBConfig(max_error=1e-8, max_cg_iters=200,
                              logdet_variant=variant)
        b, _ = cglb.bound(params, X, Y, cglb.init_v0(X.shape[0]), cfg)
        assert float(b) <= l + 1e-8, variant


def test_warm_start_reuses_solution(rng):
    """Second evaluation warm-started from the converged v takes 0 CG steps
    (the reference's v0 warm-start semantics, tensorflow/models.py:172)."""
    X, Y, params, _ = _setup(rng)
    cfg = cglb.CGLBConfig(max_error=0.1)
    v0 = cglb.init_v0(X.shape[0])
    b1, aux1 = cglb.bound(params, X, Y, v0, cfg)
    assert int(aux1.cg_steps) > 0
    b2, aux2 = cglb.bound(params, X, Y, aux1.v, cfg)
    assert int(aux2.cg_steps) == 0
    np.testing.assert_allclose(float(b1), float(b2), rtol=1e-10)


def test_vzero_gradients_match_finite_differences(rng):
    """With v fixed (vzero), the loss is an ordinary differentiable function;
    check the kernel-variance gradient against central differences."""
    X, Y, params, _ = _setup(rng, n=32, m=8)
    # fp64 preconditioner: the FD probe needs bitwise-smooth evaluations
    cfg = cglb.CGLBConfig(vzero=True, precond_dtype="float64")
    v0 = jnp.asarray(rng.normal(size=(1, X.shape[0])) * 0.01)

    def f_of_raw(raw):
        kern = k.Matern32(
            variance=jax.tree_util.tree_map(lambda _: raw, params.kernel.variance),
            lengthscales=params.kernel.lengthscales,
        )
        p2 = sgpr.SGPRParams(
            kernel=kern,
            inducing_Z=params.inducing_Z,
            noise_variance=params.noise_variance,
            mean=params.mean,
        )
        return cglb.loss(p2, X, Y, v0, cfg)[0]

    raw0 = params.kernel.variance.raw
    g = float(jax.grad(f_of_raw)(raw0))
    eps = 1e-6
    fd = (float(f_of_raw(raw0 + eps)) - float(f_of_raw(raw0 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_fast_precond_matches_fp64_precond(rng):
    """float32 preconditioner (default, TPU fast path) changes the bound by
    at most ~1e-6 relative vs the fp64 preconditioner."""
    X, Y, params, _ = _setup(rng)
    v0 = cglb.init_v0(X.shape[0])
    b32, _ = cglb.bound(params, X, Y, v0,
                        cglb.CGLBConfig(precond_dtype="float32"))
    b64, _ = cglb.bound(params, X, Y, v0,
                        cglb.CGLBConfig(precond_dtype="float64"))
    np.testing.assert_allclose(float(b32), float(b64), rtol=1e-5)


def test_cg_mode_gradients_finite(rng):
    X, Y, params, _ = _setup(rng, n=32, m=8)
    cfg = cglb.CGLBConfig(max_error=0.01)
    v0 = cglb.init_v0(X.shape[0])
    g = jax.grad(lambda p: cglb.loss(p, X, Y, v0, cfg)[0])(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)


def test_predict_matches_exact_gp_at_tight_tolerance(rng):
    """With CG run to convergence the CGLB posterior mean is the exact GP mean
    (reference docstring, tensorflow/models.py:199-202)."""
    X, Y, params, gparams = _setup(rng, n=48, m=10)
    Xs = jnp.asarray(np.random.default_rng(5).normal(size=(9, 3)))
    cfg = cglb.CGLBConfig(max_cg_iters=300)
    v0 = cglb.init_v0(X.shape[0])
    mean_cglb, _ = cglb.predict_f(params, X, Y, v0, Xs, cfg, cg_tolerance=1e-12)
    mean_gpr, _ = gpr.predict_f(gparams, X, Y, Xs)
    np.testing.assert_allclose(
        np.asarray(mean_cglb), np.asarray(mean_gpr), rtol=1e-5, atol=1e-7
    )


def test_predict_vzero_equals_sgpr_mean(rng):
    """v = 0 recovers the SGPR posterior mean (same docstring)."""
    X, Y, params, _ = _setup(rng, n=48, m=10)
    Xs = jnp.asarray(np.random.default_rng(7).normal(size=(6, 3)))
    v0 = cglb.init_v0(X.shape[0])
    mean_cglb, var_cglb = cglb.predict_f(
        params, X, Y, v0, Xs, cglb.CGLBConfig(), cg_tolerance=None
    )
    mean_sgpr, var_sgpr = sgpr.predict_f(params, X, Y, Xs)
    np.testing.assert_allclose(
        np.asarray(mean_cglb), np.asarray(mean_sgpr), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(var_cglb), np.asarray(var_sgpr), rtol=1e-8, atol=1e-10
    )


def test_loss_is_jittable_and_stable_across_calls(rng):
    X, Y, params, _ = _setup(rng)
    cfg = cglb.CGLBConfig()
    v0 = cglb.init_v0(X.shape[0])
    f = jax.jit(lambda p, v: cglb.loss(p, X, Y, v, cfg))
    l1, aux1 = f(params, v0)
    l2, aux2 = f(params, aux1.v)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-9)


def test_mixed_common_terms_close_to_fp64(rng):
    """common_dtype='mixed' (fp64 distances + df32 kernel profile + fp64
    solves, the default) matches the all-fp64 bound to fp64-grade accuracy.

    Compared at tight CG convergence so both paths use the same v — at loose
    max_error the CG step count is discrete and a one-step difference changes
    the (still valid) bound by far more than any precision effect."""
    X, Y, params, _ = _setup(rng)
    v0 = cglb.init_v0(X.shape[0])
    kw = dict(max_error=1e-12, max_cg_iters=400)
    c64 = cglb.CGLBConfig(common_dtype="float64", **kw)
    cmx = cglb.CGLBConfig(common_dtype="mixed", **kw)
    b64, _ = cglb.bound(params, X, Y, v0, c64)
    bmx, _ = cglb.bound(params, X, Y, v0, cmx)
    np.testing.assert_allclose(float(bmx), float(b64), rtol=1e-10)

    g64 = jax.grad(lambda p: cglb.loss(p, X, Y, v0, c64)[0])(params)
    gmx = jax.grad(lambda p: cglb.loss(p, X, Y, v0, cmx)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g64),
                    jax.tree_util.tree_leaves(gmx)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.max(np.abs(a)), 1e-12)
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-6)
