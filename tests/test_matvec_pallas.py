"""Streaming Pallas matvec vs the dense fp64 oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cglb_tpu.ops import kernels as k
from cglb_tpu.ops import matvec_pallas as mv


def _kern(name, d, rng):
    kern = k.make_kernel(name, d, dtype=np.float64)
    # non-trivial hyperparameters
    import dataclasses

    from cglb_tpu.transforms import Param

    kern = dataclasses.replace(
        kern,
        variance=Param.positive(1.7, lower=1e-6),
        lengthscales=Param.positive(
            jnp.asarray(rng.uniform(0.5, 2.0, size=(d,))), lower=1e-6
        ),
    )
    return kern


@pytest.mark.parametrize("family", ["rbf", "mat32"])
def test_streaming_matches_dense(rng, family):
    n, d = 300, 5  # not a multiple of block size: exercises padding
    X = jnp.asarray(rng.normal(size=(n, d)))
    p = jnp.asarray(rng.normal(size=(1, n)))
    kern = _kern(family, d, rng)
    dense = np.asarray(p @ k.K(kern, X))
    got = np.asarray(
        mv.kernel_matvec(kern, X, p, block_i=128, block_j=128, interpret=True)
    )
    scale = np.max(np.abs(dense))
    # NOTE: interpret mode (XLA-CPU bf16 dot) accumulates slightly worse than
    # the real MXU: worst-element ~2e-5 here vs ~2e-6 measured on TPU v5e.
    np.testing.assert_allclose(got, dense, atol=5e-5 * scale, rtol=5e-5)


def test_streaming_operator_includes_noise(rng):
    n, d = 200, 3
    X = jnp.asarray(rng.normal(size=(n, d)))
    p = jnp.asarray(rng.normal(size=(1, n)))
    kern = _kern("rbf", d, rng)
    sigma_sq = jnp.asarray(0.37)
    op = mv.make_streaming_operator(kern, X, sigma_sq, 128, 128, interpret=True)
    dense = np.asarray(p @ (k.K(kern, X) + 0.37 * np.eye(n)))
    got = np.asarray(op(p))
    scale = np.max(np.abs(dense))
    np.testing.assert_allclose(got, dense, atol=3e-6 * scale, rtol=1e-5)


def test_hi_lo_split_exact():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(50, 3)) * 1000)
    hi, lo = mv.split_hi_lo(x)
    recon = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x), rtol=1e-14)


@pytest.mark.parametrize("family", ["rbf", "mat32"])
def test_streaming_gradients_match_dense(rng, family):
    """Gradients of a scalar functional of the matvec w.r.t. kernel params and
    p must match the dense-path autodiff."""
    n, d = 160, 4
    X = jnp.asarray(rng.normal(size=(n, d)))
    p = jnp.asarray(rng.normal(size=(1, n)))
    w = jnp.asarray(rng.normal(size=(1, n)))
    kern = _kern(family, d, rng)

    def f_stream(kern, p):
        out = mv.kernel_matvec(kern, X, p, 128, 128, interpret=True)
        return jnp.sum(out * w)

    def f_dense(kern, p):
        return jnp.sum((p @ k.K(kern, X)) * w)

    gs = jax.grad(f_stream, argnums=(0, 1))(kern, p)
    gd = jax.grad(f_dense, argnums=(0, 1))(kern, p)

    g_var_s = float(gs[0].variance.raw)
    g_var_d = float(gd[0].variance.raw)
    np.testing.assert_allclose(g_var_s, g_var_d, rtol=2e-4)

    g_ls_s = np.asarray(gs[0].lengthscales.raw)
    g_ls_d = np.asarray(gd[0].lengthscales.raw)
    np.testing.assert_allclose(g_ls_s, g_ls_d, rtol=5e-4, atol=1e-6)

    np.testing.assert_allclose(
        np.asarray(gs[1]), np.asarray(gd[1]), rtol=1e-4,
        atol=1e-6 * float(jnp.max(jnp.abs(gd[1]))),
    )


def test_cglb_loss_with_streaming_operator_matches_dense(rng):
    """Full CGLB loss evaluated with the streaming matvec agrees with the dense
    path to streaming precision."""
    from cglb_tpu.models import cglb as cglb_mod
    from cglb_tpu.models import sgpr as sgpr_mod

    n, d, m = 192, 3, 12
    X = rng.normal(size=(n, d))
    Y = np.sin(X[:, :1]) + 0.05 * rng.normal(size=(n, 1))
    kern = k.make_kernel("Matern32", d, dtype=np.float64)
    Z = X[rng.choice(n, m, replace=False)]
    params = sgpr_mod.SGPRParams.create(kern, Z, noise_variance=0.5,
                                        dtype=np.float64)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    cfg = cglb_mod.CGLBConfig(max_error=0.01)
    v0 = cglb_mod.init_v0(n)

    l_dense, aux_d = cglb_mod.loss(params, Xj, Yj, v0, cfg)
    op = mv.make_streaming_operator(
        kern and params.kernel, Xj, params.noise_variance.value, 64, 64,
        interpret=True,
    )
    l_stream, aux_s = cglb_mod.loss(params, Xj, Yj, v0, cfg, matvec=op)
    np.testing.assert_allclose(float(l_stream), float(l_dense), rtol=1e-5)


def test_cross_matvec_matches_dense(rng):
    """Rectangular streaming contraction vs dense cross-kernel product."""
    nr, nc, d = 150, 90, 4
    Xr = jnp.asarray(rng.normal(size=(nr, d)))
    Xc = jnp.asarray(rng.normal(size=(nc, d)))
    p = jnp.asarray(rng.normal(size=(1, nr)))
    kern = _kern("mat32", d, rng)
    got = np.asarray(
        mv.kernel_cross_matvec(kern, Xr, Xc, p, 64, 64, interpret=True)
    )
    want = np.asarray(p @ k.K(kern, Xr, Xc))
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=5e-5 * scale, rtol=5e-5)


def test_cglb_predict_with_cross_matvec_matches_dense(rng):
    from cglb_tpu.models import cglb as cglb_mod
    from cglb_tpu.models import sgpr as sgpr_mod

    n, d, m, s = 160, 3, 10, 40
    X = rng.normal(size=(n, d))
    Y = np.sin(X[:, :1]) + 0.05 * rng.normal(size=(n, 1))
    Xs = jnp.asarray(rng.normal(size=(s, d)))
    kern = k.make_kernel("Matern32", d, dtype=np.float64)
    params = sgpr_mod.SGPRParams.create(kern, X[:m], noise_variance=0.5,
                                        dtype=np.float64)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    cfg = cglb_mod.CGLBConfig()
    v0 = cglb_mod.init_v0(n)
    mean_d, var_d = cglb_mod.predict_f(params, Xj, Yj, v0, Xs, cfg,
                                       cg_tolerance=1e-8)
    op = mv.make_streaming_operator(params.kernel, Xj,
                                    params.noise_variance.value, 64, 64,
                                    interpret=True)
    cross = lambda v: mv.kernel_cross_matvec(params.kernel, Xj, Xs, v, 64, 64,
                                             interpret=True)
    mean_s, var_s = cglb_mod.predict_f(params, Xj, Yj, v0, Xs, cfg,
                                       cg_tolerance=1e-8, matvec=op,
                                       cross_matvec=cross)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_d),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_d),
                               rtol=1e-4, atol=1e-8)
