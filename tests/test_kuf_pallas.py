"""Fused Pallas Kuf builder (ops/kuf_pallas) vs the XLA df32 route and a host
fp64 oracle — interpret mode (CPU), both kernel families.

The contract under test: kuf_build is a drop-in for the VALUE of
models/sgpr._kuf_block_df32 (~1e-11 relative), with f32-grade analytic
gradients w.r.t. (Z, lengthscales, variance) and a zero cotangent for X
(X is data, never a trainable leaf)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cglb_tpu.models import sgpr as sgpr_mod
from cglb_tpu.ops import kernels as k
from cglb_tpu.ops import kuf_pallas as kp

FAMILIES = ["Matern32", "SquaredExponential"]


def _setup(rng, family, m=48, n=160, d=5, ls=0.7):
    kern = k.make_kernel(family, d, variance=1.3, lengthscales=ls,
                         dtype=np.float64)
    Z = jnp.asarray(rng.normal(size=(m, d)))
    X = jnp.asarray(rng.normal(size=(n, d)))
    params = sgpr_mod.SGPRParams.create(kern, Z, noise_variance=0.3,
                                        dtype=np.float64)
    return params, Z, X


def _build(params, Z, X):
    return kp.kuf_build(params.kernel, Z, X, block_m=32, block_n=64,
                        interpret=True)


@pytest.mark.parametrize("family", FAMILIES)
def test_forward_matches_xla_df32(rng, family):
    params, Z, X = _setup(rng, family)
    got = _build(params, Z, X)
    want = sgpr_mod._kuf_block_df32(params, Z, X, pallas=False)
    err = np.max(np.abs(np.asarray(got - want))) / np.max(np.abs(want))
    assert err < 1e-10, err


@pytest.mark.parametrize("family", FAMILIES)
def test_forward_matches_dense_oracle(rng, family):
    params, Z, X = _setup(rng, family)
    got = _build(params, Z, X)
    want = k.K(params.kernel, Z, X)  # exact fp64 dense build
    err = np.max(np.abs(np.asarray(got - want))) / np.max(np.abs(want))
    assert err < 1e-9, err


def test_coincident_and_far_points(rng):
    """d2 = 0 rows (Z points duplicated into X) stay finite and exact;
    far-apart points underflow the profile to 0 like the fp64 build."""
    params, Z, X = _setup(rng, "Matern32", m=16, n=32, d=3)
    X = X.at[:16].set(Z)                       # exact duplicates
    X = X.at[16:20].set(X[16:20] + 1e4)        # far away: rho -> 0
    got = _build(params, Z, X)
    assert bool(jnp.all(jnp.isfinite(got)))
    var = params.kernel.variance.value
    np.testing.assert_allclose(np.diag(np.asarray(got[:, :16])),
                               float(var), rtol=1e-12)
    assert float(jnp.max(jnp.abs(got[:, 16:20]))) < 1e-30


def test_tiny_lengthscale_matches_xla(rng):
    """Line-search extreme: ls at the fp64 positive lower bound floor."""
    params, Z, X = _setup(rng, "Matern32", ls=1e-6)
    got = _build(params, Z, X)
    want = sgpr_mod._kuf_block_df32(params, Z, X, pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-10)


@pytest.mark.parametrize("family", FAMILIES)
def test_grads_match_xla_path(rng, family):
    """Parameter cotangents (Z, ls, var) at f32 grade vs the fp64 autodiff
    of the XLA df32 route, under a generic weighted-sum loss."""
    params, Z, X = _setup(rng, family, m=32, n=96, d=4)
    W = jnp.asarray(rng.normal(size=(params.num_inducing, X.shape[0])))

    def loss_pallas(kern):
        return jnp.sum(W * kp.kuf_build(kern, Z, X, block_m=32, block_n=64,
                                        interpret=True))

    def loss_xla(kern):
        p2 = jax.tree_util.tree_map(lambda a: a, params)
        p2 = type(params)(kernel=kern, inducing_Z=params.inducing_Z,
                          noise_variance=params.noise_variance,
                          mean=params.mean, v0=params.v0)
        return jnp.sum(W * sgpr_mod._kuf_block_df32(p2, Z, X, pallas=False))

    g_got = jax.grad(loss_pallas)(params.kernel)
    g_want = jax.grad(loss_xla)(params.kernel)
    for leaf_got, leaf_want in zip(
        jax.tree_util.tree_leaves(g_got), jax.tree_util.tree_leaves(g_want)
    ):
        scale = max(float(jnp.max(jnp.abs(leaf_want))), 1e-8)
        np.testing.assert_allclose(np.asarray(leaf_got),
                                   np.asarray(leaf_want),
                                   rtol=0, atol=2e-5 * scale)


def test_grad_wrt_z(rng):
    """dZ at f32 grade vs the XLA route's fp64 autodiff."""
    params, Z, X = _setup(rng, "Matern32", m=24, n=64, d=3)
    W = jnp.asarray(rng.normal(size=(24, 64)))

    def loss_pallas(Zv):
        return jnp.sum(W * kp.kuf_build(params.kernel, Zv, X, block_m=32,
                                        block_n=64, interpret=True))

    def loss_xla(Zv):
        return jnp.sum(W * sgpr_mod._kuf_block_df32(params, Zv, X,
                                                    pallas=False))

    g_got = jax.grad(loss_pallas)(Z)
    g_want = jax.grad(loss_xla)(Z)
    scale = float(jnp.max(jnp.abs(g_want)))
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=0, atol=2e-5 * scale)


def test_x_cotangent_is_zero(rng):
    params, Z, X = _setup(rng, "Matern32", m=16, n=48, d=3)
    g = jax.grad(
        lambda Xv: jnp.sum(kp.kuf_build(params.kernel, Z, Xv, block_m=32,
                                        block_n=64, interpret=True))
    )(X)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_sharded_build_matches_xla_route():
    """kuf_build_sharded on an 8-device CPU mesh (interpret mode forced):
    value matches the XLA df32 route, and the replicated-input cotangents
    (Z, ls, var) come back correctly psummed by shard_map's reverse."""
    from cglb_tpu.parallel import mesh as mesh_mod
    from cglb_tpu.parallel.mesh import DATA_AXIS

    rng = np.random.default_rng(7)
    mesh = mesh_mod.data_mesh(8)
    params, Z, X = _setup(rng, "Matern32", m=16, n=64, d=3)

    def build_sharded(kern, Zv):
        return kp.kuf_build_sharded(kern, Zv, X, mesh, DATA_AXIS,
                                    block_m=16, block_n=32, interpret=True)

    got = build_sharded(params.kernel, Z)
    want = sgpr_mod._kuf_block_df32(params, Z, X, pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-11)

    W = jnp.asarray(rng.normal(size=(16, 64)))
    g_got = jax.grad(
        lambda kern: jnp.sum(W * build_sharded(kern, Z)))(params.kernel)
    def xla_loss(kern):
        p2 = type(params)(kernel=kern, inducing_Z=params.inducing_Z,
                          noise_variance=params.noise_variance,
                          mean=params.mean, v0=params.v0)
        return jnp.sum(W * sgpr_mod._kuf_block_df32(p2, Z, X, pallas=False))

    g_want = jax.grad(xla_loss)(params.kernel)
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_want)):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5 * scale)

    gZ_got = jax.grad(
        lambda Zv: jnp.sum(W * build_sharded(params.kernel, Zv)))(Z)
    gZ_want = jax.grad(
        lambda Zv: jnp.sum(W * sgpr_mod._kuf_block_df32(
            params, Zv, X, pallas=False)))(Z)
    scale = float(jnp.max(jnp.abs(gZ_want)))
    np.testing.assert_allclose(np.asarray(gZ_got), np.asarray(gZ_want),
                               rtol=0, atol=2e-5 * scale)
