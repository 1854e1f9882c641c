import numpy as np
import jax.numpy as jnp

from cglb_tpu.ops import kernels as k
from cglb_tpu.transforms import Param


def naive_kernel(name, X, Z, var, ls):
    """Loop-free numpy oracle via explicit broadcast differences."""
    d = (X[:, None, :] - Z[None, :, :]) / ls
    d2 = np.sum(d * d, axis=-1)
    if name == "rbf":
        return var * np.exp(-0.5 * d2)
    r = np.sqrt(d2)
    s3r = np.sqrt(3.0) * r
    return var * (1.0 + s3r) * np.exp(-s3r)


def make(name, var, ls):
    cls = k.SquaredExponential if name == "rbf" else k.Matern32
    return cls(
        variance=Param.positive(jnp.asarray(var), lower=1e-6),
        lengthscales=Param.positive(jnp.asarray(ls), lower=1e-6),
    )


def test_rbf_cross_matches_oracle(rng):
    X = rng.normal(size=(17, 4))
    Z = rng.normal(size=(9, 4))
    var, ls = 1.7, np.array([0.5, 1.0, 2.0, 0.8])
    kern = make("rbf", var, ls)
    got = np.asarray(k.K(kern, jnp.asarray(X), jnp.asarray(Z)))
    want = naive_kernel("rbf", X, Z, var, ls)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_matern32_cross_matches_oracle(rng):
    X = rng.normal(size=(13, 3))
    Z = rng.normal(size=(11, 3))
    var, ls = 0.9, np.array([1.5, 0.7, 1.1])
    kern = make("mat32", var, ls)
    got = np.asarray(k.K(kern, jnp.asarray(X), jnp.asarray(Z)))
    want = naive_kernel("mat32", X, Z, var, ls)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_self_covariance_symmetric_diag(rng):
    X = rng.normal(size=(20, 5))
    for name in ("rbf", "mat32"):
        kern = make(name, 2.0, np.ones(5))
        Kxx = np.asarray(k.K(kern, jnp.asarray(X)))
        np.testing.assert_allclose(Kxx, Kxx.T, atol=1e-12)
        np.testing.assert_allclose(np.diag(Kxx), 2.0, rtol=1e-10)
        kd = np.asarray(k.kdiag(kern, jnp.asarray(X)))
        np.testing.assert_allclose(kd, 2.0, rtol=1e-12)


def test_self_equals_cross_off_diagonal(rng):
    X = rng.normal(size=(12, 2))
    kern = make("mat32", 1.3, np.array([0.9, 1.4]))
    K_self = np.asarray(k.K(kern, jnp.asarray(X)))
    K_cross = np.asarray(k.K(kern, jnp.asarray(X), jnp.asarray(X.copy())))
    mask = ~np.eye(12, dtype=bool)
    np.testing.assert_allclose(K_self[mask], K_cross[mask], rtol=1e-8, atol=1e-10)


def test_make_kernel_defaults():
    kern = k.make_kernel("Matern32", input_dim=6)
    assert isinstance(kern, k.Matern32)
    np.testing.assert_allclose(np.asarray(kern.variance.value), 1.0, rtol=1e-10)
    assert kern.lengthscales.value.shape == (6,)
    np.testing.assert_allclose(np.asarray(kern.lengthscales.value), 1.0, rtol=1e-10)


def test_kernel_positive_definite(rng):
    X = rng.normal(size=(30, 4))
    for name in ("rbf", "mat32"):
        kern = make(name, 1.0, np.ones(4))
        Kxx = np.asarray(k.K(kern, jnp.asarray(X)))
        eigs = np.linalg.eigvalsh(Kxx)
        assert eigs.min() > -1e-10
