"""Unit tests for the two-float (df32) transcendental layer (ops/df32).

Oracle: numpy fp64 (its ~1e-16 rounding is far below the ~1e-11 df32 target).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cglb_tpu.ops import df32 as D


def _d2_samples(rng, n=20000):
    return jnp.asarray(np.concatenate([
        [0.0], rng.uniform(0, 1e-6, n // 10), rng.uniform(0, 1.0, n),
        rng.uniform(1.0, 100.0, n), rng.uniform(100.0, 2000.0, n // 4),
    ]))


def test_two_sum_two_prod_exact(rng):
    a = jnp.asarray(rng.uniform(-1, 1, 10000), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, 10000), jnp.float32)
    s = D._two_sum(a, b)
    np.testing.assert_array_equal(
        np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64),
        np.asarray(a, np.float64) + np.asarray(b, np.float64),
    )
    p = D._two_prod(a, b)
    np.testing.assert_array_equal(
        np.asarray(p.hi, np.float64) + np.asarray(p.lo, np.float64),
        np.asarray(a, np.float64) * np.asarray(b, np.float64),
    )


def test_df_exp_accuracy(rng):
    x = jnp.asarray(-rng.uniform(0.0, 50.0, 50000))
    got = np.asarray(D.df_to_f64(D.df_exp(D.df_from_f64(x))))
    want = np.exp(np.asarray(x))
    rel = np.abs(got - want) / want
    assert rel.max() < 5e-11, rel.max()


def test_df_sqrt_accuracy(rng):
    x = jnp.asarray(rng.uniform(1e-10, 4000.0, 50000))
    got = np.asarray(D.df_to_f64(D.df_sqrt(D.df_from_f64(x))))
    want = np.sqrt(np.asarray(x))
    rel = np.abs(got - want) / want
    assert rel.max() < 1e-13, rel.max()
    # exact zero maps to exact zero (kernel diagonals)
    z = D.df_sqrt(D.df_from_f64(jnp.zeros((3,))))
    np.testing.assert_array_equal(np.asarray(z.hi), 0.0)


def test_df_recip_accuracy(rng):
    x = jnp.asarray(np.concatenate([
        rng.uniform(1e-10, 4000.0, 25000),
        -rng.uniform(1e-10, 4000.0, 25000),
    ]))
    got = np.asarray(D.df_to_f64(D.df_recip(D.df_from_f64(x))))
    want = 1.0 / np.asarray(x)
    rel = np.abs(got - want) / np.abs(want)
    assert rel.max() < 1e-13, rel.max()
    # zero input: the f32 seed division produces inf and the Newton
    # corrections must propagate it (the documented non-PD signal), not
    # turn it into NaN-free garbage
    z = D.df_recip(D.df_from_f64(jnp.zeros((3,))))
    assert not bool(jnp.any(jnp.isfinite(z.hi)))


def test_matern32_unit_value_and_grad(rng):
    d2 = _d2_samples(rng)
    r = np.sqrt(np.asarray(d2))
    s = np.sqrt(3.0) * r
    want = (1.0 + s) * np.exp(-s)
    got = np.asarray(D.matern32_unit(d2))
    rel = np.abs(got - want) / np.maximum(want, 1e-30)
    assert rel[want > 1e-20].max() < 5e-11, rel[want > 1e-20].max()
    assert np.abs(got - want).max() < 1e-10

    g = np.asarray(jax.grad(lambda x: jnp.sum(D.matern32_unit(x)))(d2))
    g_want = -1.5 * np.exp(-s)
    grel = np.abs(g - g_want) / np.abs(g_want)
    assert grel[np.abs(g_want) > 1e-20].max() < 5e-11
    # finite at d2 == 0 (coincident points: inducing points drawn from data)
    assert np.isfinite(g[0]) and abs(g[0] + 1.5) < 1e-10


def test_rbf_unit_value_and_grad(rng):
    d2 = _d2_samples(rng)
    want = np.exp(-0.5 * np.asarray(d2))
    got = np.asarray(D.rbf_unit(d2))
    rel = np.abs(got - want) / np.maximum(want, 1e-30)
    assert rel[want > 1e-20].max() < 5e-11

    g = np.asarray(jax.grad(lambda x: jnp.sum(D.rbf_unit(x)))(d2))
    g_want = -0.5 * want
    grel = np.abs(g - g_want) / np.maximum(np.abs(g_want), 1e-30)
    assert grel[want > 1e-20].max() < 5e-11


def test_profiles_jittable(rng):
    """The df32 accuracy survives jit: XLA may reorder/fuse the compensated
    f32 ops (so bits differ from eager), but the result must stay within the
    df32 error envelope of the fp64 oracle."""
    d2 = _d2_samples(rng, n=256)
    got = np.asarray(jax.jit(D.matern32_unit)(d2))
    r = np.sqrt(np.asarray(d2))
    s = np.sqrt(3.0) * r
    want = (1.0 + s) * np.exp(-s)
    rel = np.abs(got - want) / np.maximum(want, 1e-30)
    assert rel[want > 1e-20].max() < 5e-11, rel[want > 1e-20].max()


def test_profiles_finite_at_f32_overflow(rng):
    """d2 above the f32-finite range must not NaN the df32 profiles: the
    fp64 oracle returns exactly 0 there (ADVICE r2: df_from_f64 hi=inf made
    inf-inf NaNs inside two_sum at extreme line-search probes)."""
    d2 = jnp.asarray([1e38, 5e38, 1e40, 1e300], dtype=jnp.float64)
    for fn in (D.matern32_unit, D.rbf_unit):
        out = np.asarray(fn(d2))
        assert np.all(np.isfinite(out)), out
        # effectively zero against unit-scale diagonals (the clamped exp
        # leaves a ~3e-19 Matern tail: (1 + s3r) * exp(-87) at s3r ~ 2e19)
        np.testing.assert_allclose(out, 0.0, atol=1e-18)
    # gradients stay finite too
    g = jax.grad(lambda x: jnp.sum(D.matern32_unit(x)))(d2)
    assert np.all(np.isfinite(np.asarray(g)))
