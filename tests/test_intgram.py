"""Exactness tests for the int8-limb Gram (ops/intgram)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cglb_tpu.ops import intgram


@pytest.mark.parametrize("var", [1.0, 1.7, 0.03, 1234.5])
def test_gram_int8_matches_fp64_matmul(rng, var):
    """G_int8 == Kuf Kuf^T to ~N*eps64 absolute, across variance scales."""
    m, n = 40, 700
    # kernel-like entries: nonnegative, bounded by var, many tiny values
    q = rng.uniform(0, 1, size=(m, n)) ** 3
    kuf = jnp.asarray(var * q)
    want = np.asarray(kuf @ kuf.T)
    got = np.asarray(intgram.gram_exact_int8(kuf, jnp.asarray(var)))
    scale = n * var * var
    err = np.max(np.abs(got - want)) / scale
    assert err < 1e-14, err


def test_gram_int8_exact_on_representable_values(rng):
    """Values with <= 28 significant bits reconstruct G bit-exactly."""
    m, n = 16, 256
    q = np.round(rng.uniform(0, 1, size=(m, n)) * 2**20) / 2**22
    kuf = jnp.asarray(q)
    want = np.asarray(kuf @ kuf.T)
    got = np.asarray(intgram.gram_exact_int8(kuf, jnp.asarray(1.0)))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_gram_int8_jittable_and_zero_safe(rng):
    kuf = jnp.zeros((8, 64), dtype=jnp.float64)
    got = jax.jit(intgram.gram_exact_int8)(kuf, jnp.asarray(2.0))
    np.testing.assert_array_equal(np.asarray(got), 0.0)


def test_gram_int8_rejects_overflow_k():
    kuf = jnp.zeros((2, intgram.MAX_K + 1), dtype=jnp.float64)
    with pytest.raises(ValueError):
        intgram.gram_exact_int8(kuf, jnp.asarray(1.0))


@pytest.mark.parametrize("shape", [(40, 700, 40), (64, 128, 16), (8, 512, 1)])
def test_matmul_int8_matches_fp64(rng, shape):
    """Signed rectangular A @ B to rowwise/columnwise fp64 grade."""
    m, k, n = shape
    # wildly varying row/column magnitudes + signs (the Cinv/G regime)
    A = rng.normal(size=(m, k)) * np.exp(rng.uniform(-8, 8, size=(m, 1)))
    B = rng.normal(size=(k, n)) * np.exp(rng.uniform(-8, 8, size=(1, n)))
    want = np.asarray(jnp.asarray(A) @ jnp.asarray(B))
    got = np.asarray(intgram.matmul_exact_int8(jnp.asarray(A),
                                               jnp.asarray(B)))
    # error envelope: k * eps64 * rowmax(A) * colmax(B) (docstring)
    scale = (np.max(np.abs(A), axis=1, keepdims=True)
             * np.max(np.abs(B), axis=0, keepdims=True) * k)
    err = np.max(np.abs(got - want) / scale)
    assert err < 1e-14, err


def test_matmul_int8_exact_on_representable_values(rng):
    """<=26-bit significands (incl. negatives) reconstruct bit-exactly."""
    m, k, n = 16, 256, 12
    A = np.round(rng.normal(size=(m, k)) * 2**20) / 2**22
    B = np.round(rng.normal(size=(k, n)) * 2**20) / 2**22
    want = np.asarray(jnp.asarray(A) @ jnp.asarray(B))
    got = np.asarray(intgram.matmul_exact_int8(jnp.asarray(A),
                                               jnp.asarray(B)))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_matmul_int8_zero_rows_and_cols(rng):
    """All-zero rows/columns are finite-safe (scale guard)."""
    A = rng.normal(size=(6, 64))
    B = rng.normal(size=(64, 5))
    A[2] = 0.0
    B[:, 3] = 0.0
    got = np.asarray(jax.jit(intgram.matmul_exact_int8)(
        jnp.asarray(A), jnp.asarray(B)))
    want = A @ B
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=0, atol=64 * 1e-16
                               * np.max(np.abs(A)) * np.max(np.abs(B)))
    np.testing.assert_array_equal(got[2], 0.0)
    np.testing.assert_array_equal(got[:, 3], 0.0)


def test_matmul_int8_rejects_overflow_k():
    A = jnp.zeros((2, intgram.MAX_K + 1), dtype=jnp.float64)
    B = jnp.zeros((intgram.MAX_K + 1, 2), dtype=jnp.float64)
    with pytest.raises(ValueError):
        intgram.matmul_exact_int8(A, B)


def test_mm_f64grade_sandwich_matches_fp64(rng, monkeypatch):
    """The AAT sandwich through _mm_f64grade (int8 forced) matches the
    plain fp64 sandwich to fp64 grade, and its custom backward stays
    finite and close to the autodiff-through-matmul gradients."""
    from cglb_tpu.models import sgpr

    m = 48
    L = np.tril(rng.normal(size=(m, m))) + 4.0 * np.eye(m)
    Cinv = np.linalg.inv(L)
    G0 = rng.normal(size=(m, 3 * m))
    G = G0 @ G0.T  # SPD-ish, symmetric

    def sandwich(c, g):
        t = sgpr._mm_f64grade(c, g)
        s = sgpr._mm_f64grade(t, c.T)
        return 0.5 * (s + s.T)

    want = 0.5 * ((Cinv @ G @ Cinv.T) + (Cinv @ G @ Cinv.T).T)
    monkeypatch.setattr(sgpr, "GRAM_FORWARD", "int8")
    got = np.asarray(sandwich(jnp.asarray(Cinv), jnp.asarray(G)))
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-13)

    # gradients: the TPU-production combination (int8 forward + f32-HIGHEST
    # backward) vs fp64 autodiff of the plain matmuls
    w = jnp.asarray(rng.normal(size=(m, m)))
    monkeypatch.setattr(sgpr, "MM_BACKWARD", "f32")
    g_int8 = jax.grad(
        lambda c: jnp.sum(sandwich(c, jnp.asarray(G)) * w))(jnp.asarray(Cinv))
    monkeypatch.setattr(sgpr, "GRAM_FORWARD", "fp64")
    monkeypatch.setattr(sgpr, "MM_BACKWARD", "fp64")
    g_ref = jax.grad(
        lambda c: jnp.sum(sandwich(c, jnp.asarray(G)) * w))(jnp.asarray(Cinv))
    a, b = np.asarray(g_ref), np.asarray(g_int8)
    s = max(np.max(np.abs(a)), 1e-12)
    np.testing.assert_allclose(b / s, a / s, atol=3e-6)


def test_gram_terms_int8_forward_matches_fp64(rng, monkeypatch):
    """The whole mixed common-terms path under GRAM_FORWARD='int8' matches
    the fp64-matmul forward to fp64 grade (value AND gradients)."""
    from cglb_tpu.models import sgpr
    from cglb_tpu.ops import kernels as k

    n, d, m = 500, 3, 32
    X = rng.normal(size=(n, d))
    Y = np.tanh(X @ rng.normal(size=(d, 1))) + 0.1 * rng.normal(size=(n, 1))
    kern = k.make_kernel("Matern32", d, variance=1.3, lengthscales=0.8,
                         dtype=np.float64)
    Z = X[rng.choice(n, m, replace=False)]
    params = sgpr.SGPRParams.create(kern, Z, noise_variance=0.4,
                                    dtype=np.float64)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    e_fp64 = float(sgpr.elbo(params, Xj, Yj, mixed=True))
    g_fp64 = jax.grad(lambda p: sgpr.elbo(p, Xj, Yj, mixed=True))(params)
    monkeypatch.setattr(sgpr, "GRAM_FORWARD", "int8")
    e_int8 = float(sgpr.elbo(params, Xj, Yj, mixed=True))
    g_int8 = jax.grad(lambda p: sgpr.elbo(p, Xj, Yj, mixed=True))(params)
    np.testing.assert_allclose(e_int8, e_fp64, rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(g_fp64),
                    jax.tree_util.tree_leaves(g_int8)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.max(np.abs(a)), 1e-12)
        # the custom backward is shared (f32-HIGHEST); only the forward's
        # last-bit G differences flow into the solve-dependent grads
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-9)
    # chunked path too
    e_int8_c = float(sgpr.elbo(params, Xj, Yj, mixed=True))
    np.testing.assert_allclose(e_int8_c, e_fp64, rtol=1e-12)


def test_matmul_int8_batched_bitwise_equals_perpair(rng):
    """batched=True (one stacked-plane dot) must be BIT-identical to the
    per-pair dot form at any limb count: same int32 pair products, same
    grouped scale-add order (the batched form exists purely to cut dot HLO
    instances — 43 per call site pushed the CGLB loss+grad cold compile
    past 900 s on TPU)."""
    from cglb_tpu.ops.intgram import matmul_exact_int8

    A = jnp.asarray(rng.normal(size=(48, 70)) *
                    np.exp(2 * rng.normal(size=(48, 70))))
    B = jnp.asarray(rng.normal(size=(70, 36)))
    for limbs in (8, 5, 4):
        got_b = np.asarray(matmul_exact_int8(A, B, limbs=limbs,
                                             batched=True))
        got_p = np.asarray(matmul_exact_int8(A, B, limbs=limbs,
                                             batched=False))
        assert np.array_equal(got_b, got_p), limbs


def test_matmul_int8_reduced_limbs_error_envelope(rng):
    """limbs=5 carries a 2^-36 rowwise/columnwise-relative quantization
    floor (the chol64 backward's gradient-grade setting); limbs=8 stays at
    the fp64 floor."""
    from cglb_tpu.ops.intgram import matmul_exact_int8

    A = jnp.asarray(rng.normal(size=(64, 100)))
    B = jnp.asarray(rng.normal(size=(100, 52)))
    ref = np.asarray(A) @ np.asarray(B)
    sc = (np.abs(np.asarray(A)).max(1)[:, None]
          * np.abs(np.asarray(B)).max(0)[None, :] * A.shape[1])
    err5 = np.max(np.abs(np.asarray(
        matmul_exact_int8(A, B, limbs=5, batched=True)) - ref) / sc)
    err8 = np.max(np.abs(np.asarray(
        matmul_exact_int8(A, B, limbs=8, batched=True)) - ref) / sc)
    assert err5 < 1e-10, err5
    assert err8 < 1e-15, err8
