"""ops/chol64: fused chol+inverse with matmul-only VJPs.

These primitives exist to keep fp64 [M, M] cholesky/trisolve EXPANDER
instances out of the TPU graph (each costs ~22-30 s of XLA compile; PERF.md
"Cold compile").  Correctness bar: values and gradients must match the
native jnp.linalg.cholesky / solve_triangular composition to fp64 roundoff,
and the Cinv-based gram path must stay inside the documented
eps64*kappa(L)^2 envelope of the trisolve sandwich it replaces.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np
import pytest

from cglb_tpu.ops import chol64
from cglb_tpu.ops.chol64 import chol_inv, chol_inv_retry
from cglb_tpu.models import sgpr
from cglb_tpu.ops import kernels as k


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _native(P):
    L = jnp.linalg.cholesky(P)
    C = jsl.solve_triangular(L, jnp.eye(P.shape[0], dtype=P.dtype),
                             lower=True)
    return L, C


def test_chol_inv_values(rng):
    W = jnp.asarray(rng.normal(size=(16, 30)))
    P = W @ W.T + jnp.eye(16)
    (L1, C1), (L2, C2) = _native(P), chol_inv(P)
    np.testing.assert_allclose(L1, L2, rtol=0, atol=0)
    np.testing.assert_allclose(C1, C2, rtol=0, atol=0)


def test_chol_inv_grads_match_native(rng):
    """VJP through BOTH outputs == native autodiff, to fp64 roundoff."""
    W = jnp.asarray(rng.normal(size=(12, 24)))

    def f(make):
        def g(W):
            P = W @ W.T + jnp.eye(12)
            L, C = make(P)
            return (jnp.sum(jnp.log(jnp.diagonal(L)))
                    + jnp.sum(jnp.sin(C) * jnp.cos(C.T)))
        return g

    v1, g1 = jax.value_and_grad(f(_native))(W)
    v2, g2 = jax.value_and_grad(f(chol_inv))(W)
    assert abs(float(v1 - v2)) == 0.0
    np.testing.assert_allclose(g1, g2, rtol=1e-13, atol=1e-14)


def test_chol_inv_retry_matches_single_attempt_when_finite(rng):
    W = jnp.asarray(rng.normal(size=(10, 20)))

    def via_retry(W):
        L, C = chol_inv_retry(W @ W.T, 1.0)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(C * C)

    def via_native(W):
        L, C = _native(W @ W.T + jnp.eye(10))
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(C * C)

    v1, g1 = jax.value_and_grad(via_retry)(W)
    v2, g2 = jax.value_and_grad(via_native)(W)
    assert abs(float(v1 - v2)) == 0.0
    np.testing.assert_allclose(g1, g2, rtol=1e-13, atol=1e-14)


def test_chol_inv_retry_escalates_jitter():
    """Eigenvalue -1e-5: base jitter 1e-6 fails, the 1000x retry succeeds."""
    P = jnp.diag(jnp.asarray([1.0, -1e-5, 2.0]))
    L, C = jax.jit(lambda p: chol_inv_retry(p, 1e-6))(P)
    assert bool(jnp.all(jnp.isfinite(L))) and bool(jnp.all(jnp.isfinite(C)))
    # the middle pivot reflects the escalated jitter
    np.testing.assert_allclose(float(L[1, 1]) ** 2, -1e-5 + 1e-3, rtol=1e-12)


def test_chol_inv_retry_gives_up_like_two_attempt_policy():
    """Too indefinite for 1000x jitter -> non-finite result (the caller's
    NaN handling takes over), matching the old 2-attempt _kuu_chol."""
    P = jnp.diag(jnp.asarray([1.0, -1.0, 2.0]))
    L, _ = chol_inv_retry(P, 1e-6)
    assert not bool(jnp.all(jnp.isfinite(L)))


def _spd(rng, M, kappa=None):
    W = rng.normal(size=(M, 2 * M))
    P = W @ W.T / (2 * M) + np.eye(M)
    if kappa is not None:
        # stretch the spectrum to the requested condition number
        w, V = np.linalg.eigh(P)
        w = np.geomspace(1.0 / kappa, 1.0, M)
        P = (V * w) @ V.T
        P = 0.5 * (P + P.T)
    return jnp.asarray(P)


@pytest.mark.parametrize("kappa,cl_tol", [(1e2, 1e-12), (1e4, 1e-11),
                                          (1e6, 1e-8), (1e8, 1e-7)])
def test_leaf_chol_inv_kappa_sweep(rng, kappa, cl_tol):
    """The f32-seeded Newton-refined leaf stays at fp64 grade across the
    whole kappa range (with random row scaling so equilibration is
    exercised); above the f32 seed's basin (~1e6 equilibrated) the
    residual gate hands the block to the fp64 expander, so the output is
    fp64-grade EITHER way — that's the contract."""
    b = 96
    P = np.asarray(_spd(rng, b, kappa=kappa))
    d = np.exp(rng.normal(size=b))
    P = P * d[:, None] * d[None, :]
    L, C = jax.jit(chol64._leaf_chol_inv)(jnp.asarray(P))
    L, C = np.asarray(L), np.asarray(C)
    rec = np.max(np.abs(L @ L.T - P)) / np.max(np.abs(P))
    assert rec < 1e-13, rec
    assert np.max(np.abs(C @ L - np.eye(b))) < cl_tol


def test_leaf_refined_gate(rng, monkeypatch):
    """The residual gate: True (refined branch) inside the f32 basin,
    False outside it — and with refinement disabled the raw f32 seed must
    fail the gate, which is what forces the expander fallback."""
    b = 96
    P_easy = _spd(rng, b, kappa=1e3)
    P_hard = _spd(rng, b, kappa=1e9)
    _, _, ok = jax.jit(chol64._leaf_refined)(P_easy)
    assert bool(ok)
    _, _, ok = jax.jit(chol64._leaf_refined)(P_hard)
    assert not bool(ok)
    monkeypatch.setattr(chol64, "REFINE_STEPS", 0)
    # eager calls: jax.jit's trace cache is keyed on the underlying
    # function object and would replay the REFINE_STEPS=3 trace
    _, _, ok = chol64._leaf_refined(P_easy)
    assert not bool(ok)  # unrefined f32 seed is ~6e-8, above the 1e-9 gate
    # ... and _leaf_chol_inv still returns fp64-grade factors via the
    # expander branch
    L, C = chol64._leaf_chol_inv(P_easy)
    rec = np.max(np.abs(np.asarray(L) @ np.asarray(L).T - np.asarray(P_easy)))
    assert rec < 1e-13 * np.max(np.abs(np.asarray(P_easy)))


def test_leaf_mode_chol_inv_and_retry(rng, monkeypatch):
    """ALGO='leaf' (the small-M TPU route, M <= BLOCK): chol_inv and
    chol_inv_retry match the native composition at fp64 grade, including
    gradients through the custom_vjp and the jitter-escalation path."""
    monkeypatch.setattr(chol64, "ALGO", "leaf")
    M = 96
    P = _spd(rng, M)
    L, C = jax.jit(chol_inv)(P)
    L_n, C_n = _native(P)
    np.testing.assert_allclose(L, L_n, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(C, C_n, rtol=1e-11, atol=1e-12)

    # gradients through both outputs == native autodiff
    W = jnp.asarray(rng.normal(size=(12, 24)))

    def f(make):
        def g(W):
            Q = W @ W.T + jnp.eye(12)
            L, C = make(Q)
            return (jnp.sum(jnp.log(jnp.diagonal(L)))
                    + jnp.sum(jnp.sin(C) * jnp.cos(C.T)))
        return g

    v1, g1 = jax.value_and_grad(f(_native))(W)
    v2, g2 = jax.value_and_grad(f(chol_inv))(W)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-13)
    np.testing.assert_allclose(g1, g2, rtol=1e-10, atol=1e-11)

    # retry escalation: eigenvalue -1e-5 fails at base jitter 1e-6, the
    # 1000x retry succeeds — through the leaf-mode while_loop carry
    Pq = jnp.diag(jnp.asarray([1.0, -1e-5, 2.0] + [1.0] * 29))
    L, C = jax.jit(lambda p: chol_inv_retry(p, 1e-6))(Pq)
    assert bool(jnp.all(jnp.isfinite(L))) and bool(jnp.all(jnp.isfinite(C)))
    np.testing.assert_allclose(float(L[1, 1]) ** 2, -1e-5 + 1e-3, rtol=1e-9)


def test_leaf_chol_inv_nonpd_nans(rng):
    """Non-PD leaf -> non-finite factors (the chol_inv_retry signal)."""
    P = np.array(_spd(rng, 96))
    P[3, 3] = -0.5
    L, _ = jax.jit(chol64._leaf_chol_inv)(jnp.asarray(P))
    assert not bool(jnp.all(jnp.isfinite(L)))


def test_blocked_chol_matches_native(rng, monkeypatch):
    monkeypatch.setattr(chol64, "ALGO", "blocked")
    monkeypatch.setattr(chol64, "BLOCK", 64)
    for M in (128, 192, 256):  # nb = 2, 3, 4
        P = _spd(rng, M)
        L_b = jax.jit(chol64._chol)(P)
        L_n = jnp.linalg.cholesky(P)
        np.testing.assert_allclose(L_b, L_n, rtol=1e-12, atol=1e-13)
        C_b = jax.jit(chol64._tri_inv)(L_n)
        C_n = jsl.solve_triangular(L_n, jnp.eye(M, dtype=P.dtype),
                                   lower=True)
        np.testing.assert_allclose(C_b, C_n, rtol=1e-11, atol=1e-12)


def test_block_for_ladder():
    """The M-dependent panel width (measured optimum on v5e: M/4 clamped
    to [BLOCK, 1024], scripts/bench_chol4096.py): protocol shapes get the
    wide panels, indivisible M falls back to the base."""
    assert chol64._block_for(512) == 256
    assert chol64._block_for(1024) == 256
    assert chol64._block_for(2048) == 512
    assert chol64._block_for(4096) == 1024
    assert chol64._block_for(8192) == 1024
    assert chol64._block_for(2560) == 640  # M/4, divisible
    assert chol64._block_for(2304) == 576  # M/4, divisible


def test_blocked_chol_wide_panels_match_native(rng, monkeypatch):
    """chol_inv / chol_inv_retry at an M where _block_for picks a panel
    WIDER than the base BLOCK (M=512, BLOCK=64 -> b=128): values must
    match the native factorization like the base-width path does."""
    monkeypatch.setattr(chol64, "ALGO", "blocked")
    monkeypatch.setattr(chol64, "BLOCK", 64)
    M = 512
    assert chol64._block_for(M) == 128
    P = _spd(rng, M)
    L_n = jnp.linalg.cholesky(P)
    C_n = jsl.solve_triangular(L_n, jnp.eye(M, dtype=P.dtype), lower=True)
    L_b, C_b = jax.jit(chol64.chol_inv)(P)
    np.testing.assert_allclose(L_b, L_n, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(C_b, C_n, rtol=1e-11, atol=1e-11)
    L_r, C_r = jax.jit(lambda p: chol64.chol_inv_retry(p, 1e-6))(P)
    np.testing.assert_allclose(L_r, jnp.linalg.cholesky(
        P + 1e-6 * jnp.eye(M, dtype=P.dtype)), rtol=1e-12, atol=1e-13)
    # grads flow through the wide-panel path's custom_vjp unchanged
    g = jax.grad(lambda p: jnp.sum(jnp.log(jnp.diagonal(
        chol64.chol_inv(p)[0]))))(P)
    g_n = jax.grad(lambda p: jnp.sum(jnp.log(jnp.diagonal(
        jnp.linalg.cholesky(p)))))(P)
    np.testing.assert_allclose(g, g_n, rtol=1e-9, atol=1e-10)


def test_blocked_chol_ill_conditioned(rng, monkeypatch):
    """kappa ~ 1e8: blocked factorization stays as backward-stable as the
    native op (logdet + reconstruction + inverse residual)."""
    monkeypatch.setattr(chol64, "ALGO", "blocked")
    monkeypatch.setattr(chol64, "BLOCK", 64)
    M = 256
    P = _spd(rng, M, kappa=1e8)
    L = jax.jit(chol64._chol)(P)
    L_n = jnp.linalg.cholesky(P)
    ld_b = float(jnp.sum(jnp.log(jnp.diagonal(L))))
    ld_n = float(jnp.sum(jnp.log(jnp.diagonal(L_n))))
    assert abs(ld_b - ld_n) < 1e-9 * abs(ld_n)
    np.testing.assert_allclose(L @ L.T, P, rtol=1e-11, atol=1e-13)
    C = jax.jit(chol64._tri_inv)(L)
    resid = C @ L - jnp.eye(M, dtype=P.dtype)
    assert float(jnp.max(jnp.abs(resid))) < 1e-8  # eps64 * kappa envelope


def test_blocked_chol_int8_products_match_native(rng, monkeypatch):
    """FORWARD_MM='int8' (forcible branch; runtime-wise a measured dead end
    — see chol64.FORWARD_MM): the Schur updates and the substitution
    products run as exact int8-limb matmuls; the factor and inverse must
    stay at fp64 grade, including at kappa ~ 1e8 (the jitter-floor regime
    the AAT budget is derived for)."""
    monkeypatch.setattr(chol64, "ALGO", "blocked")
    monkeypatch.setattr(chol64, "BLOCK", 64)
    monkeypatch.setattr(chol64, "FORWARD_MM", "int8")
    M = 256
    for kappa, ltol, rtol in ((None, 1e-11, 1e-11), (1e8, 2e-9, 1e-8)):
        P = _spd(rng, M, kappa=kappa)
        L = jax.jit(chol64._chol)(P)
        L_n = jnp.linalg.cholesky(P)
        # logdet (the training-loss consumer) at fp64 grade
        ld = float(jnp.sum(jnp.log(jnp.diagonal(L))))
        ld_n = float(jnp.sum(jnp.log(jnp.diagonal(L_n))))
        assert abs(ld - ld_n) < 1e-9 * max(1.0, abs(ld_n))
        # backward-stable: reconstruction residual, not factor-vs-factor
        np.testing.assert_allclose(L @ L.T, P, rtol=ltol, atol=1e-12)
        C = jax.jit(chol64._tri_inv)(L)
        resid = C @ L - jnp.eye(M, dtype=P.dtype)
        assert float(jnp.max(jnp.abs(resid))) < rtol


def test_blocked_chol_f32_matches_native(rng, monkeypatch):
    """f32 blocked path (the TPU preconditioner case): parity with the
    native op at f32 tolerances — the HIGHEST pins keep the Schur updates
    off the bf16 MXU lowering."""
    monkeypatch.setattr(chol64, "ALGO", "blocked")
    monkeypatch.setattr(chol64, "BLOCK", 64)
    M = 256
    P = _spd(rng, M).astype(jnp.float32)
    P = 0.5 * (P + P.T)
    L_b = jax.jit(chol64._chol)(P)
    L_n = jnp.linalg.cholesky(P)
    np.testing.assert_allclose(L_b, L_n, rtol=2e-5, atol=2e-6)
    C_b = jax.jit(chol64._tri_inv)(L_n)
    C_n = jsl.solve_triangular(L_n, jnp.eye(M, dtype=P.dtype), lower=True)
    np.testing.assert_allclose(C_b, C_n, rtol=2e-4, atol=2e-5)


def test_blocked_chol_nan_propagates_to_retry(monkeypatch):
    """An indefinite block makes the blocked factorization non-finite, so
    chol_inv_retry's finite check escalates the jitter exactly as with the
    native op."""
    monkeypatch.setattr(chol64, "ALGO", "blocked")
    monkeypatch.setattr(chol64, "BLOCK", 64)
    d = np.ones(128)
    d[100] = -1e-5  # fails at base jitter 1e-6, fixed by the 1000x retry
    P = jnp.asarray(np.diag(d))
    L, C = jax.jit(lambda p: chol_inv_retry(p, 1e-6))(P)
    assert bool(jnp.all(jnp.isfinite(L))) and bool(jnp.all(jnp.isfinite(C)))
    np.testing.assert_allclose(float(L[100, 100]) ** 2, -1e-5 + 1e-3,
                               rtol=1e-12)


def _params(rng, M=24, D=3):
    kern = k.make_kernel("Matern32", D, variance=1.3, lengthscales=0.9,
                         dtype=np.float64)
    Z = rng.normal(size=(M, D))
    return sgpr.SGPRParams.create(kern, Z, noise_variance=0.3,
                                  dtype=np.float64)


def test_gram_terms_cinv_matches_trisolve_path(rng):
    """The Cinv (matmul) form of _gram_terms == the trisolve sandwich form
    within the documented eps64*kappa^2 envelope; A within f32 grade."""
    params = _params(rng)
    X = jnp.asarray(rng.normal(size=(200, 3)))
    W = jnp.asarray(rng.normal(size=(200, 2)))
    sigma = jnp.sqrt(params.noise_variance.value)
    L, Ci = sgpr._kuu_chol_inv(params, 1e-6)

    A1, AAT1, AW1 = sgpr._gram_terms(params, L, X, sigma, W=W)
    A2, AAT2, AW2 = sgpr._gram_terms(params, L, X, sigma, W=W, Cinv=Ci)
    np.testing.assert_allclose(AAT1, AAT2, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(AW1, AW2, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(A1, A2, rtol=2e-5, atol=2e-5)  # both f32

    # chunked == unchunked on the Cinv path
    A3, AAT3, AW3 = sgpr._gram_terms(params, L, X, sigma, W=W, Cinv=Ci,
                                     chunk_size=64)
    # chunk partials sum in a different order: fp64 reorder noise only
    np.testing.assert_allclose(AAT2, AAT3, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(AW2, AW3, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(A2, A3, rtol=1e-6, atol=1e-6)


def test_mixed_loss_grad_matches_fp64_path(rng):
    """End-to-end: gradients of the mixed (chol64-based) CGLB loss match the
    all-fp64 reference-parity path on a small problem."""
    from cglb_tpu.models import cglb

    params = _params(rng, M=16)
    X = jnp.asarray(rng.normal(size=(120, 3)))
    Y = jnp.asarray(rng.normal(size=(120, 1)))
    v0 = jnp.zeros((1, 120))

    def loss_of(common_dtype):
        cfg = cglb.CGLBConfig(common_dtype=common_dtype)

        def f(p):
            val, _ = cglb.loss(p, X, Y, v0, cfg)
            return val

        return jax.value_and_grad(f)(params)

    v_mixed, g_mixed = loss_of("mixed")
    v_f64, g_f64 = loss_of("float64")
    assert abs(float(v_mixed - v_f64)) < 1e-7 * abs(float(v_f64))
    flat_m = jax.flatten_util.ravel_pytree(g_mixed)[0]
    flat_f = jax.flatten_util.ravel_pytree(g_f64)[0]
    scale = float(jnp.max(jnp.abs(flat_f))) + 1e-30
    np.testing.assert_allclose(flat_m / scale, flat_f / scale,
                               rtol=0, atol=5e-6)


@pytest.mark.parametrize("kappa,tol", [(1e2, 1e-8), (1e8, 3e-5)])
def test_int8_backward_matches_fp64_kappa_independent(rng, monkeypatch,
                                                      kappa, tol):
    """The forcible int8 backward branch (5-limb batched) must track the
    fp64 backward at descent-direction grade ACROSS conditioning — the
    accuracy half of the measured trade recorded at chol64.BACKWARD (its
    runtime lost 0.48 s/feval on chip, so "auto" keeps fp64; the f32
    branch's 8e-4 error at kappa=1e6 is the accumulation-noise failure both
    alternatives were probed against)."""
    M = 96
    W = rng.normal(size=(M, 2 * M))
    P0 = W @ W.T / (2 * M) + np.eye(M)
    w, V = np.linalg.eigh(P0)
    w = np.geomspace(1.0 / kappa, 1.0, M)
    P = jnp.asarray(0.5 * ((V * w) @ V.T + ((V * w) @ V.T).T))
    Wd = jnp.asarray(rng.normal(size=(M, M)))
    Q = jnp.eye(M) + 0.01 * jnp.asarray(rng.normal(size=(M, M)))

    def f(Q):
        L, C = chol_inv(Q @ P @ Q.T + jnp.eye(M) * 1e-6)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + 1e-3 * jnp.sum(C * Wd)

    monkeypatch.setattr(chol64, "BACKWARD", "fp64")
    g64 = jax.grad(f)(Q)
    monkeypatch.setattr(chol64, "BACKWARD", "int8")
    gi = jax.grad(f)(Q)
    err = float(jnp.max(jnp.abs(gi - g64)) / jnp.max(jnp.abs(g64)))
    assert err < tol, (kappa, err)
