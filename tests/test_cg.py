import jax.numpy as jnp
import numpy as np

from cglb_tpu.ops import cg as cgm
from cglb_tpu.ops import preconditioners as pc


def _spd_system(rng, n=80, m=16):
    """Random low-rank-plus-noise SPD system resembling Kff + s2 I."""
    U = rng.normal(size=(n, m))
    K = U @ U.T + 0.5 * np.eye(n)
    b = rng.normal(size=(1, n))
    # Nystrom-style preconditioner pieces: A [m, n], LB chol(AA^T + I)
    sigma_sq = 0.5
    A = (U / np.sqrt(sigma_sq)).T
    B = A @ A.T + np.eye(m)
    LB = np.linalg.cholesky(B)
    precond = pc.NystromPreconditioner(
        A=jnp.asarray(A), LB=jnp.asarray(LB), sigma_sq=jnp.asarray(sigma_sq)
    )
    return K, b, precond, sigma_sq


def test_preconditioner_matches_dense_inverse(rng):
    """P r must equal (Qff + s2 I)^-1 r computed densely."""
    n, m = 60, 12
    U = rng.normal(size=(n, m))
    sigma_sq = 0.3
    Qff = U @ U.T
    A = (U / np.sqrt(sigma_sq)).T
    B = A @ A.T + np.eye(m)
    LB = np.linalg.cholesky(B)
    P = pc.NystromPreconditioner(
        A=jnp.asarray(A), LB=jnp.asarray(LB), sigma_sq=jnp.asarray(sigma_sq)
    )
    r = rng.normal(size=(1, n))
    z, rz = pc.mat_vec(P, jnp.asarray(r))
    want = np.linalg.solve(Qff + sigma_sq * np.eye(n), r[0])
    np.testing.assert_allclose(np.asarray(z)[0], want, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(rz[0]), float(r[0] @ want), rtol=1e-8)


def test_preconditioner_inverse_roundtrip(rng):
    n, m = 40, 8
    U = rng.normal(size=(n, m))
    sigma_sq = 0.7
    A = (U / np.sqrt(sigma_sq)).T
    B = A @ A.T + np.eye(m)
    LB = np.linalg.cholesky(B)
    P = pc.NystromPreconditioner(
        A=jnp.asarray(A), LB=jnp.asarray(LB), sigma_sq=jnp.asarray(sigma_sq)
    )
    r = jnp.asarray(rng.normal(size=(1, n)))
    z, _ = pc.mat_vec(P, r)
    back = pc.inv_mat_vec(P, z)
    np.testing.assert_allclose(np.asarray(back), np.asarray(r), rtol=1e-8, atol=1e-10)


def test_preconditioner_ci_matches_trisolve(rng):
    """The matmul-only apply (explicit LB^-1, models/cglb._make_precond's
    construction) matches the trisolve apply — including at small sigma,
    where kappa(B) ~ 1/sigma^2 stresses both paths equally — and its rz
    stays nonnegative (the sum-of-squares identity is structural)."""
    import jax.scipy.linalg as jsl

    n, m = 120, 24
    for sigma_sq in (0.5, 1e-4):
        U = rng.normal(size=(n, m))
        A = (U / np.sqrt(sigma_sq)).T
        B = A @ A.T + np.eye(m)
        LB = np.linalg.cholesky(B)
        Ci = np.asarray(
            jsl.solve_triangular(jnp.asarray(LB), jnp.eye(m), lower=True))
        P_tri = pc.NystromPreconditioner(
            A=jnp.asarray(A), LB=jnp.asarray(LB),
            sigma_sq=jnp.asarray(sigma_sq))
        P_ci = pc.NystromPreconditioner(
            A=jnp.asarray(A), LB=jnp.asarray(LB),
            sigma_sq=jnp.asarray(sigma_sq), Ci=jnp.asarray(Ci))
        r = jnp.asarray(rng.normal(size=(3, n)))
        z_t, rz_t = pc.mat_vec(P_tri, r)
        z_c, rz_c = pc.mat_vec(P_ci, r)
        scale = float(jnp.max(jnp.abs(z_t)))
        np.testing.assert_allclose(np.asarray(z_c), np.asarray(z_t),
                                   rtol=1e-9, atol=1e-11 * scale)
        np.testing.assert_allclose(np.asarray(rz_c), np.asarray(rz_t),
                                   rtol=1e-9)
        assert bool(jnp.all(rz_c >= 0))


def test_cg_converges_to_dense_solve(rng):
    K, b, precond, _ = _spd_system(rng)
    matvec = lambda p: p @ jnp.asarray(K)
    v0 = jnp.zeros_like(jnp.asarray(b))
    v, stats = cgm.preconditioned_cg(
        matvec, jnp.asarray(b), v0, precond, max_error=1e-12, max_iters=200,
        restart_iters=40,
    )
    want = np.linalg.solve(K, b[0])
    np.testing.assert_allclose(np.asarray(v)[0], want, rtol=1e-6, atol=1e-8)
    assert int(stats.steps) < 200


def test_cg_stops_immediately_when_warm_start_exact(rng):
    K, b, precond, _ = _spd_system(rng)
    v_exact = np.linalg.solve(K, b[0])[None, :]
    matvec = lambda p: p @ jnp.asarray(K)
    v, stats = cgm.preconditioned_cg(
        matvec, jnp.asarray(b), jnp.asarray(v_exact), precond,
        max_error=1e-6, max_iters=100,
    )
    assert int(stats.steps) == 0
    np.testing.assert_allclose(np.asarray(v), v_exact, rtol=1e-12)


def test_cg_respects_max_iters(rng):
    # full-rank random SPD + identity preconditioner: cannot converge in 7 steps
    G = rng.normal(size=(80, 80))
    K = G @ G.T + 1e-3 * np.eye(80)
    b = rng.normal(size=(1, 80))
    matvec = lambda p: p @ jnp.asarray(K)
    v0 = jnp.zeros_like(jnp.asarray(b))
    _, stats = cgm.preconditioned_cg(
        matvec, jnp.asarray(b), v0, pc.IdentityPreconditioner(),
        max_error=1e-30, max_iters=7,
    )
    assert int(stats.steps) == 7


def test_cg_loose_tolerance_fewer_steps(rng):
    K, b, precond, _ = _spd_system(rng)
    matvec = lambda p: p @ jnp.asarray(K)
    v0 = jnp.zeros_like(jnp.asarray(b))
    _, s_loose = cgm.preconditioned_cg(matvec, jnp.asarray(b), v0, precond, 1.0, 100)
    _, s_tight = cgm.preconditioned_cg(matvec, jnp.asarray(b), v0, precond, 1e-10, 100)
    assert int(s_loose.steps) <= int(s_tight.steps)
    assert float(s_loose.residual_error) <= 1.0 or int(s_loose.steps) == 100


def test_cg_identity_preconditioner(rng):
    K, b, _, _ = _spd_system(rng, n=50, m=10)
    matvec = lambda p: p @ jnp.asarray(K)
    v0 = jnp.zeros_like(jnp.asarray(b))
    v, _ = cgm.preconditioned_cg(
        matvec, jnp.asarray(b), v0, pc.IdentityPreconditioner(),
        max_error=1e-12, max_iters=300,
    )
    want = np.linalg.solve(K, b[0])
    np.testing.assert_allclose(np.asarray(v)[0], want, rtol=1e-5, atol=1e-7)


def test_cg_restart_path_still_converges(rng):
    """Force multiple restarts (restart_iters=5) and check correctness."""
    K, b, precond, _ = _spd_system(rng, n=100, m=4)
    matvec = lambda p: p @ jnp.asarray(K)
    v0 = jnp.zeros_like(jnp.asarray(b))
    v, stats = cgm.preconditioned_cg(
        matvec, jnp.asarray(b), v0, precond, max_error=1e-12, max_iters=300,
        restart_iters=5,
    )
    want = np.linalg.solve(K, b[0])
    np.testing.assert_allclose(np.asarray(v)[0], want, rtol=1e-5, atol=1e-7)


def test_precond_quadratic_form_nonnegative_under_cancellation(rng):
    """Regression: rz = r^T (Qff + s2 I)^-1 r computed the naive way
    (sum(P r * r)) cancels catastrophically in f32 when r lies mostly in
    Qff's range with large norm — it went hugely NEGATIVE at L-BFGS
    line-search extremes, short-circuiting CG's stopping rule.  The
    sum-of-squares identity must stay nonnegative and accurate."""
    n, m = 200, 32
    U = rng.normal(size=(n, m))
    sigma_sq = 1e-6  # collapsed noise: ||r||^2 / rz ~ 1e9 amplification
    A = (U / np.sqrt(sigma_sq)).T
    B = A @ A.T + np.eye(m)
    LB = np.linalg.cholesky(B)
    # r almost entirely in the range of Qff, scaled large
    r = (U @ rng.normal(size=(m,)) * 1e3 + 1e-4 * rng.normal(size=(n,)))[None]

    for dt in (np.float64, np.float32):
        P = pc.NystromPreconditioner(
            A=jnp.asarray(A, dt), LB=jnp.asarray(LB, dt),
            sigma_sq=jnp.asarray(sigma_sq),
        )
        _, rz = pc.mat_vec(P, jnp.asarray(r))
        want = float(r[0] @ np.linalg.solve(U @ U.T + sigma_sq * np.eye(n),
                                            r[0]))
        assert float(rz[0]) >= 0.0, dt
        rtol = 1e-8 if dt == np.float64 else 2e-5
        np.testing.assert_allclose(float(rz[0]), want, rtol=rtol)


def test_cg_recovers_from_poisoned_warm_start(rng):
    """Regression: a non-finite warm start (from a diverged feval at an
    extreme line-search probe) must not poison subsequent solves — NaN rz
    made the stopping test 'converge' in 0 steps and return the NaN v
    forever, killing a kin40k run beyond recovery."""
    K, b, precond, _ = _spd_system(rng)
    bad_v0 = jnp.full_like(jnp.asarray(b), jnp.nan)
    matvec = lambda p: p @ jnp.asarray(K)
    v, stats = cgm.preconditioned_cg(
        matvec, jnp.asarray(b), bad_v0, precond, max_error=1e-10,
        max_iters=200,
    )
    assert np.all(np.isfinite(np.asarray(v)))
    want = np.linalg.solve(K, b[0])
    np.testing.assert_allclose(np.asarray(v)[0], want, rtol=1e-5, atol=1e-7)
    assert int(stats.steps) > 0
