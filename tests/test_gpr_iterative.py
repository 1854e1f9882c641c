"""Iterative exact-GP ('Iterative GP' baseline): SLQ logdet, surrogate grads,
LOVE-style predictive variance — validated against the dense Cholesky oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cglb_tpu.models import gpr, gpr_iterative as itgp
from cglb_tpu.ops import kernels as k
from cglb_tpu.ops import operators as _op


def _setup(rng, n=96, d=2, noise=0.3):
    X = rng.normal(size=(n, d))
    Y = np.sin(X[:, :1]) + 0.1 * rng.normal(size=(n, 1))
    kern = k.make_kernel("rbf", d, dtype=np.float64)
    params = gpr.GPRParams.create(kern, noise_variance=noise, dtype=np.float64)
    return jnp.asarray(X), jnp.asarray(Y), params


def test_lanczos_reconstructs_small_operator(rng):
    """Full-step Lanczos on a small SPD matrix reproduces its log-det."""
    n = 24
    G = rng.normal(size=(n, n))
    K = G @ G.T + n * np.eye(n)
    matvec = lambda p: p @ jnp.asarray(K)
    v0 = jnp.asarray(rng.normal(size=(1, n)))
    alphas, betas, _ = itgp.lanczos(matvec, v0, n)
    quad = itgp._tridiag_logquad(alphas, betas)
    # with a single probe and full steps, e1^T log(T) e1 * ||v||^2 is exact
    # only in expectation; instead check T's eigenvalues match K's extremes
    a, b = np.asarray(alphas[0]), np.asarray(betas[0])
    T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
    ev_T = np.linalg.eigvalsh(T)
    ev_K = np.linalg.eigvalsh(K)
    np.testing.assert_allclose(ev_T.max(), ev_K.max(), rtol=1e-6)
    np.testing.assert_allclose(ev_T.min(), ev_K.min(), rtol=1e-2)


def test_slq_logdet_close_to_exact(rng):
    X, Y, params = _setup(rng)
    sigma_sq = float(params.noise_variance.value)
    Kmat = np.asarray(k.K(params.kernel, X)) + sigma_sq * np.eye(X.shape[0])
    exact = float(np.linalg.slogdet(Kmat)[1])
    matvec = _op.make_dense_operator(params.kernel, X,
                                     params.noise_variance.value)
    est = float(itgp.slq_logdet(matvec, X.shape[0], jax.random.PRNGKey(0),
                                num_probes=30, steps=30, dtype=np.float64))
    # stochastic estimator: a few percent of |logdet|
    assert abs(est - exact) < 0.05 * abs(exact) + 2.0


def test_iterative_lml_close_to_exact(rng):
    X, Y, params = _setup(rng)
    exact = float(gpr.log_marginal_likelihood(params, X, Y))
    lml, aux = itgp.iterative_lml(params, X, Y, jax.random.PRNGKey(1),
                                  itgp.IterGPConfig(num_probes=30,
                                                    lanczos_steps=40))
    assert abs(float(lml) - exact) < 0.05 * abs(exact) + 2.0
    assert int(aux.cg_steps) > 0


def test_iterative_gradients_close_to_exact(rng):
    """Surrogate gradients track the dense-Cholesky autodiff gradients."""
    X, Y, params = _setup(rng, n=64)
    cfg = itgp.IterGPConfig(num_probes=64, lanczos_steps=40,
                            cg_tolerance=1e-10)
    key = jax.random.PRNGKey(2)
    g_it = jax.grad(
        lambda p: itgp.iterative_loss(p, X, Y, key, cfg)[0]
    )(params)
    g_ex = jax.grad(
        lambda p: -gpr.log_marginal_likelihood(p, X, Y)
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ex),
                    jax.tree_util.tree_leaves(g_it)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(a)) + 1e-6
        # Hutchinson trace noise ~ 1/sqrt(P); allow 15% of the leaf scale
        np.testing.assert_allclose(b / scale, a / scale, atol=0.15)


def test_iterative_predict_matches_exact(rng):
    X, Y, params = _setup(rng, n=80)
    Xs = jnp.asarray(np.random.default_rng(5).normal(size=(12, 2)))
    mean_it, var_it = itgp.predict_f_iterative(
        params, X, Y, Xs, itgp.IterGPConfig(pred_lanczos_steps=80)
    )
    mean_ex, var_ex = gpr.predict_f(params, X, Y, Xs)
    np.testing.assert_allclose(np.asarray(mean_it), np.asarray(mean_ex),
                               rtol=2e-3, atol=1e-3)
    # LOVE variance is a rank-t UNDER-approximation of the subtraction term,
    # i.e. an over-estimate of the variance that tightens with t
    assert (np.asarray(var_it) >= np.asarray(var_ex) - 1e-6).all()
    np.testing.assert_allclose(np.asarray(var_it), np.asarray(var_ex),
                               rtol=0.2, atol=1e-3)


def test_iterative_training_improves(rng):
    """A few Adam steps on the iterative objective reduce the loss."""
    import optax

    from cglb_tpu.utils import flatten as fl

    X, Y, params = _setup(rng, n=64)
    cfg = itgp.IterGPConfig(num_probes=8, lanczos_steps=20)
    key = jax.random.PRNGKey(0)

    opt = optax.adam(0.05)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        key, sub = jax.random.split(key)
        (loss, _), grads = jax.value_and_grad(
            lambda p: itgp.iterative_loss(p, X, Y, sub, cfg), has_aux=True
        )(params)
        grads = fl.mask_untrainable_grads(params, grads)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, key, loss

    losses = []
    for _ in range(15):
        params, state, key, loss = step(params, state, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_exactgp_backend_end_to_end():
    """'exactgp' model family (reference GPR_CONFIGS['exactgp']) trains with
    the staged schedule and produces finite metrics."""
    from cglb_tpu.backend import Jax
    from cglb_tpu.configs import ExactGPConfig, Matern32Config
    from cglb_tpu.experiments.datasets import get_dataset

    bundle = get_dataset("synth_200x2")
    model = Jax.create_model(ExactGPConfig(Matern32Config()), bundle.train,
                             seed=0)
    assert model.kind == "exactgp"
    before = Jax.metrics_fn(model, bundle.to_tuple())()
    Jax.optimize(model, bundle.to_tuple(), num_steps=30, optimizer="adam_0.1")
    after = Jax.metrics_fn(model, bundle.to_tuple())()
    assert after["loss"] < before["loss"]
    assert np.isfinite(after["test/rmse"]) and after["test/rmse"] < 1.0
    assert np.isfinite(after["test/nlpd"])
