"""Dispatch-bounded training step (parallel/dispatch.py).

The claim under test: cutting the feval into bounded dispatches changes
NOTHING — the chunked CG continues the exact monolithic iterate sequence,
and the step's outputs (loss, updated params, warm start) match the
single-dispatch step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cglb_tpu.models import cglb, sgpr
from cglb_tpu.ops import cg as cg_mod
from cglb_tpu.ops import kernels as k
from cglb_tpu.ops import operators as op_mod
from cglb_tpu.ops import preconditioners as pc
from cglb_tpu.parallel import dispatch, mesh as mesh_mod, sharded
from cglb_tpu.utils import flatten as fl


def _setup(rng, n=128, d=3, m=16, noise=0.5):
    X = rng.normal(size=(n, d))
    w = rng.normal(size=(d, 1))
    Y = np.tanh(X @ w) + 0.1 * rng.normal(size=(n, 1))
    kern = k.make_kernel("Matern32", d, variance=1.2, lengthscales=1.1,
                         dtype=np.float64)
    Z = X[rng.choice(n, m, replace=False)]
    params = sgpr.SGPRParams.create(kern, Z, noise_variance=noise,
                                    dtype=np.float64)
    return jnp.asarray(X), jnp.asarray(Y), params


def test_cg_advance_chunked_matches_monolithic(rng):
    """cg_init + chunked cg_advance == one preconditioned_cg call: same
    iterate, same step count, same residual (identical arithmetic)."""
    X, Y, params = _setup(rng)
    sigma_sq = params.noise_variance.value
    matvec = op_mod.make_dense_operator(params.kernel, X, sigma_sq)
    ct = sgpr.common_terms(params, X, None)
    P = cglb._make_precond(ct, sigma_sq, cglb.CGLBConfig(), consistent_ct=True)
    b = Y.T
    v0 = cglb.init_v0(X.shape[0])
    me, max_iters = 1e-10, 60

    v_mono, stats_mono = cg_mod.preconditioned_cg(matvec, b, v0, P, me,
                                                  max_iters)
    carry = cg_mod.cg_init(matvec, b, v0, P)
    done = 0
    for chunk in (3, 5, 7, 11, 100):
        cap = min(max_iters, done + chunk)
        carry, stats = cg_mod.cg_advance(matvec, b, P, carry, me, cap)
        done = int(stats.steps)
        if done < cap or done >= max_iters:
            break
    np.testing.assert_allclose(np.asarray(carry.state.v),
                               np.asarray(v_mono), rtol=1e-12, atol=1e-14)
    assert int(stats.steps) == int(stats_mono.steps)
    np.testing.assert_allclose(float(stats.residual_error),
                               float(stats_mono.residual_error),
                               rtol=1e-10, atol=1e-14)


def _monolithic_step(cfg, opt):
    """The single-dispatch reference step (dense matvec, like cglb.loss)."""

    @jax.jit
    def step(params, opt_state, v0, X, Y):
        def loss_fn(p):
            return cglb.loss(p, X, Y, v0, cfg)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = fl.mask_untrainable_grads(params, grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux, loss

    return step


@pytest.mark.parametrize("iters_per_dispatch", [2, 5])
def test_bounded_step_matches_monolithic(rng, iters_per_dispatch):
    X, Y, params = _setup(rng)
    cfg = cglb.CGLBConfig(max_error=1e-6, max_cg_iters=50)
    opt = optax.adam(0.01)
    opt_state = opt.init(params)
    v0 = cglb.init_v0(X.shape[0])

    p_mono, _, aux_mono, loss_mono = _monolithic_step(cfg, opt)(
        params, opt_state, v0, X, Y)

    step = dispatch.bounded_train_step(cfg, opt, matvec="dense",
                                       iters_per_dispatch=iters_per_dispatch)
    p_b, _, aux_b, loss_b = step(params, opt.init(params), v0, X, Y)

    # The two CG runs live in differently-compiled programs, so per-iteration
    # rounding differs at ~1e-16 and CG's recurrence amplifies that drift over
    # iterations (the exact-sequence claim is proven eagerly in
    # test_cg_advance_chunked_matches_monolithic, where the arithmetic is
    # shared).  Functionally both v's are max_error-accurate solutions and the
    # bound/gradients are flat in v at that scale — assert THAT contract.
    np.testing.assert_allclose(float(loss_b), float(loss_mono), rtol=1e-8)
    assert abs(int(aux_b.cg_steps) - int(aux_mono.cg_steps)) <= 2
    np.testing.assert_allclose(np.asarray(aux_b.v), np.asarray(aux_mono.v),
                               rtol=1e-2, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_b),
                    jax.tree_util.tree_leaves(p_mono)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_bounded_step_multi_step_improves(rng):
    """5 bounded steps train: loss decreases and the warm start carries."""
    X, Y, params = _setup(rng)
    cfg = cglb.CGLBConfig(max_error=1.0, max_cg_iters=30)
    opt = optax.adam(0.05)
    step = dispatch.bounded_train_step(cfg, opt, matvec="dense",
                                       iters_per_dispatch=4)
    opt_state = opt.init(params)
    v0 = cglb.init_v0(X.shape[0])
    losses = []
    for _ in range(5):
        params, opt_state, aux, loss = step(params, opt_state, v0, X, Y)
        v0 = aux.v
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_cg_carry_checkpoints_mid_solve(rng):
    """The CG carry round-trips through host numpy (a checkpoint) and the
    resumed solve finishes identically — the failure-recovery window is one
    CG chunk, not one feval."""
    X, Y, params = _setup(rng)
    sigma_sq = params.noise_variance.value
    matvec = op_mod.make_dense_operator(params.kernel, X, sigma_sq)
    ct = sgpr.common_terms(params, X, None)
    P = cglb._make_precond(ct, sigma_sq, cglb.CGLBConfig(), consistent_ct=True)
    b = Y.T
    me, max_iters = 1e-10, 60

    carry = cg_mod.cg_init(matvec, b, cglb.init_v0(X.shape[0]), P)
    carry, _ = cg_mod.cg_advance(matvec, b, P, carry, me, 7)

    # "checkpoint": every leaf to host numpy, rebuild the pytree
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    restored = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(np.asarray(l)) for l in leaves])

    carry, stats = cg_mod.cg_advance(matvec, b, P, carry, me, max_iters)
    carry2, stats2 = cg_mod.cg_advance(matvec, b, P, restored, me, max_iters)
    assert int(stats.steps) == int(stats2.steps)
    np.testing.assert_array_equal(np.asarray(carry.state.v),
                                  np.asarray(carry2.state.v))


def test_backend_adam_dispatch_bound(rng, tmp_path):
    """--dispatch-bound wiring: Model.bounded_step drives -o adam_* training
    and lands where the monolithic adam loop lands."""
    from cglb_tpu.backend import Model, Jax

    X, Y, params = _setup(rng)
    Xn, Yn = np.asarray(X), np.asarray(Y)
    cfg = cglb.CGLBConfig(max_error=0.1, max_cg_iters=40)

    m1 = Model("cglb", params, (Xn, Yn), run_cfg=cfg, matvec="dense")
    r1 = Jax.optimize(m1, None, 8, optimizer="adam_0.05")

    m2 = Model("cglb", params, (Xn, Yn), run_cfg=cfg, matvec="dense",
               dispatch_bound=4)
    r2 = Jax.optimize(m2, None, 8, optimizer="adam_0.05")

    assert np.isfinite(r2.final_loss)
    np.testing.assert_allclose(r2.final_loss, r1.final_loss, rtol=1e-5)
    assert isinstance(r2.state, cglb.CGLBAux)


def test_bounded_step_matches_sharded_mesh(rng):
    """Mesh variant: bounded step == sharded_train_step output."""
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = mesh_mod.data_mesh(8)
    X, Y, params = _setup(rng)
    cfg = cglb.CGLBConfig(max_error=1e-4, max_cg_iters=40)
    opt = optax.adam(0.01)
    Xs, Ys = sharded.shard_data(mesh, X, Y)
    v0 = cglb.init_v0(X.shape[0])

    # sharded_train_step donates params/opt_state/v0 — hand it copies so the
    # originals stay alive for the bounded step
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    mono = sharded.sharded_train_step(mesh, cfg, opt, matvec="dense")
    p_mono, _, aux_mono, loss_mono = mono(copy(params), opt.init(params),
                                          copy(v0), Xs, Ys)

    step = dispatch.bounded_train_step(cfg, opt, mesh=mesh, matvec="dense",
                                       iters_per_dispatch=3)
    p_b, _, aux_b, loss_b = step(params, opt.init(params),
                                 cglb.init_v0(X.shape[0]), Xs, Ys)

    np.testing.assert_allclose(float(loss_b), float(loss_mono), rtol=1e-8)
    assert abs(int(aux_b.cg_steps) - int(aux_mono.cg_steps)) <= 2
    for a, b in zip(jax.tree_util.tree_leaves(p_b),
                    jax.tree_util.tree_leaves(p_mono)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)
