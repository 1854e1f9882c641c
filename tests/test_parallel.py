"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cglb_tpu.models import cglb as cglb_mod
from cglb_tpu.models import sgpr as sgpr_mod
from cglb_tpu.ops import kernels as k
from cglb_tpu.parallel import mesh as mesh_mod
from cglb_tpu.parallel import sharded


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual cpu devices"
    return mesh_mod.data_mesh(8)


def _setup(rng, n=64, d=3, m=8):
    X = rng.normal(size=(n, d))
    Y = np.sin(X[:, :1]) + 0.05 * rng.normal(size=(n, 1))
    kern = k.make_kernel("Matern32", d, dtype=np.float64)
    Z = X[rng.choice(n, m, replace=False)]
    params = sgpr_mod.SGPRParams.create(kern, Z, noise_variance=0.5,
                                        dtype=np.float64)
    return jnp.asarray(X), jnp.asarray(Y), params


def test_sharded_loss_matches_single_device(mesh8, rng):
    X, Y, params = _setup(rng)
    cfg = cglb_mod.CGLBConfig(max_error=1e-10, max_cg_iters=200)
    v0 = cglb_mod.init_v0(X.shape[0])

    l_ref, aux_ref = cglb_mod.loss(params, X, Y, v0, cfg)

    Xs, Ys = sharded.shard_data(mesh8, X, Y)
    f = jax.jit(
        lambda p, v: sharded.sharded_cglb_loss(p, Xs, Ys, v, cfg, mesh8)
    )
    l_sh, aux_sh = f(params, v0)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(aux_sh.v), np.asarray(aux_ref.v), rtol=1e-6, atol=1e-9
    )


def test_sharded_gradients_match_single_device(mesh8, rng):
    X, Y, params = _setup(rng)
    # fp64 preconditioner for exact cross-layout agreement (the f32 default
    # rounds differently between sharded and single-device layouts)
    cfg = cglb_mod.CGLBConfig(max_error=0.01, precond_dtype="float64")
    v0 = cglb_mod.init_v0(X.shape[0])

    g_ref = jax.grad(lambda p: cglb_mod.loss(p, X, Y, v0, cfg)[0])(params)
    Xs, Ys = sharded.shard_data(mesh8, X, Y)
    g_sh = jax.jit(
        jax.grad(lambda p: sharded.sharded_cglb_loss(p, Xs, Ys, v0, cfg, mesh8)[0])
    )(params)
    # tolerance is f32-accumulation grade: the gram path's backward runs
    # dG @ Kuf at f32-HIGHEST (_gram_outer) in BOTH layouts, but sharded
    # and single-device accumulate in different orders (~1e-5 relative);
    # fp64 contributions still agree to 1e-9
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=1e-9)


def test_sharded_train_step_runs_and_improves(mesh8, rng):
    X, Y, params = _setup(rng)
    cfg = cglb_mod.CGLBConfig()
    opt = optax.adam(0.05)
    step = sharded.sharded_train_step(mesh8, cfg, opt)
    Xs, Ys = sharded.shard_data(mesh8, X, Y)
    opt_state = opt.init(params)
    v0 = cglb_mod.init_v0(X.shape[0])
    losses = []
    for _ in range(10):
        params, opt_state, aux, loss = step(params, opt_state, v0, Xs, Ys)
        v0 = aux.v
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)


def test_uneven_shard_sizes_still_work(mesh8, rng):
    """N not divisible by mesh size: GSPMD pads internally; results exact."""
    X, Y, params = _setup(rng, n=61)
    cfg = cglb_mod.CGLBConfig(max_error=1e-8, max_cg_iters=200)
    v0 = cglb_mod.init_v0(61)
    l_ref, _ = cglb_mod.loss(params, X, Y, v0, cfg)
    f = jax.jit(lambda p, v, xs, ys: sharded.sharded_cglb_loss(
        p, xs, ys, v, cfg, mesh8))
    l_sh, _ = f(params, v0, X, Y)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-9)


def test_sharded_streaming_loss_matches_single_device(mesh8, rng):
    """The multi-chip large-N path: CGLB loss on the column-sharded STREAMING
    Pallas matvec agrees with the single-device dense-fp64 loss (streaming K
    entries carry ~1e-6 relative error; tolerance sized accordingly)."""
    X, Y, params = _setup(rng, n=8 * 32, m=12)
    cfg = cglb_mod.CGLBConfig(max_error=1e-8, max_cg_iters=300)
    v0 = cglb_mod.init_v0(X.shape[0])

    l_ref, aux_ref = cglb_mod.loss(params, X, Y, v0, cfg)

    Xs, Ys = sharded.shard_data(mesh8, X, Y)
    f = jax.jit(
        lambda p, v: sharded.sharded_cglb_loss(
            p, Xs, Ys, v, cfg, mesh8, matvec="streaming", block=32
        )
    )
    l_sh, aux_sh = f(params, v0)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=5e-6)
    assert int(aux_sh.cg_steps) > 0


def test_sharded_streaming_train_step(mesh8, rng):
    """One full optimizer step on the streaming sharded loss: finite loss,
    gradients close to the dense sharded step's."""
    X, Y, params = _setup(rng, n=8 * 32, m=12)
    cfg = cglb_mod.CGLBConfig(max_error=0.01, precond_dtype="float64")
    v0 = cglb_mod.init_v0(X.shape[0])
    Xs, Ys = sharded.shard_data(mesh8, X, Y)

    g_dense = jax.jit(
        jax.grad(
            lambda p: sharded.sharded_cglb_loss(p, Xs, Ys, v0, cfg, mesh8)[0]
        )
    )(params)
    g_stream = jax.jit(
        jax.grad(
            lambda p: sharded.sharded_cglb_loss(
                p, Xs, Ys, v0, cfg, mesh8, matvec="streaming", block=32
            )[0]
        )
    )(params)
    np.testing.assert_allclose(
        float(g_stream.noise_variance.raw), float(g_dense.noise_variance.raw),
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(g_stream.kernel.lengthscales.raw),
        np.asarray(g_dense.kernel.lengthscales.raw),
        rtol=1e-3, atol=1e-6,
    )

    opt = optax.adam(0.01)
    step = sharded.sharded_train_step(mesh8, cfg, opt, matvec="streaming",
                                      block=32)
    p2, _, aux, loss = step(params, opt.init(params), v0, Xs, Ys)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(p2.noise_variance.raw))


def test_backend_mesh_training_matches_single_device(tmp_path):
    """The full user-facing stack (--mesh): Model with a data mesh trains
    through the standard optimizers with the sharded CGLB loss, matching the
    single-device model's objective at the same parameters."""
    import numpy as np

    from cglb_tpu.backend import Jax
    from cglb_tpu.configs import CGLBConfig, InducingVariableConfig, \
        Matern32Config
    from cglb_tpu.experiments.datasets import get_dataset

    bundle = get_dataset("synth_300x2")
    cfg = CGLBConfig(Matern32Config(), InducingVariableConfig(12))

    def build(mesh):
        Jax.configure_backend(mesh=mesh)
        try:
            return Jax.create_model(cfg, bundle.train, seed=0)
        finally:
            Jax.configure_backend(mesh=0)

    m1 = build(0)
    m8 = build(8)
    assert m8.mesh is not None and m8.mesh.devices.size == 8

    # identical objective at identical params (dense-sharded at this N)
    l1 = m1.loss_value()
    l8 = m8.loss_value()
    np.testing.assert_allclose(l8, l1, rtol=1e-8)

    # trains end-to-end through the scipy driver
    Jax.optimize(m8, (bundle.train, bundle.test), num_steps=4,
                 optimizer="scipy")
    Jax.optimize(m1, (bundle.train, bundle.test), num_steps=4,
                 optimizer="scipy")
    assert m8.loss_value() < l8  # made progress
    np.testing.assert_allclose(m8.loss_value(), m1.loss_value(), rtol=1e-5)


def test_backend_mesh_streaming_training(tmp_path):
    """--mesh with the streaming (Pallas shard_map) matvec: loss matches the
    single-device dense value and one optimizer step runs."""
    import numpy as np

    from cglb_tpu.backend import Jax
    from cglb_tpu.configs import CGLBConfig, InducingVariableConfig, \
        Matern32Config
    from cglb_tpu.experiments.datasets import get_dataset

    bundle = get_dataset("synth_300x2")
    cfg = CGLBConfig(Matern32Config(), InducingVariableConfig(10))
    Jax.configure_backend(mesh=8, matvec="streaming")
    try:
        m = Jax.create_model(cfg, bundle.train, seed=0)
    finally:
        Jax.configure_backend(mesh=0, matvec="auto")
    l_sharded = m.loss_value()

    Jax.configure_backend(mesh=0, matvec="dense")
    try:
        m1 = Jax.create_model(cfg, bundle.train, seed=0)
    finally:
        Jax.configure_backend(matvec="auto")
    # the streaming kernel carries ~1e-6 per-entry error; CG at max_error=1.0
    # stops discretely, so compare at matching warm starts only loosely
    np.testing.assert_allclose(l_sharded, m1.loss_value(), rtol=1e-3)

    Jax.optimize(m, (bundle.train, bundle.test), num_steps=2,
                 optimizer="adam_0.01")
    assert np.isfinite(m.loss_value())


def test_sharded_loss_traced_max_error_matches_single_device(mesh8, rng):
    """The traced-tolerance override threads through the sharded loss: values
    match the single-device traced path at every level, and all levels share
    ONE compiled program (the scipy_tol contract, backend.loss_fn_tol)."""
    X, Y, params = _setup(rng)
    cfg = cglb_mod.CGLBConfig(max_cg_iters=200)
    v0 = cglb_mod.init_v0(X.shape[0])
    Xs, Ys = sharded.shard_data(mesh8, X, Y)

    f_sh = jax.jit(
        lambda p, v, me: sharded.sharded_cglb_loss(
            p, Xs, Ys, v, cfg, mesh8, max_error=me)
    )
    for me in (1.0, 1e-2):
        l_ref, _ = cglb_mod.loss(params, X, Y, v0, cfg,
                                 max_error=jnp.asarray(me))
        l_sh, _ = f_sh(params, v0, jnp.asarray(me))
        # reduction order differs across layouts; the slack-dependent CG
        # stop amplifies the last-bit noise to ~1e-8 relative
        np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-7)
    assert f_sh._cache_size() == 1  # one program serves every level


def test_scipy_tol_under_mesh(mesh8, rng):
    """-o scipy_tol on the sharded path: the schedule walks levels over the
    mesh (round-3 NotImplementedError dropped) and matches the single-device
    schedule's reachable depth."""
    from cglb_tpu.backend import Model
    from cglb_tpu.utils import training

    # Same shapes as the single-device schedule test (test_training.py
    # test_scipy_tol_minimize_levels_and_depth): at n=64/d=3 the loose-CG
    # objective jitter is large enough relative to the surface that L-BFGS
    # can legitimately grind hundreds of iterations inside one level, so
    # whether the floor fits a small budget depends on fp-level trajectory
    # luck (it flipped when 068d2d1 re-routed the sharded gram through the
    # chunked builder — numerics equal to tolerance, not bitwise).
    X, Y, params = _setup(rng, n=120, d=2, m=10)
    Xn, Yn = np.asarray(X), np.asarray(Y)

    model = Model("cglb", params, (Xn, Yn), run_cfg=cglb_mod.CGLBConfig(),
                  mesh=mesh8)
    res = training.scipy_tol_minimize(
        model.loss_fn(), model.loss_fn_tol(), model.params,
        model._carry_in(), 250, data=model.data)
    mes = [lv["max_error"] for lv in res.info["opt/levels"]]
    assert mes[0] == pytest.approx(1.0)
    assert mes == sorted(mes, reverse=True)
    assert mes[-1] == pytest.approx(1e-2)
    assert np.isfinite(res.final_loss)


def test_sharded_chunked_gram_matches_single_device(mesh8, rng):
    """The mesh-aware chunked gram path (the houseelectric-scale fix: per-
    chunk row-sharded df32 Kuf under lax.map, Gram partials psum over ICI)
    is numerically identical to the unchunked sharded path and matches the
    single-device loss — values AND gradients."""
    X, Y, params = _setup(rng, n=96, d=3, m=8)
    cfg = cglb_mod.CGLBConfig(max_error=0.01, precond_dtype="float64")
    v0 = cglb_mod.init_v0(X.shape[0])
    Xs, Ys = sharded.shard_data(mesh8, X, Y)

    def f(chunk):
        return jax.jit(
            lambda p, v: sharded.sharded_cglb_loss(
                p, Xs, Ys, v, cfg, mesh8, chunk_size=chunk)
        )

    l_ref, _ = cglb_mod.loss(params, X, Y, v0, cfg)
    l_un, _ = f(None)(params, v0)
    l_ch, _ = f(24)(params, v0)  # 96 rows -> 4 chunks of 24 (3 rows/device)
    np.testing.assert_allclose(float(l_ch), float(l_un), rtol=1e-9)
    np.testing.assert_allclose(float(l_ch), float(l_ref), rtol=1e-7)

    g_un = jax.jit(jax.grad(
        lambda p: sharded.sharded_cglb_loss(
            p, Xs, Ys, v0, cfg, mesh8)[0]))(params)
    g_ch = jax.jit(jax.grad(
        lambda p: sharded.sharded_cglb_loss(
            p, Xs, Ys, v0, cfg, mesh8, chunk_size=24)[0]))(params)
    for a, b in zip(jax.tree.leaves(g_un), jax.tree.leaves(g_ch)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-10)
