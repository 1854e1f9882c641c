"""Staged exact-GP baseline training + batched prediction + preconditioner
square-root factor."""

import jax.numpy as jnp
import numpy as np

from cglb_tpu.backend import Jax
from cglb_tpu.configs import GPRConfig, Matern32Config
from cglb_tpu.experiments.datasets import get_dataset
from cglb_tpu.ops import preconditioners as pc


def test_staged_gpr_baseline_trains():
    bundle = get_dataset("synth_300x3")
    model = Jax.create_model(GPRConfig(Matern32Config()), bundle.train, seed=0)
    before = Jax.metrics_fn(model, bundle.to_tuple())()
    Jax.optimize(model, bundle.to_tuple(), num_steps=40, optimizer="staged")
    after = Jax.metrics_fn(model, bundle.to_tuple())()
    assert after["loss"] < before["loss"]
    assert after["test/rmse"] < 1.0


def test_batched_predict_matches_unbatched():
    bundle = get_dataset("synth_300x3")
    model = Jax.create_model(GPRConfig(Matern32Config()), bundle.train, seed=0)
    Xs = jnp.asarray(bundle.test[0])
    m1, v1 = model.predict_f(Xs)
    m2, v2 = model.predict_f_batched(Xs, batch_size=17)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-10)


def test_sqrt_factor_consistency(rng):
    """S S^T w == (Qff + s2 I) w for the corrected square-root factor."""
    n, m = 40, 8
    U = rng.normal(size=(n, m))
    sigma_sq = 0.4
    A = (U / np.sqrt(sigma_sq)).T  # [m, n]
    B = A @ A.T + np.eye(m)
    LB = np.linalg.cholesky(B)
    P = pc.NystromPreconditioner(
        A=jnp.asarray(A), LB=jnp.asarray(LB), sigma_sq=jnp.asarray(sigma_sq)
    )
    # Compose S (S^T r): S^T r = sigma [A r; r] shape [B, M+N]
    r = rng.normal(size=(1, n))
    St_r = np.sqrt(sigma_sq) * np.concatenate(
        [(A @ r.T).T, r], axis=1
    )  # [1, m+n]
    got = np.asarray(pc.sqrt_factor_mat_vec(P, jnp.asarray(St_r)))
    want = np.asarray(pc.inv_mat_vec(P, jnp.asarray(r)))  # (Qff + s2 I) r
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)
