"""Golden-constant parity tests: the bound math pinned to frozen values.

The reference's correctness anchor is GPflow's SGPR elbo/upper_bound (the
metric bracket at cglb/backend/tensorflow/interface.py:398-427).  GPflow is
not installable in this offline environment, so the anchor here is a fully
independent pure-numpy fp64 oracle (the published formulas: Titsias 2009
ELBO/upper bound, exact-GP log marginal likelihood, and the CGLB bound of
Artemev et al. 2021 at converged v), evaluated ONCE on the deterministic
snelson1d stand-in at fixed hyperparameters and frozen below as literals.

If any refactor drifts the bound math, these exact assertions fail — unlike
the oracle-computed-at-test-time comparisons elsewhere in the suite, which
could drift in lockstep if they shared helpers with the library.

To re-derive on a machine with GPflow: build SGPR(Matern32(variance=1.2,
lengthscales=0.8), noise=0.1, Z=first 30 train points) on the dataset below
and compare elbo()/upper_bound() — the formulas are identical.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cglb_tpu.models import cglb, gpr, sgpr
from cglb_tpu.ops import kernels as k

# Frozen oracle values (pure numpy fp64, see scripts in module docstring);
# dataset = deterministic synthetic snelson1d (134 train points after the
# 67/33 split at split=0), hypers: Matern32 var=1.2 ls=0.8, noise=0.1,
# jitter=1e-6, Z = first 30 train points, constant mean 0.
GOLDEN = {
    "elbo": -148.4586682477,
    "upper": 1.9703585208,
    "lml": -121.6210661280,
    "cglb": -133.3423159214,
}


@pytest.fixture()
def snelson_fixed(monkeypatch, tmp_path):
    monkeypatch.setenv("CGLB_DATA_DIR", str(tmp_path / "no_data_here"))
    from cglb_tpu.experiments.datasets import get_dataset

    b = get_dataset("snelson1d", dtype=np.float64)
    assert b.synthetic, "golden constants are pinned to the synthetic stand-in"
    (Xtr, Ytr), _ = b.train, b.test
    assert Xtr.shape == (134, 1)
    # dataset content itself is part of the frozen contract
    np.testing.assert_allclose(Xtr[0, 0], 1.0032401, rtol=1e-6)
    np.testing.assert_allclose(Ytr[0, 0], 0.79113469, rtol=1e-6)
    return jnp.asarray(Xtr), jnp.asarray(Ytr)


def _params(X):
    kern = k.make_kernel("Matern32", 1, variance=1.2, lengthscales=0.8,
                         dtype=np.float64)
    Z = np.asarray(X)[:30]
    return sgpr.SGPRParams.create(kern, Z, noise_variance=0.1,
                                  dtype=np.float64)


def test_golden_elbo_and_upper(snelson_fixed):
    X, Y = snelson_fixed
    params = _params(X)
    np.testing.assert_allclose(float(sgpr.elbo(params, X, Y, jitter=1e-6)),
                               GOLDEN["elbo"], rtol=1e-9)
    np.testing.assert_allclose(
        float(sgpr.upper_bound(params, X, Y, jitter=1e-6)),
        GOLDEN["upper"], rtol=1e-8)


def test_golden_lml(snelson_fixed):
    X, Y = snelson_fixed
    kern = k.make_kernel("Matern32", 1, variance=1.2, lengthscales=0.8,
                         dtype=np.float64)
    gparams = gpr.GPRParams.create(kern, noise_variance=0.1, dtype=np.float64)
    np.testing.assert_allclose(
        float(gpr.log_marginal_likelihood(gparams, X, Y)),
        GOLDEN["lml"], rtol=1e-9)


def test_golden_cglb_at_converged_v(snelson_fixed):
    X, Y = snelson_fixed
    params = _params(X)
    cfg = cglb.CGLBConfig(max_error=1e-14, max_cg_iters=500)
    v0 = cglb.init_v0(X.shape[0])
    b, aux = cglb.bound(params, X, Y, v0, cfg, jitter=1e-6)
    np.testing.assert_allclose(float(b), GOLDEN["cglb"], rtol=1e-8)
    # bracket against the other frozen constants
    assert GOLDEN["elbo"] < float(b) < GOLDEN["lml"] < GOLDEN["upper"]
