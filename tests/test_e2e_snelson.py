"""End-to-end snelson-scale training (BASELINE.md PR1 config: N=200, M=100,
Matern32, fp64, ConditionalVariance, scipy L-BFGS).

Checks the full pipeline the way the reference's de-facto integration test
does (SURVEY.md section 4): train to convergence, verify the bound bracket,
and verify CGLB's bound/posterior agree with the exact GP at this scale
(M = N/2 makes the sparse approximation near-exact on 1-D data).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cglb_tpu.backend import Jax
from cglb_tpu.configs import (
    CGLBConfig,
    GPRConfig,
    InducingVariableConfig,
    Matern32Config,
    SGPRConfig,
)
from cglb_tpu.experiments.datasets import get_dataset


@pytest.fixture(scope="module")
def snelson():
    return get_dataset("snelson1d", split=0)


def test_cglb_snelson_end_to_end(snelson):
    cfg = CGLBConfig(Matern32Config(), InducingVariableConfig(100))
    model = Jax.create_model(cfg, snelson.train, seed=0)
    metrics_fn = Jax.metrics_fn(model, snelson.to_tuple())
    before = metrics_fn()
    Jax.optimize(model, snelson.to_tuple(), num_steps=300, optimizer="scipy")
    after = metrics_fn()

    # training moved the bound substantially
    assert after["loss"] < before["loss"] - 5.0
    # bracket holds after training
    assert after["elbo"] <= after["cg_lower_bound"] + 1e-6
    assert after["cg_lower_bound"] <= after["titsias_upper_bound"] + 1e-6
    # beats the trivial mean predictor (z-scored: rmse 1.0)
    assert after["test/rmse"] < 0.9
    assert after["test/nlpd"] < 1.2

    # with M = N/2 on 1-D data the sparse bound is near-tight: compare to the
    # exact GP log marginal likelihood at the SAME hyperparameters
    gpr_model = Jax.create_model(GPRConfig(Matern32Config()), snelson.train)
    gpr_model.params = type(gpr_model.params)(
        kernel=model.params.kernel,
        noise_variance=model.params.noise_variance,
        mean=model.params.mean,
    )
    lml = gpr_model.lml()
    assert after["cg_lower_bound"] <= lml + 1e-6
    # tightness: within 1% of |LML|
    assert abs(after["cg_lower_bound"] - lml) < 0.01 * abs(lml) + 0.5


def test_sgpr_vs_cglb_time_ordering(snelson):
    """CGLB's bound should be at least as tight as SGPR's ELBO after the same
    optimization budget (the paper's headline claim at small scale)."""
    sgpr_cfg = SGPRConfig(Matern32Config(), InducingVariableConfig(30))
    cglb_cfg = CGLBConfig(Matern32Config(), InducingVariableConfig(30))

    sgpr_model = Jax.create_model(sgpr_cfg, snelson.train, seed=0)
    cglb_model = Jax.create_model(cglb_cfg, snelson.train, seed=0)
    Jax.optimize(sgpr_model, snelson.to_tuple(), num_steps=150,
                 optimizer="scipy")
    Jax.optimize(cglb_model, snelson.to_tuple(), num_steps=150,
                 optimizer="scipy")

    m_sgpr = Jax.metrics_fn(sgpr_model, snelson.to_tuple())()
    m_cglb = Jax.metrics_fn(cglb_model, snelson.to_tuple())()
    # trained CGLB bound >= trained SGPR elbo (same M, same budget) - slack
    assert m_cglb["cg_lower_bound"] >= m_sgpr["elbo"] - 0.5
    # predictions comparable
    assert m_cglb["test/rmse"] < m_sgpr["test/rmse"] + 0.05


def test_optimizer_paths_agree_on_final_quality(snelson):
    """scipy vs on-device lbfgs vs native C++ lbfgs land at comparable bounds
    (trajectory parity is NOT expected; SURVEY.md 'L-BFGS parity')."""
    from cglb_tpu.utils.native import native_available

    results = {}
    optimizers = ["scipy", "scipy_tol", "lbfgs"] + (
        ["lbfgs_native"] if native_available() else []
    )
    for opt in optimizers:
        cfg = CGLBConfig(Matern32Config(), InducingVariableConfig(40))
        model = Jax.create_model(cfg, snelson.train, seed=0)
        Jax.optimize(model, snelson.to_tuple(), num_steps=120, optimizer=opt)
        results[opt] = Jax.metrics_fn(model, snelson.to_tuple())()["loss"]
    best = min(results.values())
    for opt, loss in results.items():
        assert loss < best + 0.05 * abs(best) + 2.0, (opt, results)
