"""Exact GP regression (dense Cholesky).

The reference's GPR baseline (gpflow.models.GPR on the TF side, gpytorch ExactGP on
the torch side; reference: cglb/backend/tensorflow/interface.py:200-206,
cglb/backend/pytorch/models.py:38-47).  Serves two roles here:

1. the "gpr" model family of the CLI, and
2. the dense oracle that unit-tests the sparse bounds against (exact LML brackets
   ELBO <= CGLB <= LML <= upper_bound).

All functions are pure and jittable; X64 gives exact fp64 on CPU for tests.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..struct import pytree_dataclass
from ..transforms import Param
from ..ops import kernels as _k
from .gaussian import ConstantMean, mean_apply, predict_log_density

__all__ = ["GPRParams", "log_marginal_likelihood", "predict_f", "gpr_predict_log_density"]


@pytree_dataclass
class GPRParams:
    kernel: object
    noise_variance: Param
    mean: ConstantMean

    @staticmethod
    def create(kernel, noise_variance: float = 1.0, output_dim: int = 1, dtype=None,
               variance_lower: float = None) -> "GPRParams":
        from .. import config as _config

        dtype = dtype or _config.default_float()
        lower = (
            variance_lower
            if variance_lower is not None
            else _config.positive_lower_bound(dtype)
        )
        return GPRParams(
            kernel=kernel,
            noise_variance=Param.positive(
                jnp.asarray(noise_variance, dtype=dtype), lower=lower
            ),
            mean=ConstantMean.create(output_dim, dtype=dtype),
        )


def _chol_Ky(params: GPRParams, X):
    Kff = _k.K(params.kernel, X)
    sigma_sq = params.noise_variance.value
    Ky = Kff + sigma_sq * jnp.eye(X.shape[0], dtype=X.dtype)
    return jnp.linalg.cholesky(Ky)


def log_marginal_likelihood(params: GPRParams, X, Y) -> jnp.ndarray:
    """log p(Y | X, theta) = -0.5 [ N D log 2pi + D log|Ky| + tr(errT Ky^-1 err) ]."""
    err = Y - mean_apply(params.mean, X)
    N, D = Y.shape
    Lk = _chol_Ky(params, X)
    alpha = jsl.solve_triangular(Lk, err, lower=True)
    lml = -0.5 * N * D * math.log(2.0 * math.pi)
    lml -= D * jnp.sum(jnp.log(jnp.diagonal(Lk)))
    lml -= 0.5 * jnp.sum(jnp.square(alpha))
    return lml


def predict_f(params: GPRParams, X, Y, Xnew, full_cov: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior mean and (marginal) variance of the latent f at Xnew."""
    err = Y - mean_apply(params.mean, X)
    Lk = _chol_Ky(params, X)
    Ksf = _k.K(params.kernel, Xnew, X)  # [S, N]
    A = jsl.solve_triangular(Lk, Ksf.T, lower=True)  # [N, S]
    alpha = jsl.solve_triangular(Lk, err, lower=True)  # [N, D]
    f_mean = A.T @ alpha + mean_apply(params.mean, Xnew)
    if full_cov:
        var = _k.K(params.kernel, Xnew) - A.T @ A
    else:
        var = _k.kdiag(params.kernel, Xnew) - jnp.sum(jnp.square(A), axis=0)
        var = jnp.tile(var[:, None], (1, Y.shape[1]))
    return f_mean, var


def gpr_predict_log_density(params: GPRParams, X, Y, Xnew, Ynew) -> jnp.ndarray:
    f_mean, f_var = predict_f(params, X, Y, Xnew)
    return predict_log_density(f_mean, f_var, params.noise_variance.value, Ynew)
