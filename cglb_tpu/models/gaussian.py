"""Gaussian likelihood / density helpers and the constant mean function.

Mirrors the reference's setup: every model uses a Constant mean function and a
Gaussian likelihood whose variance has a dtype-dependent lower bound
(reference: cglb/backend/tensorflow/interface.py:200-292, 257; Gaussian log-density
helpers at cglb/backend/pytorch/models.py:370-379).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..struct import pytree_dataclass
from ..transforms import Param

__all__ = ["ConstantMean", "mean_apply", "gaussian_log_density", "predict_log_density"]


@pytree_dataclass
class ConstantMean:
    """m(x) = c, broadcast over rows; c has shape [output_dim]."""

    c: Param

    @staticmethod
    def create(output_dim: int = 1, dtype=None) -> "ConstantMean":
        return ConstantMean(c=Param.create(jnp.zeros((output_dim,), dtype=dtype)))


def mean_apply(mean: ConstantMean, X) -> jnp.ndarray:
    c = mean.c.value
    return jnp.broadcast_to(c[None, :], (X.shape[0], c.shape[0])).astype(X.dtype)


def gaussian_log_density(x, mu, var):
    """Elementwise log N(x | mu, var)."""
    return -0.5 * (math.log(2.0 * math.pi) + jnp.log(var) + jnp.square(x - mu) / var)


def predict_log_density(f_mean, f_var, noise_variance, Y):
    """Log predictive density of observations under Gaussian noise:
    log N(Y | f_mean, f_var + sigma^2), summed over output dims per row."""
    return jnp.sum(gaussian_log_density(Y, f_mean, f_var + noise_variance), axis=-1)
