"""Linear operators for the regularized kernel matrix K(X,X) + sigma^2 I.

The CG loop only needs a matvec ``p [B,N] -> p K [B,N]``.  Three interchangeable
implementations exist:

- dense:     materialize K once (XLA); the reference TF backend's behavior
             (cglb/backend/tensorflow/models.py:154).  O(N^2) HBM.
- streaming: Pallas blockwise fused distance->kernel->matvec, K never hits HBM;
             the KeOps-replacement (reference consumed lazies at
             cglb/backend/pytorch/models.py:251-252).  See ops/matvec_pallas.py.
- sharded:   row-sharded over a device mesh with psum; see cglb_tpu/parallel/.

All return differentiable closures (the bound re-assembly needs d(matvec)/dtheta).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from . import kernels as _k

__all__ = ["make_dense_operator"]

MatVec = Callable[[jnp.ndarray], jnp.ndarray]


def make_dense_operator(kernel, X, sigma_sq) -> MatVec:
    """Materialize K(X,X) + sigma^2 I and return p -> p K."""
    Kmat = _k.K(kernel, X) + sigma_sq * jnp.eye(X.shape[0], dtype=X.dtype)

    def matvec(p):
        return p @ Kmat

    return matvec
