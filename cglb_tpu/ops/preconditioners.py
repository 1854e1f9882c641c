"""Preconditioners for the kernel-system CG solve.

Nystrom/Woodbury preconditioner ``P = (Qff + sigma^2 I)^-1`` applied as
``P r = (r - A^T (L_B L_B^T)^-1 A r) / sigma^2`` where ``A = L^-1 Kuf / sigma`` and
``L_B = chol(A A^T + I)`` — two [M, .] triangular solves and two [M, N] matmuls, no
N x N work (reference semantics: cglb/backend/tensorflow/preconditioners.py:36-89,
cglb/backend/pytorch/conjugate_gradient.py:89-113).

Represented as pytree dataclasses so they can live inside jitted/while_loop'd code.
``mat_vec`` operates on row-stacked vectors r of shape [B, N] and returns
``(P r, per-column r^T P r)``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..struct import pytree_dataclass

__all__ = ["IdentityPreconditioner", "NystromPreconditioner", "mat_vec"]


@pytree_dataclass
class IdentityPreconditioner:
    pass


@pytree_dataclass
class NystromPreconditioner:
    A: jnp.ndarray        # [M, N]
    LB: jnp.ndarray       # [M, M], lower
    sigma_sq: jnp.ndarray  # []


def mat_vec(precond, r: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the preconditioner to row-vectors r [B, N].

    Returns (z, rz) with z = P r (shape [B, N]) and rz[b] = r_b^T P r_b (shape [B]).
    """
    if isinstance(precond, IdentityPreconditioner):
        return r, jnp.sum(r * r, axis=-1)
    if isinstance(precond, NystromPreconditioner):
        A, LB, sigma_sq = precond.A, precond.LB, precond.sigma_sq
        rt = r.T  # [N, B]
        Ar = A @ rt  # [M, B]
        u = jsl.solve_triangular(LB, Ar, lower=True)
        w = jsl.solve_triangular(LB.T, u, lower=False)
        rv = rt - A.T @ w  # [N, B]
        rz = jnp.sum(rv * rt, axis=0)  # [B]
        return rv.T / sigma_sq, rz / sigma_sq
    raise NotImplementedError(type(precond))


def inv_mat_vec(precond: NystromPreconditioner, r: jnp.ndarray) -> jnp.ndarray:
    """(Qff + sigma^2 I) r for row-vectors r [B, N] (the inverse operator of
    mat_vec; reference: preconditioners.py:79-84)."""
    A, sigma_sq = precond.A, precond.sigma_sq
    rt = r.T * sigma_sq
    Ar = A @ rt
    return (A.T @ Ar + rt).T
