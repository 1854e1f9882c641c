"""Streaming kernel matvec: fused distance -> kernel -> contract Pallas tiles.

The KeOps replacement (reference consumes lazy ``kernel(x).add_diag(s2)``
operators in the CG loop at cglb/backend/pytorch/models.py:251-252 and
conjugate_gradient.py:57-66; KeOps JIT-generates CUDA that streams K tile by
tile).  Here the same streaming computation is a Pallas TPU kernel:

    out[b, j] = sum_i p[b, i] * k(x_i, x_j)        (K never materialized in HBM)

Design (TPU):
- grid = (N/bj, N/bi), j-major: each output block [B, bj] is revisited across
  the i-steps and accumulated in VMEM scratch with Kahan compensation (f32
  products, ~f48 effective accumulation across tiles).
- pairwise squared distances use the matmul expansion on pre-lengthscale-scaled
  inputs; inputs are split hi/lo (double-float), so three f32 MXU matmuls carry
  ~48-bit mantissa through the cancellation-prone cross term.
- kernel values (exp / sqrt) evaluate on the VPU in f32; the variance is a pure
  prefactor of both kernel families and scales the *output* outside the kernel
  (no scalar plumbing into SMEM).
- accuracy: ~1e-6 relative matvec error vs the dense fp64 oracle — far below
  the CG stopping thresholds used in training (max_error=1.0) and prediction
  (1e-3); the dense fp64 XLA path stays available where bitwise fp64 matters.

Differentiability (custom_vjp):
    d/dp            = g K                  (one more streaming pass; K = K^T)
    d/dvariance     = <out, g> / variance  (free from the forward residual)
    d/dlengthscales = streaming weighted-gradient kernel: tile-local matmuls
                      computing sum_ij p_i g_j (dk/dd2)_ij d(d2)/d(ls)
so the CGLB bound assembly runs on the streaming operator end to end.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernels as _k

__all__ = ["kernel_matvec", "make_streaming_operator", "split_hi_lo"]

_SQRT3 = math.sqrt(3.0)


class _Spec(NamedTuple):
    """Static kernel/tiling description (hashable; nondiff custom_vjp arg)."""

    family: str  # "rbf" | "mat32"
    block_i: int
    block_j: int
    interpret: bool


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def split_hi_lo(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Double-float split: x ~= hi + lo with hi, lo float32."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def _pad_rows(a, n_pad):
    return a if a.shape[0] == n_pad else jnp.pad(a, ((0, n_pad - a.shape[0]), (0, 0)))


def _pad_cols(a, n_pad):
    return a if a.shape[1] == n_pad else jnp.pad(a, ((0, 0), (0, n_pad - a.shape[1])))


def _tile_d2(xi_hi, xi_lo, xj_hi, xj_lo):
    """Squared-distance tile [bi, bj] (f32, hi/lo compensated cross term).

    MXU cost: the hi@hi product needs full f32 precision (6 bf16 passes on TPU,
    HIGHEST) because d2 suffers catastrophic cancellation near the diagonal.
    The two df64 correction terms hi@lo + lo@hi only matter at ~2^-24 relative,
    so one single-pass (DEFAULT) matmul of the lane-packed concatenation
    [hi|lo] @ [lo|hi]^T is plenty — D <= 64 keeps the packed contraction within
    the 128-lane tile, i.e. the correction is free lane-fill, not extra passes.
    """
    f32 = jnp.float32
    cross = jnp.dot(xi_hi, xj_hi.T, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)
    if xi_hi.shape[1] * 2 <= 128:
        packed_i = jnp.concatenate([xi_hi, xi_lo], axis=1)
        packed_j = jnp.concatenate([xj_lo, xj_hi], axis=1)
        cross += jnp.dot(packed_i, packed_j.T, preferred_element_type=f32)
    else:
        cross += jnp.dot(xi_hi, xj_lo.T, preferred_element_type=f32)
        cross += jnp.dot(xi_lo, xj_hi.T, preferred_element_type=f32)
    ni = jnp.sum(xi_hi * xi_hi + 2.0 * xi_hi * xi_lo, axis=1)
    nj = jnp.sum(xj_hi * xj_hi + 2.0 * xj_hi * xj_lo, axis=1)
    return jnp.maximum(ni[:, None] + nj[None, :] - 2.0 * cross, 0.0)


def _tile_rho(spec: _Spec, d2):
    """Unit-variance kernel tile rho(d2)."""
    if spec.family == "rbf":
        return jnp.exp(-0.5 * d2)
    r = jnp.sqrt(d2)
    s3r = _SQRT3 * r
    return (1.0 + s3r) * jnp.exp(-s3r)


def _tile_drho_dd2(spec: _Spec, d2):
    """d(rho)/d(d2) tile."""
    if spec.family == "rbf":
        return -0.5 * jnp.exp(-0.5 * d2)
    r = jnp.sqrt(d2)
    return -1.5 * jnp.exp(-_SQRT3 * r)


def _matvec_kernel(spec: _Spec, p_ref, xih_ref, xil_ref, xjh_ref, xjl_ref,
                   out_ref, acc_ref, comp_ref):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    kt = _tile_rho(spec, _tile_d2(xih_ref[:], xil_ref[:], xjh_ref[:], xjl_ref[:]))
    contrib = jnp.dot(p_ref[:], kt, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = contrib
        comp_ref[:] = jnp.zeros_like(contrib)

    @pl.when(i > 0)
    def _():
        # Kahan-compensated accumulation across i-tiles
        y = contrib - comp_ref[:]
        t = acc_ref[:] + y
        comp_ref[:] = (t - acc_ref[:]) - y
        acc_ref[:] = t

    @pl.when(i == n_i - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _ls_grad_kernel(spec: _Spec, p_ref, g_ref, xih_ref, xil_ref, xjh_ref,
                    xjl_ref, out_ref):
    j = pl.program_id(0)
    i = pl.program_id(1)
    kp = _tile_drho_dd2(
        spec, _tile_d2(xih_ref[:], xil_ref[:], xjh_ref[:], xjl_ref[:])
    )  # [bi, bj]
    # m_ij = p_i g_j rho'_ij  (B = 1)
    m = (p_ref[0, :][:, None] * g_ref[0, :][None, :]) * kp
    xi = xih_ref[:]  # hi part suffices for gradient accuracy
    xj = xjh_ref[:]
    # sum_ij m_ij (xs_id - xs_jd)^2
    #   = rowsum(m) . xi^2 + colsum(m) . xj^2 - 2 sum_i xi_d (m @ xj)_id
    t1 = jnp.dot(jnp.sum(m, axis=1)[None, :], xi * xi,
                 preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # [1, D]
    t2 = jnp.dot(jnp.sum(m, axis=0)[None, :], xj * xj,
                 preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # [1, D]
    u = jnp.dot(m, xj, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # [bi, D]
    t3 = jnp.sum(xi * u, axis=0)[None, :]  # [1, D]
    partial = t1 + t2 - 2.0 * t3

    first = jnp.logical_and(j == 0, i == 0)

    @pl.when(first)
    def _():
        out_ref[:] = partial

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] += partial


def _prepare(spec: _Spec, X, ls):
    """Lengthscale-scale in fp64, hi/lo split, pad rows to tile multiples."""
    bmax = max(spec.block_i, spec.block_j)
    n_pad = int(np.ceil(X.shape[0] / bmax) * bmax)
    Xs = X / ls
    hi, lo = split_hi_lo(Xs)
    return _pad_rows(hi, n_pad), _pad_rows(lo, n_pad), n_pad


def _matvec_impl(spec: _Spec, X, var, ls, p):
    n = X.shape[0]
    B = p.shape[0]
    hi, lo, n_pad = _prepare(spec, X, ls)
    bi, bj = spec.block_i, spec.block_j
    D = hi.shape[1]
    pf = _pad_cols(p.astype(jnp.float32), n_pad)

    out = pl.pallas_call(
        functools.partial(_matvec_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((B, n_pad), jnp.float32),
        grid=(n_pad // bj, n_pad // bi),
        in_specs=[
            pl.BlockSpec((B, bi), lambda j, i: (i * 0, i)),   # p tile
            pl.BlockSpec((bi, D), lambda j, i: (i, i * 0)),   # Xi hi
            pl.BlockSpec((bi, D), lambda j, i: (i, i * 0)),   # Xi lo
            pl.BlockSpec((bj, D), lambda j, i: (j, j * 0)),   # Xj hi
            pl.BlockSpec((bj, D), lambda j, i: (j, j * 0)),   # Xj lo
        ],
        out_specs=pl.BlockSpec((B, bj), lambda j, i: (j * 0, j)),
        scratch_shapes=[
            pltpu.VMEM((B, bj), jnp.float32),
            pltpu.VMEM((B, bj), jnp.float32),
        ],
        interpret=spec.interpret,
    )(pf, hi, lo, hi, lo)
    # variance is a pure prefactor of both families: apply outside, in fp64.
    return var * out[:, :n].astype(p.dtype)


def _ls_grad_impl(spec: _Spec, X, var, ls, p, g):
    hi, lo, n_pad = _prepare(spec, X, ls)
    bi, bj = spec.block_i, spec.block_j
    D = hi.shape[1]
    pf = _pad_cols(p.astype(jnp.float32), n_pad)
    gf = _pad_cols(g.astype(jnp.float32), n_pad)

    acc = pl.pallas_call(
        functools.partial(_ls_grad_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        grid=(n_pad // bj, n_pad // bi),
        in_specs=[
            pl.BlockSpec((1, bi), lambda j, i: (i * 0, i)),   # p tile
            pl.BlockSpec((1, bj), lambda j, i: (j * 0, j)),   # g tile
            pl.BlockSpec((bi, D), lambda j, i: (i, i * 0)),
            pl.BlockSpec((bi, D), lambda j, i: (i, i * 0)),
            pl.BlockSpec((bj, D), lambda j, i: (j, j * 0)),
            pl.BlockSpec((bj, D), lambda j, i: (j, j * 0)),
        ],
        out_specs=pl.BlockSpec((1, D), lambda j, i: (j * 0, i * 0)),
        interpret=spec.interpret,
    )(pf, gf, hi, lo, hi, lo)
    # d(d2)/d(ls_d) = -(2/ls_d)(xs_id - xs_jd)^2 ; kernel accumulated
    # sum_ij m (xs_i - xs_j)^2 with unit-variance rho' => scale by var here.
    return acc[0].astype(ls.dtype) * (-2.0 * var / ls)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _streaming_matvec(spec: _Spec, X, var, ls, p):
    return _matvec_impl(spec, X, var, ls, p)


def _streaming_fwd(spec, X, var, ls, p):
    out = _matvec_impl(spec, X, var, ls, p)
    return out, (X, var, ls, p, out)


def _streaming_bwd(spec, res, gout):
    X, var, ls, p, out = res
    dX = jnp.zeros_like(X)  # training inputs are constants
    dvar = jnp.sum(out * gout) / var
    dp = _matvec_impl(spec, X, var, ls, gout)  # K symmetric
    if p.shape[0] == 1:
        dls = _ls_grad_impl(spec, X, var, ls, p, gout)
    else:
        dls = sum(
            _ls_grad_impl(spec, X, var, ls, p[b : b + 1], gout[b : b + 1])
            for b in range(p.shape[0])
        )
    return dX, dvar, dls, dp


_streaming_matvec.defvjp(_streaming_fwd, _streaming_bwd)


def kernel_matvec(kernel, X, p, block_i: int = 512, block_j: int = 512,
                  interpret: bool = None) -> jnp.ndarray:
    """p [B, N] -> p @ K(X, X) [B, N], K streamed tile-by-tile (never in HBM).

    Differentiable w.r.t. kernel parameters and p (custom_vjp)."""
    if isinstance(kernel, _k.SquaredExponential):
        family = "rbf"
    elif isinstance(kernel, _k.Matern32):
        family = "mat32"
    else:
        raise NotImplementedError(type(kernel))
    if interpret is None:
        interpret = not _on_tpu()
    spec = _Spec(family=family, block_i=block_i, block_j=block_j,
                 interpret=interpret)
    return _streaming_matvec(
        spec, X, kernel.variance.value, kernel.lengthscales.value, p
    )


def make_streaming_operator(kernel, X, sigma_sq, block_i: int = 512,
                            block_j: int = 512, interpret: bool = None):
    """Matvec closure for (K + sigma^2 I): streaming K + exact fp64 diagonal."""

    def matvec(p):
        return kernel_matvec(kernel, X, p, block_i, block_j, interpret) + (
            sigma_sq * p
        )

    return matvec
