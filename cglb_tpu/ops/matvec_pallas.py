"""Streaming kernel matvec: fused distance -> kernel -> contract Pallas tiles.

The KeOps replacement (reference consumes lazy ``kernel(x).add_diag(s2)``
operators in the CG loop at cglb/backend/pytorch/models.py:251-252 and
conjugate_gradient.py:57-66; KeOps JIT-generates CUDA that streams K tile by
tile).  Here the same streaming computation is a Pallas TPU kernel:

    out[b, j] = sum_i p[b, i] * k(x_i, x_j)        (K never materialized in HBM)

Precision strategy (the fp64-on-TPU problem, SURVEY.md section 7 "hard parts"):
fp64 matmuls on TPU lower to slow emulation, so the cancellation-prone cross
term of the squared distance runs as a **lane-packed bf16 multi-split matmul**:
each lengthscale-scaled coordinate is split into four bf16 components
(x ~= b1+b2+b3+b4, ~32 mantissa bits); bf16 x bf16 products are *exact* in the
MXU's f32 accumulator, so packing the 8 significant split-pairs side by side in
the 128-lane contraction dimension computes the compensated cross term in ONE
single-pass MXU matmul (two for D > 16).  Squared norms are precomputed in fp64
and carried as f32 hi+lo pairs.  Net accuracy ~1e-6 relative vs the dense fp64
oracle — far below the CG stopping thresholds used in training (max_error=1.0)
and prediction (1e-3); the dense fp64 XLA path stays available where bitwise
fp64 matters.

Accumulation across i-tiles is Kahan-compensated in VMEM scratch (f32 products,
~f48 effective).

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

# split-pair schedule: indices into the 4-way bf16 split (0-based), ordered by
# magnitude; sum of b[a] @ b[b].T over pairs reconstructs x.x to ~2^-40.
_PAIRS = [(0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (2, 0), (0, 3), (3, 0)]


class _Spec(NamedTuple):
    """Static kernel/tiling description (hashable; nondiff custom_vjp arg)."""

    family: str  # "rbf" | "mat32"
    block_i: int
    block_j: int
    interpret: bool
    n_packs: int  # how many packed matmuls the pair schedule was folded into


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _check_blocks(block_i: int, block_j: int, interpret: bool) -> None:
    """TPU lowering requires last-dim block sizes divisible by the 128-lane
    width (the matvec kernel tiles p/out on their last dims with block_i /
    block_j); interpret mode (CPU meshes, tests) has no such constraint."""
    if not interpret and (block_i % 128 or block_j % 128):
        raise ValueError(
            f"block sizes ({block_i}, {block_j}) are not TPU-lowerable: "
            "both must be multiples of 128 (or pass interpret=True)"
        )


def split_hi_lo(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Double-float split: x ~= hi + lo with hi, lo float32."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def _bf16_split4(x):
    """x (f64/f32) ~= b0 + b1 + b2 + b3 with each b_k bf16 (~8 mantissa bits
    per level, ~32 total)."""
    parts = []
    r = x
    for _ in range(4):
        b = r.astype(jnp.bfloat16)
        parts.append(b)
        r = r - b.astype(x.dtype)
    return parts


def _pack_lr(Xs):
    """Build the packed left/right bf16 matrices whose single(-or-double)-pass
    product reconstructs Xs @ Xs.T to ~2^-40 relative.

    Returns (left [N, P], right [N, P], n_packs) with P = packs * 128-friendly
    width; callers contract left_i @ right_j.T (optionally in n_packs chunks of
    equal width — kept as one concatenated array with even chunk widths)."""
    b = _bf16_split4(Xs)
    D = Xs.shape[1]
    per = 128 // D  # pairs per 128-lane matmul
    if per >= len(_PAIRS):
        groups = [_PAIRS]
    else:
        per = max(per, 1)
        groups = [
            _PAIRS[k : k + per] for k in range(0, len(_PAIRS), per)
        ]
    lefts, rights = [], []
    width = max(len(g) for g in groups) * D
    for g in groups:
        l = jnp.concatenate([b[a] for a, _ in g], axis=1)
        r = jnp.concatenate([b[c] for _, c in g], axis=1)
        # pad every group to the same width so one array holds all packs
        if l.shape[1] < width:
            l = jnp.pad(l, ((0, 0), (0, width - l.shape[1])))
            r = jnp.pad(r, ((0, 0), (0, width - r.shape[1])))
        lefts.append(l)
        rights.append(r)
    return (
        jnp.concatenate(lefts, axis=1),
        jnp.concatenate(rights, axis=1),
        len(groups),
    )


def _tile_cross(left_i, right_j, n_packs):
    """Compensated Xs_i @ Xs_j.T from packed bf16 blocks (f32 out)."""
    f32 = jnp.float32
    w = left_i.shape[1] // n_packs
    acc = None
    for g in range(n_packs):
        li = left_i[:, g * w : (g + 1) * w]
        rj = right_j[:, g * w : (g + 1) * w]
        c = jnp.dot(li, rj.T, preferred_element_type=f32)
        acc = c if acc is None else acc + c
    return acc


def _tile_d2(spec, left_i, right_j, nhi_i, nlo_i, nhi_j, nlo_j):
    cross = _tile_cross(left_i, right_j, spec.n_packs)
    ni = nhi_i[:, 0] + nlo_i[:, 0]
    nj = nhi_j[:, 0] + nlo_j[:, 0]
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


def _matvec_kernel(spec: _Spec, p_ref, li_ref, nhi_i_ref, nlo_i_ref,
                   rj_ref, nhi_j_ref, nlo_j_ref, out_ref, acc_ref, comp_ref):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    d2 = _tile_d2(spec, li_ref[:], rj_ref[:], nhi_i_ref[:], nlo_i_ref[:],
                  nhi_j_ref[:], nlo_j_ref[:])
    kt = _tile_rho(spec, d2)
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


def _ls_grad_kernel(spec: _Spec, p_ref, g_ref, li_ref, nhi_i_ref, nlo_i_ref,
                    xi_ref, rj_ref, nhi_j_ref, nlo_j_ref, xj_ref, out_ref):
    j = pl.program_id(0)
    i = pl.program_id(1)
    d2 = _tile_d2(spec, li_ref[:], rj_ref[:], nhi_i_ref[:], nlo_i_ref[:],
                  nhi_j_ref[:], nlo_j_ref[:])
    kp = _tile_drho_dd2(spec, d2)  # [bi, bj]
    # m_ij = (sum_b p_bi g_bj) rho'_ij — the rank-B outer product runs as one
    # [bi, B] @ [B, bj] MXU matmul, so multi-RHS (multi-output) gradients cost
    # one kernel pass instead of B
    m = jnp.dot(p_ref[:].T, g_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST) * kp
    xi = xi_ref[:]  # f32 scaled coords suffice for gradient accuracy
    xj = xj_ref[:]
    # sum_ij m_ij (xs_id - xs_jd)^2
    #   = rowsum(m) . xi^2 + colsum(m) . xj^2 - 2 sum_i xi_d (m @ xj)_id
    hi_p = jax.lax.Precision.HIGHEST
    t1 = jnp.dot(jnp.sum(m, axis=1)[None, :], xi * xi,
                 preferred_element_type=jnp.float32, precision=hi_p)
    t2 = jnp.dot(jnp.sum(m, axis=0)[None, :], xj * xj,
                 preferred_element_type=jnp.float32, precision=hi_p)
    u = jnp.dot(m, xj, preferred_element_type=jnp.float32, precision=hi_p)
    t3 = jnp.sum(xi * u, axis=0)[None, :]  # [1, D]
    partial = t1 + t2 - 2.0 * t3

    first = jnp.logical_and(j == 0, i == 0)

    @pl.when(first)
    def _():
        out_ref[:] = partial

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] += partial


def _pad_rows(a, n_pad):
    return a if a.shape[0] == n_pad else jnp.pad(a, ((0, n_pad - a.shape[0]), (0, 0)))


def _pad_cols(a, n_pad):
    return a if a.shape[1] == n_pad else jnp.pad(a, ((0, 0), (0, n_pad - a.shape[1])))


class _Prepared(NamedTuple):
    """Packed device tensors consumed by the tile kernels.  Array-only pytree
    so it can cross a custom_vjp boundary (cotangents are zeroed: the analytic
    dls already accounts for the lengthscale dependence baked into these)."""

    left: jnp.ndarray    # [N_pad, P] bf16 packed splits
    right: jnp.ndarray   # [N_pad, P] bf16 packed splits
    nhi: jnp.ndarray     # [N_pad, 1] f32 squared-norm hi
    nlo: jnp.ndarray     # [N_pad, 1] f32 squared-norm lo
    xhi: jnp.ndarray     # [N_pad, D] f32 scaled coords (for the ls gradient)


def _prepare(block_i, block_j, X, ls):
    """Lengthscale-scale in fp64, bf16-split pack, fp64 norms as f32 hi/lo,
    pad rows to tile multiples.  EXPENSIVE relative to one tile pass (fp64
    elementwise is emulated on TPU) — callers hoist it out of the CG loop via
    make_streaming_operator, which runs it once per objective evaluation.

    Returns (_Prepared, n_packs)."""
    bmax = max(block_i, block_j)
    n_pad = int(np.ceil(X.shape[0] / bmax) * bmax)
    Xs = X / ls
    left, right, n_packs = _pack_lr(Xs)
    norms = jnp.sum(Xs * Xs, axis=1, keepdims=True)
    nhi, nlo = split_hi_lo(norms)
    xhi = Xs.astype(jnp.float32)
    return _Prepared(
        left=_pad_rows(left, n_pad),
        right=_pad_rows(right, n_pad),
        nhi=_pad_rows(nhi, n_pad),
        nlo=_pad_rows(nlo, n_pad),
        xhi=_pad_rows(xhi, n_pad),
    ), n_packs


def _matvec_from_prep(spec: _Spec, rows: _Prepared, cols: _Prepared, p):
    """Unit-variance streaming matvec from prepacked tensors:
    p [B, Ni] -> p @ rho(Xi, Xj) [B, Nj].  Rectangular: the row space (summed
    over, where p lives) and the column space (output) may be different point
    sets — the sharded large-N path slices the column space per device."""
    ni_pad = rows.left.shape[0]
    nj_pad = cols.left.shape[0]
    B = p.shape[0]
    bi, bj = spec.block_i, spec.block_j
    P = rows.left.shape[1]
    pf = _pad_cols(p.astype(jnp.float32), ni_pad)

    out = pl.pallas_call(
        functools.partial(_matvec_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((B, nj_pad), jnp.float32),
        grid=(nj_pad // bj, ni_pad // bi),
        in_specs=[
            pl.BlockSpec((B, bi), lambda j, i: (i * 0, i)),   # p tile
            pl.BlockSpec((bi, P), lambda j, i: (i, i * 0)),   # left_i
            pl.BlockSpec((bi, 1), lambda j, i: (i, i * 0)),   # nhi_i
            pl.BlockSpec((bi, 1), lambda j, i: (i, i * 0)),   # nlo_i
            pl.BlockSpec((bj, P), lambda j, i: (j, j * 0)),   # right_j
            pl.BlockSpec((bj, 1), lambda j, i: (j, j * 0)),   # nhi_j
            pl.BlockSpec((bj, 1), lambda j, i: (j, j * 0)),   # nlo_j
        ],
        out_specs=pl.BlockSpec((B, bj), lambda j, i: (j * 0, j)),
        scratch_shapes=[
            pltpu.VMEM((B, bj), jnp.float32),
            pltpu.VMEM((B, bj), jnp.float32),
        ],
        interpret=spec.interpret,
    )(pf, rows.left, rows.nhi, rows.nlo, cols.right, cols.nhi, cols.nlo)
    return out


def _ls_grad_from_prep(spec: _Spec, rows: _Prepared, cols: _Prepared, var,
                       ls, p, g):
    ni_pad = rows.left.shape[0]
    nj_pad = cols.left.shape[0]
    bi, bj = spec.block_i, spec.block_j
    P = rows.left.shape[1]
    D = rows.xhi.shape[1]
    B = p.shape[0]
    pf = _pad_cols(p.astype(jnp.float32), ni_pad)
    gf = _pad_cols(g.astype(jnp.float32), nj_pad)

    acc = pl.pallas_call(
        functools.partial(_ls_grad_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        grid=(nj_pad // bj, ni_pad // bi),
        in_specs=[
            pl.BlockSpec((B, bi), lambda j, i: (i * 0, i)),   # p tile
            pl.BlockSpec((B, bj), lambda j, i: (j * 0, j)),   # g tile
            pl.BlockSpec((bi, P), lambda j, i: (i, i * 0)),   # left_i
            pl.BlockSpec((bi, 1), lambda j, i: (i, i * 0)),
            pl.BlockSpec((bi, 1), lambda j, i: (i, i * 0)),
            pl.BlockSpec((bi, D), lambda j, i: (i, i * 0)),   # xi
            pl.BlockSpec((bj, P), lambda j, i: (j, j * 0)),   # right_j
            pl.BlockSpec((bj, 1), lambda j, i: (j, j * 0)),
            pl.BlockSpec((bj, 1), lambda j, i: (j, j * 0)),
            pl.BlockSpec((bj, D), lambda j, i: (j, j * 0)),   # xj
        ],
        out_specs=pl.BlockSpec((1, D), lambda j, i: (j * 0, i * 0)),
        interpret=spec.interpret,
    )(pf, gf, rows.left, rows.nhi, rows.nlo, rows.xhi, cols.right, cols.nhi,
      cols.nlo, cols.xhi)
    # d(d2)/d(ls_d) = -(2/ls_d)(xs_id - xs_jd)^2 ; kernel accumulated
    # sum_ij m (xs_i - xs_j)^2 with unit-variance rho' => scale by var here.
    return acc[0].astype(ls.dtype) * (-2.0 * var / ls)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _streaming_matvec(spec: _Spec, n_out: int, rows: _Prepared,
                      cols: _Prepared, var, ls, p):
    """Differentiable streaming matvec p [B, Ni] -> p @ K(Xi, Xj) [B, n_out].

    The preps carry the lengthscale dependence; their cotangents are zeroed
    and the true d/dls is supplied analytically by the weighted-gradient
    kernel, so gradients are correct as long as rows/cols == _prepare(X, ls)
    (enforced by the public wrappers)."""
    out = _matvec_from_prep(spec, rows, cols, p)
    return var * out[:, :n_out].astype(p.dtype)


def _streaming_fwd(spec, n_out, rows, cols, var, ls, p):
    out = _streaming_matvec(spec, n_out, rows, cols, var, ls, p)
    return out, (rows, cols, var, ls, p, out)


def _streaming_bwd(spec, n_out, res, gout):
    rows, cols, var, ls, p, out = res
    drows = jax.tree_util.tree_map(jnp.zeros_like, rows)
    dcols = jax.tree_util.tree_map(jnp.zeros_like, cols)
    dvar = jnp.sum(out * gout) / var
    # dp = g K^T: swap row/column spaces
    n_in = p.shape[1]
    dp = var * _matvec_from_prep(spec, cols, rows, gout)[:, :n_in].astype(
        p.dtype
    )
    # the ls-grad kernel reduces the rank-B outer product internally (one
    # [bi, B] @ [B, bj] MXU matmul per tile) — one pass for any batch size
    dls = _ls_grad_from_prep(spec, rows, cols, var, ls, p, gout)
    return drows, dcols, dvar, dls, dp


_streaming_matvec.defvjp(_streaming_fwd, _streaming_bwd)


def _family_of(kernel) -> str:
    if isinstance(kernel, _k.SquaredExponential):
        return "rbf"
    if isinstance(kernel, _k.Matern32):
        return "mat32"
    raise NotImplementedError(type(kernel))


def kernel_matvec(kernel, X, p, block_i: int = 512, block_j: int = 512,
                  interpret: bool = None) -> jnp.ndarray:
    """p [B, N] -> p @ K(X, X) [B, N], K streamed tile-by-tile (never in HBM).

    Convenience wrapper that packs X per call; hot loops should use
    make_streaming_operator (prep hoisted out of the CG iterations).
    Differentiable w.r.t. kernel parameters and p (custom_vjp)."""
    if interpret is None:
        interpret = not _on_tpu()
    _check_blocks(block_i, block_j, interpret)
    var = kernel.variance.value
    ls = kernel.lengthscales.value
    spec = _Spec(family=_family_of(kernel), block_i=block_i, block_j=block_j,
                 interpret=interpret, n_packs=1)
    prep, n_packs = _prepare(block_i, block_j, X, ls)
    spec = spec._replace(n_packs=n_packs)
    return _streaming_matvec(spec, X.shape[0], prep, prep, var, ls, p)


def kernel_cross_matvec(kernel, X_rows, X_cols, p, block_i: int = 512,
                        block_j: int = 512, interpret: bool = None
                        ) -> jnp.ndarray:
    """Rectangular streaming contraction: p [B, Nr] -> p @ K(X_rows, X_cols)
    [B, Nc], K streamed tile-by-tile.

    Covers the prediction cross-covariance products (e.g. the CGLB posterior
    mean correction K(s,f) v — reference tensorflow/models.py:222) without
    materializing the [S, N] kernel matrix."""
    if interpret is None:
        interpret = not _on_tpu()
    _check_blocks(block_i, block_j, interpret)
    var = kernel.variance.value
    ls = kernel.lengthscales.value
    spec = _Spec(family=_family_of(kernel), block_i=block_i, block_j=block_j,
                 interpret=interpret, n_packs=1)
    rows, n_packs = _prepare(block_i, block_j, X_rows, ls)
    cols, n_packs2 = _prepare(block_i, block_j, X_cols, ls)
    assert n_packs == n_packs2
    spec = spec._replace(n_packs=n_packs)
    return _streaming_matvec(spec, X_cols.shape[0], rows, cols, var, ls, p)


def make_streaming_operator(kernel, X, sigma_sq, block_i: int = 512,
                            block_j: int = 512, interpret: bool = None):
    """Matvec closure for (K + sigma^2 I): streaming K + exact fp64 diagonal.

    The bf16 packing / norm precomputation runs ONCE here (outside the CG
    while_loop — fp64 elementwise prep is emulated and would otherwise
    dominate each iteration)."""
    if interpret is None:
        interpret = not _on_tpu()
    _check_blocks(block_i, block_j, interpret)
    var = kernel.variance.value
    ls = kernel.lengthscales.value
    spec = _Spec(family=_family_of(kernel), block_i=block_i, block_j=block_j,
                 interpret=interpret, n_packs=1)
    prep, n_packs = _prepare(block_i, block_j, X, ls)
    spec = spec._replace(n_packs=n_packs)
    n = X.shape[0]

    def matvec(p):
        return _streaming_matvec(spec, n, prep, prep, var, ls, p) + (
            sigma_sq * p
        )

    return matvec
