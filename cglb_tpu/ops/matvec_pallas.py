"""Streaming kernel matvec: fused distance -> kernel -> contract Pallas tiles.

The KeOps replacement (reference consumes lazy ``kernel(x).add_diag(s2)``
operators in the CG loop at cglb/backend/pytorch/models.py:251-252 and
conjugate_gradient.py:57-66; KeOps JIT-generates CUDA that streams K tile by
tile).  Here the same streaming computation is a Pallas TPU kernel:

    out[b, j] = sum_i p[b, i] * k(x_i, x_j)        (K never materialized in HBM)

Precision strategy (the fp64-on-TPU problem, SURVEY.md section 7 "hard parts"):
fp64 matmuls on TPU lower to slow emulation, so the squared distance is
computed by ONE lane-packed bf16 matmul on the MXU ("MXU-d2"): each
lengthscale-scaled coordinate is split into four bf16 components
(x ~= b0+b1+b2+b3, ~32 mantissa bits); bf16 x bf16 products are *exact* in the
MXU's f32 accumulator, so the 8 significant split-pairs of the cross term AND
the squared norms (themselves bf16-4-split, paired with ones-columns) ride
side by side in the contraction dimension — the matmul result IS gamma * d2
directly, with the family constant folded into the packing scale
(gamma = 3 for Matern32 so sqrt gives sqrt(3) r; gamma = 1/2 for RBF so exp
takes the result unmodified).  Moving the norm/broadcast adds from the VPU
into the (otherwise idle) MXU is worth ~8% of the kernel; measured accuracy
~2.2e-6 max relative vs the dense fp64 oracle — far below the CG stopping
thresholds used in training (max_error=1.0) and prediction (1e-3); the dense
fp64 XLA path stays available where bitwise fp64 matters.

Contraction tiers (the VPU/MXU trade measured in PERF.md round 3): the
p @ rho(d2) contraction dominates the remaining non-profile cost because an
f32 matmul at Precision.HIGHEST lowers to 6 bf16 MXU passes (~3 ms of a
~12 ms matvec at N=40k).  Two tiers share one packed prep:

- "highest": full f32-grade contraction — the default; used for the bound
  assembly, prediction, and gradients.
- "default": single-pass bf16 contraction (~1e-3 relative operator error) —
  the TRAINING CG-loop tier (make_streaming_operator_pair).  Sound because
  the CGLB bound is valid for ANY v: CG merely proposes v, and the
  differentiable assembly re-evaluates r = err - (K + s2 I) v with the
  accurate tier, so an inexact-operator v only (slightly) loosens the
  reported error bound, never invalidates it.  Same role as KeOps' use of
  fast CUDA kernels inside CG while the bound terms are assembled exactly.

Accumulation across i-tiles is Kahan-compensated in VMEM scratch (f32
products, ~f48 effective; measured free).

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

__all__ = ["kernel_matvec", "kernel_cross_matvec", "make_streaming_operator",
           "make_streaming_operator_pair", "split_hi_lo"]

# split-pair schedule: indices into the 4-way bf16 split (0-based), ordered by
# magnitude; sum of b[a] @ b[b].T over pairs reconstructs x.x to ~2^-40.
# MUST stay symmetric under (a, c) -> (c, a) so K stays symmetric.
_PAIRS = [(0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (2, 0), (0, 3), (3, 0)]

# family constant folded into the packed coordinates: the d2 matmul emits
# gamma * d2 so the kernel profile needs no per-entry rescale.
_GAMMA = {"rbf": 0.5, "mat32": 3.0}


class _Spec(NamedTuple):
    """Static kernel/tiling description (hashable; nondiff custom_vjp arg)."""

    family: str     # "rbf" | "mat32"
    block_i: int
    block_j: int
    interpret: bool
    contract: str   # "highest" | "default" (see module docstring)


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


def _contract_precision(spec: _Spec):
    # interpret mode (CPU) runs f32 matmuls at full precision either way;
    # HIGHEST keeps the oracle tests meaningful there.
    if spec.contract == "default" and not spec.interpret:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def _tile_t(dl_i, dr_j):
    """gamma * d2 tile from the packed operands: ONE bf16 MXU matmul (exact
    products, f32 accumulation), clamped at 0 against rounding."""
    dot = jnp.dot(dl_i, dr_j.T, preferred_element_type=jnp.float32)
    return jnp.maximum(dot, 0.0)


def _tile_sqrt(t):
    """sqrt(t) as t * rsqrt(t) — measured 15% faster per matvec than the
    VPU sqrt lowering at IDENTICAL operator error (the bf16 contraction
    tier dominates the error budget, not the last-ulp of sqrt).  The clamp
    keeps t=0 from producing 0 * inf."""
    return t * jax.lax.rsqrt(jnp.maximum(t, 1e-30))


def _tile_rho(spec: _Spec, t):
    """Unit-variance kernel tile rho from t = gamma * d2."""
    if spec.family == "rbf":
        return jnp.exp(-t)          # t = d2 / 2
    s = _tile_sqrt(t)               # t = 3 d2  =>  s = sqrt(3) r
    return (1.0 + s) * jnp.exp(-s)


def _tile_drho_dd2(spec: _Spec, t):
    """d(rho)/d(d2) tile from t = gamma * d2."""
    if spec.family == "rbf":
        return -0.5 * jnp.exp(-t)
    return -1.5 * jnp.exp(-_tile_sqrt(t))


def _matvec_kernel(spec: _Spec, p_ref, dl_ref, dr_ref, out_ref, acc_ref,
                   comp_ref):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    kt = _tile_rho(spec, _tile_t(dl_ref[:], dr_ref[:]))
    contrib = jnp.dot(p_ref[:], kt, preferred_element_type=jnp.float32,
                      precision=_contract_precision(spec))

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


def _ls_grad_kernel(spec: _Spec, p_ref, g_ref, dl_ref, xi_ref, dr_ref,
                    xj_ref, out_ref):
    j = pl.program_id(0)
    i = pl.program_id(1)
    kp = _tile_drho_dd2(spec, _tile_t(dl_ref[:], dr_ref[:]))  # [bi, bj]
    # m_ij = (sum_b p_bi g_bj) rho'_ij — the rank-B outer product runs as one
    # [bi, B] @ [B, bj] MXU matmul, so multi-RHS (multi-output) gradients cost
    # one kernel pass instead of B
    hi_p = jax.lax.Precision.HIGHEST
    m = jnp.dot(p_ref[:].T, g_ref[:], preferred_element_type=jnp.float32,
                precision=hi_p) * kp
    xi = xi_ref[:]  # f32 scaled coords suffice for gradient accuracy
    xj = xj_ref[:]
    # sum_ij m_ij (xs_id - xs_jd)^2
    #   = rowsum(m) . xi^2 + colsum(m) . xj^2 - 2 sum_i xi_d (m @ xj)_id
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
    dls already accounts for the lengthscale dependence baked into these).

    dleft/dright: [N_pad, P] bf16 — dleft_i . dright_j = gamma * d2(x_i, x_j)
    (cross-term splits with -2 folded into dleft, plus 4-way bf16 splits of
    the gamma-scaled squared norms paired with ones-columns).  A point set
    carries BOTH sides so transposed contractions (the dp cotangent) just
    swap the row/column roles.
    xhi: [N_pad, D] f32 lengthscale-scaled coords (for the ls gradient)."""

    dleft: jnp.ndarray
    dright: jnp.ndarray
    xhi: jnp.ndarray


def _prepare(block_i, block_j, X, ls, family):
    """Lengthscale- and gamma-scale in fp64, bf16-split pack of coords AND
    norms, pad rows to tile multiples.  EXPENSIVE relative to one tile pass
    (fp64 elementwise is emulated on TPU) — callers hoist it out of the CG
    loop via make_streaming_operator, which runs it once per objective
    evaluation."""
    bmax = max(block_i, block_j)
    n_pad = int(np.ceil(X.shape[0] / bmax) * bmax)
    Xs = X / ls
    Xg = Xs * math.sqrt(_GAMMA[family])
    b = _bf16_split4(Xg)
    norms = jnp.sum(Xg * Xg, axis=1, keepdims=True)  # fp64, = gamma |xs|^2
    nb = _bf16_split4(norms)
    ones = jnp.ones_like(nb[0])
    bf16 = jnp.bfloat16
    # -2 folded into the left cross splits (exact in bf16: exponent shift)
    dleft = jnp.concatenate(
        [(-2.0 * b[a]).astype(bf16) for a, _ in _PAIRS] + nb + [ones] * 4,
        axis=1,
    )
    dright = jnp.concatenate(
        [b[c] for _, c in _PAIRS] + [ones] * 4 + nb, axis=1
    )
    return _Prepared(
        dleft=_pad_rows(dleft, n_pad),
        dright=_pad_rows(dright, n_pad),
        xhi=_pad_rows(Xs.astype(jnp.float32), n_pad),
    )


def _matvec_from_prep(spec: _Spec, rows: _Prepared, cols: _Prepared, p):
    """Unit-variance streaming matvec from prepacked tensors:
    p [B, Ni] -> p @ rho(Xi, Xj) [B, Nj].  Rectangular: the row space (summed
    over, where p lives) and the column space (output) may be different point
    sets — the sharded large-N path slices the column space per device."""
    ni_pad = rows.dleft.shape[0]
    nj_pad = cols.dright.shape[0]
    B = p.shape[0]
    bi, bj = spec.block_i, spec.block_j
    P = rows.dleft.shape[1]
    pf = _pad_cols(p.astype(jnp.float32), ni_pad)

    out = pl.pallas_call(
        functools.partial(_matvec_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((B, nj_pad), jnp.float32),
        grid=(nj_pad // bj, ni_pad // bi),
        in_specs=[
            pl.BlockSpec((B, bi), lambda j, i: (i * 0, i)),   # p tile
            pl.BlockSpec((bi, P), lambda j, i: (i, i * 0)),   # dleft_i
            pl.BlockSpec((bj, P), lambda j, i: (j, j * 0)),   # dright_j
        ],
        out_specs=pl.BlockSpec((B, bj), lambda j, i: (j * 0, j)),
        scratch_shapes=[
            pltpu.VMEM((B, bj), jnp.float32),
            pltpu.VMEM((B, bj), jnp.float32),
        ],
        interpret=spec.interpret,
    )(pf, rows.dleft, cols.dright)
    return out


def _ls_grad_from_prep(spec: _Spec, rows: _Prepared, cols: _Prepared, var,
                       ls, p, g):
    ni_pad = rows.dleft.shape[0]
    nj_pad = cols.dright.shape[0]
    bi, bj = spec.block_i, spec.block_j
    P = rows.dleft.shape[1]
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
            pl.BlockSpec((bi, P), lambda j, i: (i, i * 0)),   # dleft_i
            pl.BlockSpec((bi, D), lambda j, i: (i, i * 0)),   # xi
            pl.BlockSpec((bj, P), lambda j, i: (j, j * 0)),   # dright_j
            pl.BlockSpec((bj, D), lambda j, i: (j, j * 0)),   # xj
        ],
        out_specs=pl.BlockSpec((1, D), lambda j, i: (j * 0, i * 0)),
        interpret=spec.interpret,
    )(pf, gf, rows.dleft, rows.xhi, cols.dright, cols.xhi)
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
    family = _family_of(kernel)
    spec = _Spec(family=family, block_i=block_i, block_j=block_j,
                 interpret=interpret, contract="highest")
    prep = _prepare(block_i, block_j, X, ls, family)
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
    family = _family_of(kernel)
    spec = _Spec(family=family, block_i=block_i, block_j=block_j,
                 interpret=interpret, contract="highest")
    rows = _prepare(block_i, block_j, X_rows, ls, family)
    cols = _prepare(block_i, block_j, X_cols, ls, family)
    return _streaming_matvec(spec, X_cols.shape[0], rows, cols, var, ls, p)


def make_streaming_operator(kernel, X, sigma_sq, block_i: int = 512,
                            block_j: int = 512, interpret: bool = None):
    """Matvec closure for (K + sigma^2 I): streaming K + exact fp64 diagonal.

    The bf16 packing / norm precomputation runs ONCE here (outside the CG
    while_loop — fp64 elementwise prep is emulated and would otherwise
    dominate each iteration)."""
    return make_streaming_operator_pair(kernel, X, sigma_sq, block_i,
                                        block_j, interpret)[0]


def make_streaming_operator_pair(kernel, X, sigma_sq, block_i: int = 512,
                                 block_j: int = 512, interpret: bool = None):
    """(accurate_matvec, cg_matvec) closures for (K + sigma^2 I), sharing one
    packed prep.

    accurate_matvec contracts at f32-grade (Precision.HIGHEST, ~2e-6 kernel
    accuracy) — for bound assembly, prediction, and gradients.  cg_matvec
    contracts in a single bf16 MXU pass (~1e-3 operator error, ~25% faster
    per CG iteration) — for the TRAINING CG loop only, where any proposed v
    yields a valid bound because the assembly re-evaluates the residual with
    accurate_matvec (see module docstring)."""
    if interpret is None:
        interpret = not _on_tpu()
    _check_blocks(block_i, block_j, interpret)
    var = kernel.variance.value
    ls = kernel.lengthscales.value
    family = _family_of(kernel)
    spec_acc = _Spec(family=family, block_i=block_i, block_j=block_j,
                     interpret=interpret, contract="highest")
    spec_cg = spec_acc._replace(contract="default")
    prep = _prepare(block_i, block_j, X, ls, family)
    n = X.shape[0]

    def make(spec):
        def matvec(p):
            return _streaming_matvec(spec, n, prep, prep, var, ls, p) + (
                sigma_sq * p
            )

        return matvec

    return make(spec_acc), make(spec_cg)
