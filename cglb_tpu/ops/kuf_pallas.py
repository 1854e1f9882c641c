"""Fused Kuf builder: Pallas df32 direct-difference d2 + XLA df32 profile.

Why (measured on v5e at the kin40k shape [M=2048, N=40960], scripts/
bench_kuf.py): the mixed common-terms path built Kuf as "exact fp64 d2
assembly in XLA, then the df32 profile" (models/sgpr._kuf_block_df32).  The
fp64 norm-expansion d2 (zn + xn - 2 Z@X^T, all emulated fp64) costs ~152 ms
of the 156 ms forward — every emulated-fp64 elementwise/matmul fixup is
another full HBM pass over the 672 MB [M, N] output, ~7 passes total — while
the df32 profile fused behind it is nearly free.  Here the squared distance
is assembled in ONE Pallas pass by DIRECT DIFFERENCES in compensated
two-float f32 arithmetic (ops/df32), written once as an (hi, lo) pair, and
the profile is evaluated by the stock XLA df32 chain, which fuses into a
single cheap elementwise pass over that pair.

Why the split (Pallas d2, XLA profile): Mosaic compile time scales with
(kernel op count) x (vregs per op) — measured 2026-08-19 by on-chip
bisection: a ~200-op df32 chain at [256, 512] tiles never compiled (>4 min),
and the fully-fused kernel (d2 + profile, ~700 ops) timed out at every tile
size down to [64, 256].  The d2 chain is the only part XLA can't do without
either catastrophic cancellation (norm expansion) or an O(N*M*D) broadcast
blowup; the profile is a same-shape elementwise chain XLA fuses for free.
So only the short chain lives in Pallas.

Accuracy: the norm expansion had to run in fp64 because zn + xn >> d2 for
uncentered / small-lengthscale data (catastrophic cancellation — the df32
assembly of THAT form loses ~3.5 digits, models/sgpr._kuf_block_df32 note).
Direct differences have no such cancellation: two_sum makes the hi-part
subtraction exact where it matters (Sterbenz), each squared term carries
~2^-45 relative error, and the D-term compensated accumulation keeps d2 at
df32 grade (~1e-12 relative) for ANY centering.  The profile is the
identical df32 sqrt/exp as the XLA path, so entries match _kuf_block_df32 to
~1e-11 — validated against it and a host-fp64 oracle in
tests/test_kuf_pallas.py.

Gradients (custom_vjp, XLA-only backward): with t = sum_d (zg - xg)^2,
zg = sqrt(gamma) Z / ls (gamma folded as in matvec_pallas), and
dt_ij = g_ij * var * drho/dt, the parameter cotangents are plain MXU
matmul reductions — no backward Pallas kernel at all:

    T = dt @ [xg, xg^2, 1]   ->  dZ  = 2 (zg * R - U) * sqrt(gamma) / ls
                                 dls = -(2/ls) sum_i (zg^2 R - 2 zg U + V)
    dvar = sum g * rho

(U/V/R = columns of T), evaluated at f32 grade — gradients only feed descent
directions, same argument as models/sgpr._gram_outer_bwd.  X is DATA, never a
trainable leaf in this framework, so its cotangent is returned as zeros (the
wrappers are internal to the Kuf builders).

Reference role being replaced: the fp64 Kuf builds consumed by the common
terms at cglb/backend/tensorflow/models.py:58-75 (gpflow Kuf) and
cglb/backend/pytorch/models.py:176-213.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df32 as _df
from . import kernels as _k

__all__ = ["kuf_build", "kuf_build_sharded", "supported"]

_GAMMA = {"rbf": 0.5, "mat32": 3.0}

# default tile sizes: 2 [BM, BN] f32 outputs; BN rides the 128-lane axis.
# BM is kept small because Mosaic compile time scales with the kernel's
# op count x vregs-per-op (see module docstring) and the unrolled-over-D
# compensated chain is ~35 ops/dim.
BLOCK_M = 64
BLOCK_N = 512

# coordinate clamp before the f32 split: keeps the Veltkamp split and the
# squared terms finite (1e16^2 * D << f32max).  Unreachable under the
# framework's positive-lower-bounded lengthscales (|x/ls| <= ~1e8 at the
# 1e-6 fp64 floor on z-scored data) — pure overflow insurance, mirroring
# df32.df_from_f64's clamp.
_COORD_MAX = 1e16


class _Spec(NamedTuple):
    family: str   # "rbf" | "mat32"
    block_m: int
    block_n: int
    input_dim: int   # true D; coords are lane-padded to _DPAD (see below)
    interpret: bool


# Layout rules learned by on-chip bisection (2026-08-19 logs):
#  * Z coords ride [bm, _DPAD] blocks, lane-padded to a full 128-lane
#    register: a column slice `z[:, d][:, None]` + lane broadcast from a
#    [., 128] block compiles in ~2 s, while the identical pattern from a
#    narrow [., D] block HANGS Mosaic (>7 min).
#  * X coords ride PRE-TRANSPOSED [_dsub(D), bn] blocks: the row slice
#    `xt[d, :][None, :]` + sublane broadcast is the natural VPU layout.
#    The earlier `x[:, d][None, :]` form needed an in-kernel column->row
#    relayout (a cross-lane transpose), the other compile-hang trigger.
#  * The df32 chain's temporaries can exceed Mosaic's default 16 MB
#    scoped-VMEM stack; CompilerParams raises the limit (v5e has 128 MB).
_DPAD = 128
_VMEM_LIMIT = 100 * 1024 * 1024


def _dsub(d: int) -> int:
    """X-transpose sublane padding: f32 sublane quantum is 8."""
    return -(-d // 8) * 8


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def supported(kernel, dtype, input_dim: int) -> bool:
    """Whether the fused builder handles this kernel/dtype (TPU, fp64 data,
    known family, unroll-friendly D)."""
    if not _on_tpu():
        return False
    if dtype != jnp.float64:
        return False
    try:
        _family_of(kernel)
    except NotImplementedError:
        return False
    return input_dim <= 32


def _family_of(kernel) -> str:
    if isinstance(kernel, _k.SquaredExponential):
        return "rbf"
    if isinstance(kernel, _k.Matern32):
        return "mat32"
    raise NotImplementedError(type(kernel))


def _tile_d2(spec: _Spec, zh, zl, xth, xtl) -> _df.DF:
    """gamma*d2 tile [bm, bn] from split coords zh/zl [bm, _DPAD] and
    PRE-TRANSPOSED xth/xtl [_dsub(D), bn] (true dims in the first
    spec.input_dim columns / rows), by direct df32 differences (no
    norm-expansion cancellation).

    Each operand is broadcast to the FULL tile before the two_sum chain:
    Mosaic compiles a single mixed-shape [bm,1](+)[1,bn] op instantly, but a
    chain of dependent mixed-shape ops (the compensated-arithmetic pattern)
    sends its layout inference into the weeds — a one-dim two_sum chain on
    implicit broadcasts never finished compiling (>4 min, measured), while
    the same chain on materialized full tiles is seconds.

    Per-dim arithmetic (~35 ops): dh+dl = diff by two_sum (the lo halves
    add in plain f32 — their own rounding is 2^-24 of a 2^-24-scale term);
    the square keeps the two_prod error term UNNORMALIZED (skipping
    quick_two_sum costs 2^-46-relative, far under the 1e-12 budget); the
    accumulation is a compensated add without the second two_sum (error
    2^-45 per op)."""
    tile = (zh.shape[0], xth.shape[1])
    acc_hi = None
    for d in range(spec.input_dim):  # static unroll; D <= 32 via supported()
        a_hi = jnp.broadcast_to(zh[:, d][:, None], tile)
        b_hi = jnp.broadcast_to(xth[d, :][None, :], tile)
        a_lo = jnp.broadcast_to(zl[:, d][:, None], tile)
        b_lo = jnp.broadcast_to(xtl[d, :][None, :], tile)
        s = _df._two_sum(a_hi, -b_hi)
        dh = s.hi
        dl = s.lo + (a_lo - b_lo)
        p = _df._two_prod(dh, dh)
        e = p.lo + 2.0 * (dh * dl)
        if acc_hi is None:
            acc_hi, acc_lo = p.hi, e
        else:
            t = _df._two_sum(acc_hi, p.hi)
            acc = _df._quick_two_sum(t.hi, t.lo + (acc_lo + e))
            acc_hi, acc_lo = acc.hi, acc.lo
    # clamp tiny negative rounding so df_sqrt stays NaN-free; a clamped-hi
    # entry's lo is stale -> zero it with the same mask
    neg = acc_hi < 0.0
    zero = jnp.zeros_like(acc_hi)
    return _df.DF(jnp.where(neg, zero, acc_hi), jnp.where(neg, zero, acc_lo))


def _d2_kernel(spec: _Spec, zh_ref, zl_ref, xh_ref, xl_ref, hi_ref, lo_ref):
    t = _tile_d2(spec, zh_ref[:], zl_ref[:], xh_ref[:], xl_ref[:])
    hi_ref[:] = t.hi
    lo_ref[:] = t.lo


def _pad_rows(a, n_pad):
    if a.shape[0] == n_pad:
        return a
    return jnp.pad(a, ((0, n_pad - a.shape[0]), (0, 0)))


def _pad_lanes(a):
    if a.shape[1] == _DPAD:
        return a
    return jnp.pad(a, ((0, 0), (0, _DPAD - a.shape[1])))


def _scaled_splits(ls, gamma, P):
    """sqrt(gamma)-and-lengthscale-scaled coords, split to (hi, lo) f32.
    O(rows * D) fp64 elementwise — negligible next to the [M, N] tile
    work."""
    Pg = jnp.clip(P * (math.sqrt(gamma) / ls), -_COORD_MAX, _COORD_MAX)
    hi = Pg.astype(jnp.float32)
    lo = (Pg - hi.astype(Pg.dtype)).astype(jnp.float32)
    return hi, lo


def _compiler_params(spec: _Spec):
    if spec.interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _d2_call(spec: _Spec, Z, X, ls, gamma) -> _df.DF:
    """t = gamma * d2(Z/ls, X/ls) as a trimmed [M, N] df32 pair."""
    M, N = Z.shape[0], X.shape[0]
    D = X.shape[1]
    bm, bn = spec.block_m, spec.block_n
    mp = -(-M // bm) * bm
    npad = -(-N // bn) * bn
    zh, zl = _scaled_splits(ls, gamma, Z)
    zh = _pad_rows(_pad_lanes(zh), mp)
    zl = _pad_rows(_pad_lanes(zl), mp)
    xh, xl = _scaled_splits(ls, gamma, X)
    # X rides transposed [_dsub(D), npad] so the kernel's per-dim slice is a
    # row (sublane broadcast) — see the layout-rule comment at _DPAD
    ds = _dsub(D)
    xth = jnp.pad(xh.T, ((0, ds - D), (0, npad - N)))
    xtl = jnp.pad(xl.T, ((0, ds - D), (0, npad - N)))
    shape = jax.ShapeDtypeStruct((mp, npad), jnp.float32)
    hi, lo = pl.pallas_call(
        functools.partial(_d2_kernel, spec),
        out_shape=(shape, shape),
        grid=(mp // bm, npad // bn),
        in_specs=[
            pl.BlockSpec((bm, _DPAD), lambda i, j: (i, j * 0)),
            pl.BlockSpec((bm, _DPAD), lambda i, j: (i, j * 0)),
            pl.BlockSpec((ds, bn), lambda i, j: (i * 0, j)),
            pl.BlockSpec((ds, bn), lambda i, j: (i * 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        ),
        interpret=spec.interpret,
        compiler_params=_compiler_params(spec),
    )(zh, zl, xth, xtl)
    return _df.DF(hi[:M, :N], lo[:M, :N])


def _profile(spec: _Spec, t: _df.DF):
    """(rho, e_hi) from t = gamma*d2 — the stock XLA df32 chain (ops/df32),
    which XLA fuses into one elementwise pass over the (hi, lo) pair.  e_hi
    is the backward residual: exp(-sqrt(t)) for Matern32 (drho/dt = -e/2),
    rho itself for RBF (drho/dt = -rho)."""
    if spec.family == "rbf":
        rho = _df.df_exp(_df.df_neg(t))     # t = d2/2
        return rho, rho.hi
    s = _df.df_sqrt(t)                      # t = 3 d2 => s = sqrt(3) r
    e = _df.df_exp(_df.df_neg(s))
    rho = _df.df_mul(_df.df_add_f(s, np.float32(1.0)), e)
    return rho, e.hi


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _kuf_pallas(spec: _Spec, Z, X, ls, var):
    t = _d2_call(spec, Z, X, ls, _GAMMA[spec.family])
    rho, _e = _profile(spec, t)
    return var * _df.df_to_f64(rho).astype(Z.dtype)


def _kuf_pallas_fwd(spec, Z, X, ls, var):
    t = _d2_call(spec, Z, X, ls, _GAMMA[spec.family])
    rho, e_hi = _profile(spec, t)
    out = var * _df.df_to_f64(rho).astype(Z.dtype)
    return out, (Z, X, ls, var, rho.hi, e_hi)


def _kuf_pallas_bwd(spec, res, g):
    Z, X, ls, var, rho_hi, e_hi = res
    gamma = _GAMMA[spec.family]
    D = Z.shape[1]
    gf = g.astype(jnp.float32)
    # chain factors: true dt = g * var * c * e  (c from drho/dt, _profile)
    c = -1.0 if spec.family == "rbf" else -0.5
    dt = gf * e_hi
    # rhs = [xg, xg^2, 1]; T = dt @ rhs is a plain [M,N]x[N,2D+1] MXU matmul
    xg32 = (X * (math.sqrt(gamma) / ls)).astype(jnp.float32)
    rhs = jnp.concatenate(
        [xg32, xg32 * xg32, jnp.ones_like(xg32[:, :1])], axis=1
    )
    T = jnp.dot(dt, rhs, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    f64 = Z.dtype
    scale = (c * var).astype(f64)
    U = T[:, :D].astype(f64) * scale
    V = T[:, D:2 * D].astype(f64) * scale
    R = T[:, 2 * D].astype(f64) * scale
    zg = Z * (math.sqrt(gamma) / ls)
    dzg = 2.0 * (zg * R[:, None] - U)
    dZ = dzg * (math.sqrt(gamma) / ls)
    dls_per_dim = -(2.0 / ls) * jnp.sum(
        zg * zg * R[:, None] - 2.0 * zg * U + V, axis=0
    )
    dls = jnp.sum(dls_per_dim) if jnp.ndim(ls) == 0 else dls_per_dim
    dvar = jnp.sum(gf * rho_hi).astype(f64)
    # X is data (never a trainable leaf; see module docstring)
    return dZ, jnp.zeros_like(X), dls, dvar


_kuf_pallas.defvjp(_kuf_pallas_fwd, _kuf_pallas_bwd)


def kuf_build(kernel, Z, X, block_m: int = None, block_n: int = None,
              interpret: bool = None) -> jnp.ndarray:
    """Kuf = k(Z, X) [M, N] fp64 via the fused df32 Pallas builder.

    Drop-in for models/sgpr._kuf_block_df32's value (~1e-11 relative match);
    differentiable w.r.t. kernel params and Z (f32-grade), NOT X (zeros).
    Callers gate availability with :func:`supported` (TPU/family/dtype)."""
    if interpret is None:
        interpret = not _on_tpu()
    spec = _Spec(
        family=_family_of(kernel),
        block_m=block_m or BLOCK_M,
        block_n=block_n or BLOCK_N,
        input_dim=Z.shape[1],
        interpret=interpret,
    )
    ls = kernel.lengthscales.value
    var = kernel.variance.value
    return _kuf_pallas(spec, Z, X, ls, var)


def kuf_build_sharded(kernel, Z, X, mesh, data_axis: str,
                      block_m: int = None, block_n: int = None,
                      interpret: bool = None) -> jnp.ndarray:
    """:func:`kuf_build` under a device mesh: X row-sharded over
    ``data_axis``, Kuf out column-sharded [M, N] (the layout the sharded
    gram/common-terms path constrains it to, parallel/sharded.py).

    pallas_call has no GSPMD partitioning rule, so instead of a sharding
    constraint this runs the whole builder per-device under ``shard_map``:
    each device assembles its own [M, N/n_dev] column block from its X
    rows; Z/ls/var ride replicated, and their per-shard cotangents are
    psummed by shard_map's reverse automatically (same AD contract as the
    sharded streaming matvec, parallel/streaming.py).  Callers must keep
    N divisible by the mesh's data-axis size (the chunked gram path sizes
    its chunks that way); ``interpret`` defaults from the MESH's platform,
    not the process default backend — CPU test meshes run the kernel
    interpreted."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"
    n_dev = mesh.shape[data_axis]
    if X.shape[0] % n_dev != 0:
        raise ValueError(
            f"N={X.shape[0]} not divisible by mesh axis {data_axis}={n_dev}"
        )
    spec = _Spec(
        family=_family_of(kernel),
        block_m=block_m or BLOCK_M,
        block_n=block_n or BLOCK_N,
        input_dim=Z.shape[1],
        interpret=interpret,
    )
    fn = shard_map(
        functools.partial(_kuf_pallas, spec),
        mesh=mesh,
        in_specs=(P(), P(data_axis, None), P(), P()),
        out_specs=P(None, data_axis),
        # pallas_call outputs carry no varying-mesh-axis metadata
        check_vma=False,
    )
    return fn(Z, X, kernel.lengthscales.value, kernel.variance.value)
