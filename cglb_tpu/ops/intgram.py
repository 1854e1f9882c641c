"""Exact Gram matrix via fixed-point int8 limbs on the MXU.

The mixed common-terms path needs G = Kuf Kuf^T at fp64 grade (the AAT
sandwich amplifies G errors by kappa(L)^2; models/sgpr.py), but TPU fp64
matmuls are emulated (~205 ms at [2048, 40960] — PERF.md).  f32 matmuls
cannot substitute: the MXU's f32 accumulator floors the k-reduction error at
~sqrt(k) * eps32 ~ 1e-5 relative.  **Integer matmuls have no such floor** —
int8 x int8 products accumulate EXACTLY in int32.

Scheme (kernel values are bounded: Kuf in [0, variance]):

1. q = Kuf / s with s = 2^(floor(log2(var)) + 2), a power of two, so the
   division is exact and q in [0, 0.5].
2. N_q = round(q * 2^53): an exact 52-bit integer held in fp64 (q < 0.5);
   only bits of q below 2^-53 * s round — the same absolute floor as fp64
   itself.  Split N_q at the 28-bit boundary into two int32 halves (exact),
   then slice eight 7-bit limbs u_m in [0, 127] with native int32
   shifts/masks (7 * 4 = 28: the halves align with limb boundaries).
3. q = 2^-53 * sum_m u_m 2^(7m), so
   G = s^2 * 2^-106 * sum_{m,m'} 2^(7(m+m')) U_m U_{m'}^T.
   Each U_m U_{m'}^T is an int8 MXU matmul accumulated exactly in int32
   (products <= 127^2; k-sums exact for N <= ~130k — the chunked gram path
   keeps k at ~16k).  Low-significance pairs (m + m' <= 5) are dropped:
   their total is < N * 2^-52 s^2, i.e. below the fp64 matmul's own
   rounding.  Symmetry (U_m U_m'^T = (U_m' U_m^T)^T) halves the count to
   24 matmuls; each is scale-added into the fp64 G.

Accuracy: matches the fp64 matmul to ~N * eps64 absolute (test-pinned
against the fp64 oracle).  Gradients never flow through this function (its
only consumer is the forward of models/sgpr._gram_outer, whose vjp is
analytic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gram_exact_int8", "matmul_exact_int8", "NUM_LIMBS", "MAX_K"]

NUM_LIMBS = 8
# int32 accumulation bound: 127^2 * k < 2^31  =>  k < 133k; callers above
# this must chunk the contraction dimension (the gram path always does)
MAX_K = 130_000


def _pow2_scale(var):
    """Power of two with var / scale in (0.25, 0.5].

    ldexp, not exp2: XLA's exp2 is a polynomial approximation even at
    integer arguments (~1e-6 relative — PERF.md platform quirks), which
    would make s fractionally off a power of two; ldexp is exact bit
    manipulation.  It runs in f32 (exact for every power of two in
    [2^-126, 2^127], far beyond any reachable variance) and upcasts,
    because fp64 ldexp lowers through an s64 bitcast that the TPU
    X64-rewriting pass rejects.  (An off-by-one in floor(log2 .) near
    power-of-two variances is harmless either way: the limb planes carry
    56 bits for a 53-bit payload, so q in (0.125, 1] all reconstruct
    exactly.)"""
    e = jnp.floor(jnp.log2(var)) + 2.0
    one = jnp.ones((), dtype=jnp.float32)
    return jnp.ldexp(one, e.astype(jnp.int32)).astype(var.dtype)


def _limb_planes(kuf, s):
    """Eight int8 limb planes of round(kuf / s * 2^53) (exact extraction)."""
    q = kuf / s  # exact: power-of-two scale
    # guard: kernel entries are mathematically nonnegative, but a -1e-30
    # from rounding would corrupt the int shifts below
    q = jnp.maximum(q, 0.0)
    nq = jnp.round(q * np.float64(2.0**53))  # exact 52-bit integer in fp64
    hi = jnp.floor(nq * np.float64(2.0**-28))
    lo = nq - hi * np.float64(2.0**28)
    hi32 = hi.astype(jnp.int32)  # bits 28..52
    lo32 = lo.astype(jnp.int32)  # bits 0..27
    planes = []
    for m in range(NUM_LIMBS):
        base = 7 * m
        if base >= 28:
            plane = jnp.right_shift(hi32, base - 28) & 127
        else:
            plane = jnp.right_shift(lo32, base) & 127
        planes.append(plane.astype(jnp.int8))
    return planes


def _scaled_pair_sum(terms, k, out_dtype, shape, bias: int = 106):
    """sum_s 2^(7s - bias) * (sum of the int32 pair-products with weight s),
    with the emulated-fp64 work minimized (bias = 2 * payload bits; 106 for
    the full 53-bit planes).

    ``terms`` is a list of (s, P, bound) with P an exact int32 pair-product
    whose entries are bounded by ``bound * k``.  Naively every P costs one
    fp64 convert + scale-add — on TPU those emulated-fp64 elementwise ops
    dominate the whole limb matmul (measured: 43 scale-adds ~11 ms at
    [2048, 2048] vs ~1.2 ms for the 43 int8 MXU dots themselves).  Since
    products of equal limb weight s = m + m' share a scale, they are summed
    EXACTLY in int32 first — in chunks sized to the static overflow headroom
    2^31 / (bound * k) — so the fp64 conversion count drops from
    len(terms) to the number of chunks (9 diagonals at the sandwich's
    k = M = 2048, a ~4x end-to-end win; at k near MAX_K the headroom is 1
    and this degenerates to the per-pair behavior)."""
    by_s = {}
    for s, P, bound in terms:
        by_s.setdefault(s, []).append((P, bound))
    C = jnp.zeros(shape, dtype=out_dtype)
    for s in sorted(by_s):
        plist = by_s[s]
        i = 0
        while i < len(plist):
            acc, headroom = None, 2**31 - 1
            while i < len(plist) and headroom - plist[i][1] * k >= 0:
                P, bound = plist[i]
                headroom -= bound * k
                acc = P if acc is None else acc + P
                i += 1
            if acc is None:  # single term already at the headroom: emit raw
                acc = plist[i][0]
                i += 1
            C = C + np.float64(2.0 ** (7 * s - bias)) * acc.astype(out_dtype)
    return C


def gram_exact_int8(kuf, var):
    """G = kuf @ kuf.T to fp64 grade via exact int8-limb MXU matmuls.

    kuf: [M, N] fp64 kernel cross-covariance, entries in [0, var], with
    N <= MAX_K (callers chunk the contraction beyond that).
    var: kernel variance (traced scalar), the entry bound."""
    if kuf.shape[1] > MAX_K:
        raise ValueError(
            f"contraction dim {kuf.shape[1]} overflows the int32 "
            f"accumulator; chunk to <= {MAX_K}"
        )
    s = _pow2_scale(var).astype(kuf.dtype)
    planes = _limb_planes(kuf, s)

    M = kuf.shape[0]
    terms = []
    for m in range(NUM_LIMBS):
        for mp in range(m, NUM_LIMBS):
            if m + mp <= 5:
                continue  # below the fp64 rounding floor (module docstring)
            P = jax.lax.dot_general(
                planes[m], planes[mp],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if m != mp:
                P = P + P.T  # |entries| <= 2 * 127^2 * N: still exact int32
            terms.append((m + mp, P, 127 * 127 * (2 if m != mp else 1)))
    G = _scaled_pair_sum(terms, kuf.shape[1], kuf.dtype, (M, M))
    return G * (s * s)


# ---------------------------------------------------------------------------
# General (signed, rectangular) exact matmul — the AAT-sandwich killer.
# ---------------------------------------------------------------------------


def _row_scales(absmax):
    """Per-slice power-of-two scale with absmax / s in (0.25, 0.5].

    Same ldexp-in-f32 route as _pow2_scale (exact bit manipulation; fp64
    ldexp is rejected by the TPU X64 rewriter).  All-zero slices get s=1 so
    the division below stays finite (their limbs are all zero anyway)."""
    safe = jnp.where(absmax > 0.0, absmax, 1.0)
    e = jnp.floor(jnp.log2(safe)) + 2.0
    one = jnp.ones((), dtype=jnp.float32)
    return jnp.ldexp(one, e.astype(jnp.int32)).astype(absmax.dtype)


def _payload_bits(limbs: int) -> int:
    """Quantization payload carried by ``limbs`` 7-bit planes (capped at
    fp64's 53-bit integer-exactness limit; 8 limbs carry 56 >= 53)."""
    return min(53, 7 * limbs)


def _signed_limb_planes(q, limbs: int = NUM_LIMBS):
    """``limbs`` signed int8 limb planes of round(q * 2^payload), |q| <= 0.5.

    Sign-magnitude: extract the 7-bit limbs of |q| exactly as _limb_planes,
    then fold the sign into every plane, so q ~= 2^-payload *
    sum_m plane_m 2^(7m) with plane entries in [-127, 127]
    (int8-representable; products still bounded by 127^2 so int32
    accumulation stays exact up to MAX_K).  limbs < 8 trades accuracy for
    matmul count: the reconstruction carries the 2^-(payload+1) input
    rounding instead of fp64's 2^-54 (gradient-grade consumers use 5)."""
    payload = _payload_bits(limbs)
    sgn = jnp.where(q < 0.0, -1, 1).astype(jnp.int32)
    nq = jnp.round(jnp.abs(q) * np.float64(2.0**payload))
    hi = jnp.floor(nq * np.float64(2.0**-28))
    lo = nq - hi * np.float64(2.0**28)
    hi32 = hi.astype(jnp.int32)
    lo32 = lo.astype(jnp.int32)
    planes = []
    for m in range(limbs):
        base = 7 * m
        if base >= 28:
            plane = jnp.right_shift(hi32, base - 28) & 127
        else:
            plane = jnp.right_shift(lo32, base) & 127
        planes.append((plane * sgn).astype(jnp.int8))
    return planes


def matmul_exact_int8(A, B, limbs: int = NUM_LIMBS, batched: bool = False):
    """C = A @ B to fp64 grade via signed int8-limb MXU matmuls.

    The mixed common-terms path's remaining emulated-fp64 [M, M] matmuls
    (the AAT sandwich ``Cinv @ G @ Cinv^T`` and ``Cinv @ U``,
    models/sgpr._gram_terms) have no entry-sign or entry-bound structure to
    exploit, so unlike :func:`gram_exact_int8` this uses *per-row* (A) and
    *per-column* (B) power-of-two scales: A = diag(sa) qa, B = qb diag(sb)
    with |q| in [0, 0.5], division exact.  Then

        C = diag(sa) (2^-106 sum_{m,m'} 2^(7(m+m')) Pa_m @ Pb_{m'}) diag(sb)

    with every Pa_m @ Pb_{m'} an exact int8->int32 MXU matmul.  Pairs with
    m + m' <= 5 are dropped (< k * 2^-51 of the per-entry bound
    sa_i sb_j k / 4 — below the fp64 matmul's own ~k*eps64 rounding enve-
    lope); no symmetry halving is available, so 43 of 64 pairs run.

    Row/column scaling makes the error *rowwise/columnwise* relative: each
    C_ij carries absolute error ~ k * eps64 * max_k|A_ik| * max_k|B_kj| —
    the same envelope as the fp64 matmul's |A||B| error bound up to the
    usual cancellation caveat shared by both.

    Gradients do not flow (consumers wrap this in custom_vjp with an
    f32-HIGHEST analytic backward, models/sgpr._mm_f64grade).

    ``limbs`` < 8 reduces the plane count for consumers that only need
    gradient-grade results (the input quantization floor becomes
    2^-(7*limbs+1) instead of 2^-54; see _signed_limb_planes).

    ``batched=True`` runs ALL limb-pair products as ONE int8 MXU matmul of
    the stacked planes, [limbs*M, K] x [K, limbs*N] -> [limbs*M, limbs*N]
    int32, then slices the pairs back out for the grouped scale-add.  Same
    exact integer math (each output element is still one int32-exact
    pair-dot), ~1.5x the MXU work (the dropped low pairs are computed
    anyway) — but ONE dot HLO instead of limbs^2 - drop.  XLA's compile
    cost on TPU scales with dot *instances*: the per-pair form measured
    ~50 s of extra cold compile per call site inside the CGLB loss+grad
    graph (five call sites pushed the 183 s compile past 900 s), while the
    batched form adds seconds."""
    if A.shape[1] > MAX_K:
        raise ValueError(
            f"contraction dim {A.shape[1]} overflows the int32 "
            f"accumulator; chunk to <= {MAX_K}"
        )
    # low-significance pair cutoff: pairs with m + m' <= cutoff total
    # < k * 2^(7*(cutoff+2) - 2*payload) of the per-entry bound — for the
    # full 8 limbs that is the documented s <= 5 fp64-floor drop; fewer
    # limbs keep every pair (the quantization floor dominates)
    payload = _payload_bits(limbs)
    cutoff = 2 * limbs - 11
    sa = _row_scales(jnp.max(jnp.abs(A), axis=1))  # [M]
    sb = _row_scales(jnp.max(jnp.abs(B), axis=0))  # [N]
    qa = A / sa[:, None]
    qb = B / sb[None, :]
    planes_a = _signed_limb_planes(qa, limbs)
    planes_b = _signed_limb_planes(qb, limbs)
    M, N = A.shape[0], B.shape[1]
    terms = []
    if batched:
        Abig = jnp.concatenate(planes_a, axis=0)  # [limbs*M, K]
        Bbig = jnp.concatenate(planes_b, axis=1)  # [K, limbs*N]
        G = jax.lax.dot_general(
            Abig, Bbig,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(limbs, M, limbs, N)
        for m in range(limbs):
            for mp in range(limbs):
                if m + mp <= cutoff:
                    continue
                terms.append((m + mp, G[m, :, mp, :], 127 * 127))
    else:
        for m in range(limbs):
            for mp in range(limbs):
                if m + mp <= cutoff:
                    continue
                P = jax.lax.dot_general(
                    planes_a[m], planes_b[mp],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                terms.append((m + mp, P, 127 * 127))
    C = _scaled_pair_sum(terms, A.shape[1], A.dtype, (M, N),
                         bias=2 * payload)
    return C * sa[:, None] * sb[None, :]
