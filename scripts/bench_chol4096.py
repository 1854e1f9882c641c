"""Standalone probe: [M, M] fp64 chol_inv strategies at the protocol's
largest sweep point (M=4096), where the two factorization instances +
their matmul-only backwards dominate the feval (bench_blocks BB_M=4096:
ct_fwd 1.56 s, ct_vjp 2.40 s of the 2.68 s loss+grad).

Times, with the chained-in-jit scalar-readback convention (PERF.md
platform quirks: per-call dispatch over the tunnel costs 10s of ms, and
only a host readback of something depending on every output is
trustworthy):

  blocked256 / blocked512   current blocked fp64 chol_inv at BLOCK b
  f32seed                   blocked f32 chol_inv (the Newton seed cost)
  int8sq / f64sq            one [M, M] k=M square product, int8 batched
                            limbs vs emulated-fp64 dot (the Newton
                            residual building block vs what it replaces)
  newton                    f32-seeded coupled Newton refinement of
                            (L, C) with int8-exact residuals, 3 steps,
                            error vs the blocked-fp64 result

Usage: [BC_M=4096] python scripts/bench_chol4096.py [which ...]
"""
import os
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import faulthandler

faulthandler.dump_traceback_later(1200, repeat=True, file=sys.stderr)

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from cglb_tpu.ops import chol64

M = int(os.environ.get("BC_M", 4096))
KAPPA = float(os.environ.get("BC_KAPPA", 1e5))


def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", flush=True)


@jax.jit
def make_spd(key):
    # SPD with controlled condition ~KAPPA and non-trivial diagonal scaling
    # (exercises the equilibration): P = Q diag(lam) Q^T-ish via A A^T + d I
    ka, kd = jax.random.split(key)
    A = jax.random.normal(ka, (M, M), dtype=jnp.float64) / np.sqrt(M)
    P = A @ A.T + (4.0 / KAPPA) * jnp.eye(M, dtype=jnp.float64)
    # row/col scaling: diag in [1e-2, 1e2]
    d = jnp.logspace(-2, 2, M, dtype=jnp.float64)
    return d[:, None] * P * d[None, :]


P = make_spd(jax.random.PRNGKey(0))
P.block_until_ready()
log(f"SPD ready M={M} kappa~{KAPPA:g}")

REPS = 5


def chain_bench(tag, fn, x, reps=REPS):
    """fn: x -> pytree; serialized by feeding a scalar back into x."""

    def chained(x):
        def body(i, carry):
            s, _ = carry
            out = fn(x + (0.0 * s).astype(x.dtype))
            leaves = jax.tree_util.tree_leaves(out)
            s2 = sum(jnp.ravel(l)[0].astype(jnp.float64) for l in leaves)
            return s2, out
        return jax.lax.fori_loop(
            0, reps, body, (jnp.asarray(0.0, jnp.float64), fn(x)))[0]

    j = jax.jit(chained)
    t0 = time.time()
    float(j(x))
    log(f"{tag}: first call {time.time() - t0:.1f} s")
    t0 = time.time()
    float(j(x))
    t = (time.time() - t0) / (reps + 1)
    log(f"{tag}: {t * 1e3:.1f} ms per call")
    return t


which = sys.argv[1:] or ["blocked256", "blocked512", "f32seed", "int8sq",
                         "f64sq", "newton"]

if "blocked256" in which:
    chol64.BLOCK = 256
    chain_bench("blocked256 fwd", lambda p: chol64.chol_inv(p), P)

    def vjp256(p):
        out, pull = jax.vjp(chol64.chol_inv, p)
        (g,) = pull(jax.tree_util.tree_map(jnp.ones_like, out))
        return out[0], g
    chain_bench("blocked256 fwd+vjp", vjp256, P)

if "blocked512" in which:
    chol64.BLOCK = 512
    chain_bench("blocked512 fwd", lambda p: chol64.chol_inv(p), P)

    def vjp512(p):
        out, pull = jax.vjp(chol64.chol_inv, p)
        (g,) = pull(jax.tree_util.tree_map(jnp.ones_like, out))
        return out[0], g
    chain_bench("blocked512 fwd+vjp", vjp512, P)
    chol64.BLOCK = 256

if "blocked1024" in which:
    chol64.BLOCK = 1024
    chain_bench("blocked1024 fwd", lambda p: chol64.chol_inv(p), P)
    chol64.BLOCK = 256

if "f32seed" in which:
    Pf = P.astype(jnp.float32)
    chol64.BLOCK = 256
    chain_bench("f32 blocked fwd (seed)",
                lambda p: chol64.chol_inv(p), Pf)

if "int8sq" in which or "f64sq" in which or "newton" in which:
    from cglb_tpu.ops.intgram import matmul_exact_int8

    A64 = P / jnp.max(jnp.abs(P))
    if "int8sq" in which:
        chain_bench("int8 square product (8 limbs, batched)",
                    lambda a: matmul_exact_int8(a, a.T, batched=True), A64)
        chain_bench("int8 square product (6 limbs, batched)",
                    lambda a: matmul_exact_int8(a, a.T, limbs=6,
                                                batched=True), A64)
    if "f64sq" in which:
        chain_bench("fp64 emulated square product",
                    lambda a: jnp.dot(a, a.T), A64)

if "newton" in which:
    from cglb_tpu.ops.intgram import matmul_exact_int8

    hi = jax.lax.Precision.HIGHEST
    f32 = jnp.float32

    def phi(X):
        return jnp.tril(X) - 0.5 * jnp.diag(jnp.diagonal(X))

    def newton_chol_inv(P, steps=3):
        dt = P.dtype
        s = jnp.sqrt(jnp.diagonal(P))
        si = 1.0 / s
        Ps = P * (si[:, None] * si[None, :])
        eye = jnp.eye(M, dtype=dt)
        # f32 blocked seed
        Lf, Cf = chol64.chol_inv(Ps.astype(f32))
        L, C = Lf.astype(dt), Cf.astype(dt)

        def body(i, carry):
            L, C = carry
            R = eye - matmul_exact_int8(C, L, batched=True)
            C = C + jnp.dot(R.astype(f32), C.astype(f32),
                            precision=hi).astype(dt)
            E = Ps - matmul_exact_int8(L, L.T, batched=True)
            F = jnp.dot(jnp.dot(C.astype(f32), E.astype(f32), precision=hi),
                        C.astype(f32).T, precision=hi)
            L = L + jnp.dot(L.astype(f32), phi(F), precision=hi).astype(dt)
            return L, C

        L, C = jax.lax.fori_loop(0, steps, body, (L, C))
        return s[:, None] * L, C * si[None, :]

    chain_bench("newton (f32 seed + 3 int8-residual steps)",
                newton_chol_inv, P)

    # accuracy vs the blocked-fp64 result
    chol64.BLOCK = 256
    Lb, Cb = jax.jit(chol64.chol_inv)(P)
    Ln, Cn = jax.jit(newton_chol_inv)(P)
    rel = lambda a, b: float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
    log(f"newton vs blocked: L rel {rel(Ln, Lb):.3e}  C rel {rel(Cn, Cb):.3e}")
    # reconstruction residuals (the quantity the gate would check)
    res_e = float(jnp.max(jnp.abs(P - Ln @ Ln.T)) / jnp.max(jnp.abs(P)))
    res_r = float(jnp.max(jnp.abs(jnp.eye(M) - Cn @ Ln)))
    res_eb = float(jnp.max(jnp.abs(P - Lb @ Lb.T)) / jnp.max(jnp.abs(P)))
    res_rb = float(jnp.max(jnp.abs(jnp.eye(M) - Cb @ Lb)))
    log(f"newton residuals: |P-LL^T| {res_e:.3e} |I-CL| {res_r:.3e}")
    log(f"blocked residuals: |P-LL^T| {res_eb:.3e} |I-CL| {res_rb:.3e}")

print("DONE", flush=True)
