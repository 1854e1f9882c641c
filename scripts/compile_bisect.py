"""Bisect the cold-compile cost of the mixed CGLB loss+grad at kin40k shape.

AOT .lower()/.compile() timings per component — no device execution, so the
XLA-TPU backend compiles locally (TpuAotCompiler) while timings isolate
trace vs compile cost.
"""
import sys, time
import faulthandler
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_enable_compilation_cache", False)  # cold numbers
import numpy as np
faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)
log = lambda m: print(f"# {__import__('time').strftime('%H:%M:%S')} {m}", flush=True)

from cglb_tpu.models import sgpr, cglb
from cglb_tpu.ops import kernels as k

def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", flush=True)

import os
N, D, M = (2000, 8, 128) if os.environ.get("BISECT_SMALL") else (40000, 8, 2048)
rng = np.random.default_rng(0)
kern = k.make_kernel("Matern32", D, variance=1.0, lengthscales=1.0,
                     dtype=np.float64)
Z = rng.normal(size=(M, D))
params = sgpr.SGPRParams.create(kern, Z, noise_variance=0.5,
                                dtype=np.float64)
Xs = jax.ShapeDtypeStruct((N, D), jnp.float64)
Ys = jax.ShapeDtypeStruct((N, 1), jnp.float64)
p_abs = jax.tree_util.tree_map(
    lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype), params)

def timed(tag, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    hlo_lines = len(lowered.as_text().splitlines())
    log(f"{tag}: trace {t1-t0:.1f} s, compile {t2-t1:.1f} s, "
        f"stablehlo {hlo_lines} lines")
    return compiled

which = sys.argv[1:] or ["kuf", "kufg", "ct", "ctg", "loss", "lossg"]

if "kuf" in which:
    timed("kuf fwd [M,N]",
          lambda p, X: sgpr._kuf_block_df32(p, p.inducing_Z.value, X),
          p_abs, Xs)
if "kufg" in which:
    W = jax.ShapeDtypeStruct((M, N), jnp.float64)
    timed("kuf fwd+grad",
          lambda p, X, w: jax.value_and_grad(
              lambda q: jnp.sum(sgpr._kuf_block_df32(
                  q, q.inducing_Z.value, X) * w))(p),
          p_abs, Xs, W)
if "ct" in which:
    timed("common_terms mixed fwd",
          lambda p, X: sgpr.common_terms(p, X, mixed=True).LB, p_abs, Xs)
if "ctg" in which:
    timed("common_terms mixed fwd+grad",
          lambda p, X: jax.value_and_grad(
              lambda q: jnp.sum(sgpr.common_terms(q, X, mixed=True).LB))(p),
          p_abs, Xs)
if "elbo" in which:
    timed("sgpr elbo mixed fwd+grad",
          lambda p, X, Y: jax.value_and_grad(
              lambda q: sgpr.elbo(q, X, Y, mixed=True))(p), p_abs, Xs, Ys)
if "loss" in which or "lossg" in which:
    from cglb_tpu.backend import Model, Jax
    Xc = rng.normal(size=(N, D))
    Yc = rng.normal(size=(N, 1))
    from cglb_tpu.models.cglb import CGLBConfig
    model = Model("cglb", params, (jnp.asarray(Xc), jnp.asarray(Yc)),
                  run_cfg=CGLBConfig(), matvec="streaming",
                  common_dtype="mixed")
    loss_fn = model.loss_fn()
    carry = model._carry_in()
    c_abs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype),
        carry)
    if "loss" in which:
        timed("full cglb loss fwd",
              lambda p, c, X, Y: loss_fn(p, c, X, Y)[0], p_abs, c_abs, Xs, Ys)
    if "lossg" in which:
        def vg(p, c, X, Y):
            def w(q):
                l, s = loss_fn(q, c, X, Y)
                return l, s
            return jax.value_and_grad(w, has_aux=True)(p)
        timed("full cglb loss fwd+grad", vg, p_abs, c_abs, Xs, Ys)
print("DONE", flush=True)
