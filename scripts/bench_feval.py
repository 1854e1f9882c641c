"""Warm loss+grad feval timing at kin40k shape (N=40960, M=2048, mixed),
plus cold-compile wall-clock — run AFTER the blocked-chol/Ci changes.
Operands are generated ON DEVICE (host->device transfers over the tunnel
stall; memory note)."""
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import faulthandler

faulthandler.dump_traceback_later(1200, repeat=True, file=sys.stderr)

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from cglb_tpu.models import sgpr as sgpr_mod
from cglb_tpu.models.cglb import CGLBConfig
from cglb_tpu.backend import Model


def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", flush=True)


from cglb_tpu.ops import kernels as k

N, D, M = 40960, 8, 2048
if "--M" in sys.argv:  # protocol sweep point override (e.g. --M 4096)
    M = int(sys.argv[sys.argv.index("--M") + 1])
rng = np.random.default_rng(0)
kern = k.make_kernel("Matern32", D, variance=1.0, lengthscales=1.0,
                     dtype=np.float64)
Z = rng.normal(size=(M, D))  # [2048, 8] — small enough for the tunnel
params = sgpr_mod.SGPRParams.create(kern, Z, noise_variance=0.5,
                                    dtype=np.float64)
log("making data on device")


@jax.jit
def make_data(key):
    kx, kn = jax.random.split(key)
    X = jax.random.normal(kx, (N, D), dtype=jnp.float64)
    w = jnp.linspace(0.5, 1.5, D, dtype=jnp.float64)
    Y = jnp.sin(X @ w[:, None]) + 0.5 * jax.random.normal(
        kn, (N, 1), dtype=jnp.float64)
    return X, Y


X, Y = make_data(jax.random.PRNGKey(0))
X.block_until_ready()
log("data ready")

model = Model("cglb", params, (X, Y), run_cfg=CGLBConfig(),
              matvec="streaming", common_dtype="mixed")
loss_fn = model.loss_fn()
carry = model._carry_in()


def wrapped(p, c, X, Y):
    (l, aux), g = jax.value_and_grad(
        lambda q: loss_fn(q, c, X, Y), has_aux=True)(p)
    # consume every grad leaf so XLA cannot DCE the backward
    s = sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g))
    return l + 1e-30 * s, aux


vg = jax.jit(wrapped)
log("compiling loss+grad (cold)")
t0 = time.time()
l, aux = vg(model.params, carry, X, Y)
lf = float(l)
t_cold = time.time() - t0
log(f"cold first call (compile+run): {t_cold:.1f} s  loss={lf:.2f}")

times = []
for i in range(5):
    t0 = time.time()
    l, aux = vg(model.params, aux, X, Y)
    lf = float(l)
    times.append(time.time() - t0)
log(f"warm feval: {min(times):.3f} s min / {np.mean(times):.3f} s mean "
    f"(cg_steps={int(aux.cg_steps)})  loss={lf:.2f}")
if "--json" in sys.argv:
    # machine-readable line for bench.py's detail capture
    import json

    print(json.dumps({"warm_feval_s": round(min(times), 3),
                      "cold_compile_s": round(t_cold, 1)}), flush=True)
print("DONE", flush=True)
