"""Count cholesky / triangular_solve instances (and operand shapes) in the
StableHLO of the full mixed CGLB loss+grad — CPU lowering, which shares the
jaxpr structure the TPU pipeline sees before the X64 rewriter."""
import re
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from cglb_tpu.models import sgpr
from cglb_tpu.ops import chol64
from cglb_tpu.ops import kernels as k

mode = sys.argv[1] if len(sys.argv) > 1 else "expander"
chol64.ALGO = "blocked" if mode == "blocked" else "expander"

N, D, M = 4000, 8, 512  # small N (lowering structure is N-independent)
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

from cglb_tpu.backend import Model
from cglb_tpu.models.cglb import CGLBConfig

Xc = rng.normal(size=(N, D))
Yc = rng.normal(size=(N, 1))
model = Model("cglb", params, (jnp.asarray(Xc), jnp.asarray(Yc)),
              run_cfg=CGLBConfig(), matvec="streaming",
              common_dtype="mixed")
loss_fn = model.loss_fn()
carry = model._carry_in()
c_abs = jax.tree_util.tree_map(
    lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype), carry)


def vg(p, c, X, Y):
    return jax.value_and_grad(lambda q: loss_fn(q, c, X, Y)[0],
                              has_aux=False)(p)


txt = jax.jit(vg).lower(p_abs, c_abs, Xs, Ys).as_text()
print(f"mode={mode}  stablehlo lines: {len(txt.splitlines())}")
for opname in ("chlo.cholesky", "lapack", "cholesky", "triangular_solve"):
    hits = re.findall(rf"\b\S*{opname}\S*\s*\(?[^\n]*", txt)
    pass
# count op occurrences with tensor shapes
for op in ("cholesky", "triangular_solve", "trsm", "potrf"):
    lines = [l.strip() for l in txt.splitlines() if op in l and "func" not in l]
    shapes = {}
    for l in lines:
        m = re.findall(r"tensor<([0-9x]+)xf(32|64)>", l)
        key = tuple(m[:2])
        shapes[key] = shapes.get(key, 0) + 1
    total = len(lines)
    print(f"{op}: {total} call sites")
    for key, c in sorted(shapes.items(), key=lambda kv: -kv[1]):
        print(f"   {c:3d} x {key}")
