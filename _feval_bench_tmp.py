"""Measure full CGLB feval (loss+grad) at kin40k shape with streaming matvec."""
import time
import numpy as np, jax, jax.numpy as jnp
from cglb_tpu.models import cglb as cglb_mod
from cglb_tpu.models import sgpr as sgpr_mod
from cglb_tpu.ops import kernels as k
from cglb_tpu.ops import matvec_pallas as mvp

rng = np.random.default_rng(0)
n, d, m = 40000, 8, 2048
X = rng.normal(size=(n, d))
Y = np.sin(X[:, :1]) + 0.1 * rng.normal(size=(n, 1))
kern = k.make_kernel("Matern32", d, dtype=np.float64)
Z = X[rng.choice(n, m, replace=False)]
params = sgpr_mod.SGPRParams.create(kern, Z, noise_variance=0.5, dtype=np.float64)
Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
cfg = cglb_mod.CGLBConfig(max_error=1.0, max_cg_iters=100)
v0 = cglb_mod.init_v0(n)

def loss_fn(p, v, X, Y):
    op = mvp.make_streaming_operator(p.kernel, X, p.noise_variance.value, 1024, 1024)
    l, aux = cglb_mod.loss(p, X, Y, v, cfg, matvec=op)
    return l, aux

vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
t0 = time.time()
(l, aux), g = vg(params, v0, Xj, Yj)
l = float(l)
print(f"compile+first feval: {time.time()-t0:.1f}s loss={l:.2f} cg_steps={int(aux.cg_steps)}", flush=True)

for trial in range(3):
    t0 = time.time()
    (l, aux), g = vg(params, aux.v, Xj, Yj)
    l = float(l); steps = int(aux.cg_steps)
    print(f"feval (warm v): {time.time()-t0:.3f}s cg_steps={steps}", flush=True)

t0 = time.time()
(l, aux2), g = vg(params, v0, Xj, Yj)
l = float(l)
print(f"feval (cold v0): {time.time()-t0:.3f}s cg_steps={int(aux2.cg_steps)}", flush=True)

fwd = jax.jit(loss_fn)
l, aux = fwd(params, v0, Xj, Yj); l = float(l)
t0 = time.time()
l, aux3 = fwd(params, v0, Xj, Yj); l = float(l)
print(f"forward only (cold v0): {time.time()-t0:.3f}s cg_steps={int(aux3.cg_steps)}", flush=True)
