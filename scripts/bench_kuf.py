"""Standalone timing of the df32 Kuf build block (the common-terms hot
elementwise block): forward and forward+grad at the kin40k shape, plus the
d2-assembly and profile sub-blocks — the measurement motivating the fused
Pallas Kuf kernel (ops/kuf_pallas)."""
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from cglb_tpu.models import sgpr as sgpr_mod
from cglb_tpu.ops import kernels as k
from cglb_tpu.ops import df32 as df


def log(m):
    print(f"# {time.strftime('%H:%M:%S')} {m}", flush=True)


def bench(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = float(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = float(fn(*args))
    return (time.time() - t0) / iters


N, D, M = 40960, 8, 2048
rng = np.random.default_rng(0)
kern = k.make_kernel("Matern32", D, variance=1.0, lengthscales=1.0,
                     dtype=np.float64)
Z = rng.normal(size=(M, D))
params = sgpr_mod.SGPRParams.create(kern, Z, noise_variance=0.5,
                                    dtype=np.float64)


@jax.jit
def make_x(key):
    return jax.random.normal(key, (N, D), dtype=jnp.float64)


X = make_x(jax.random.PRNGKey(0))
X.block_until_ready()
log("data ready")

Zv = params.inducing_Z.value

PALLAS_ONLY = "pallas" in sys.argv[1:]


if not PALLAS_ONLY:
    # --- full kuf block, forward ---
    @jax.jit
    def kuf_fwd(params, X):
        return jnp.sum(sgpr_mod._kuf_block_df32(params, params.inducing_Z.value, X))


    t = bench(kuf_fwd, params, X)
    log(f"kuf df32 fwd: {t*1e3:.1f} ms")


    # --- d2 assembly alone (fp64) ---
    @jax.jit
    def d2_only(params, X):
        ls = params.kernel.lengthscales.value
        return jnp.sum(k.scaled_sq_dist(params.inducing_Z.value, X, ls))


    t = bench(d2_only, params, X)
    log(f"d2 assembly fp64: {t*1e3:.1f} ms")


    # --- profile alone (df32 matern on a resident fp64 d2) ---
    @jax.jit
    def prof_only(d2):
        return jnp.sum(df.matern32_unit(d2))


    d2c = jax.jit(lambda p, X: k.scaled_sq_dist(p.inducing_Z.value, X,
                                                p.kernel.lengthscales.value))(
        params, X)
    d2c.block_until_ready()
    t = bench(prof_only, d2c)
    log(f"df32 matern profile on resident d2: {t*1e3:.1f} ms")


    # --- forward + grad wrt the whole params pytree (ls, Z, var raws) ---
    def loss(p, X):
        kuf = sgpr_mod._kuf_block_df32(p, p.inducing_Z.value, X)
        w = jnp.cos(jnp.arange(N, dtype=jnp.float64))[None, :]
        return jnp.sum(kuf * w)


    @jax.jit
    def fwdgrad(p, X):
        v, g = jax.value_and_grad(loss)(p, X)
        # consume every grad leaf so XLA can't DCE the backward
        return v + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))


    t = bench(fwdgrad, params, X)
    log(f"kuf df32 fwd+grad (params pytree): {t*1e3:.1f} ms")


# --- fused Pallas builder (ops/kuf_pallas): correctness + timing on-chip ---
# run `python scripts/bench_kuf.py pallas` to skip the slow XLA-route
# sections above (their emulated-fp64 graphs take minutes to compile).
from cglb_tpu.ops import kuf_pallas as kp

if kp.supported(params.kernel, X.dtype, D):
    @jax.jit
    def kuf_pallas_fwd(params, X):
        return jnp.sum(kp.kuf_build(params.kernel,
                                    params.inducing_Z.value, X))

    t = bench(kuf_pallas_fwd, params, X)
    log(f"kuf PALLAS fwd: {t*1e3:.1f} ms")

    # value check vs the XLA df32 route at a reduced N (faster compile)
    ns = 4096
    a = jax.jit(lambda p, x: kp.kuf_build(p.kernel, p.inducing_Z.value, x))(
        params, X[:ns])
    b = jax.jit(lambda p, x: sgpr_mod._kuf_block_df32(
        p, p.inducing_Z.value, x, pallas=False))(params, X[:ns])
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
    log(f"pallas vs XLA df32 max rel err (n={ns}): {err:.3e}")

    def loss_p(p, X):
        n = X.shape[0]
        kuf = kp.kuf_build(p.kernel, p.inducing_Z.value, X)
        w = jnp.cos(jnp.arange(n, dtype=jnp.float64))[None, :]
        return jnp.sum(kuf * w)

    @jax.jit
    def fwdgrad_p(p, X):
        v, g = jax.value_and_grad(loss_p)(p, X)
        return v + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    t = bench(fwdgrad_p, params, X)
    log(f"kuf PALLAS fwd+grad: {t*1e3:.1f} ms")

    # gradient agreement vs the XLA route at reduced N (f32-grade budget)
    def loss_x(p, X):
        n = X.shape[0]
        kuf = sgpr_mod._kuf_block_df32(p, p.inducing_Z.value, X, pallas=False)
        w = jnp.cos(jnp.arange(n, dtype=jnp.float64))[None, :]
        return jnp.sum(kuf * w)

    Xs_ = X[:ns]
    gp = jax.jit(jax.grad(loss_p))(params, Xs_)
    gx = jax.jit(jax.grad(loss_x))(params, Xs_)
    for i, (lp, lx) in enumerate(zip(jax.tree_util.tree_leaves(gp),
                                     jax.tree_util.tree_leaves(gx))):
        sc = max(float(jnp.max(jnp.abs(lx))), 1e-8)
        e = float(jnp.max(jnp.abs(lp - lx))) / sc
        log(f"grad leaf {i}: rel err {e:.2e}")
