"""Time-to-ELBO: train CGLB on synthetic kin40k shape for 30 L-BFGS steps."""
import time
import numpy as np
from cglb_tpu.backend import Jax
from cglb_tpu.configs import CGLBConfig, InducingVariableConfig, Matern32Config
from cglb_tpu.experiments.datasets import get_dataset

t0 = time.time()
bundle = get_dataset("Wilson_kin40k")  # synthetic stand-in, right shapes
print(f"data: {bundle.train[0].shape} ({time.time()-t0:.1f}s)", flush=True)

Jax.matvec_mode = "streaming"
cfg = CGLBConfig(Matern32Config(), InducingVariableConfig(1024))
t0 = time.time()
model = Jax.create_model(cfg, bundle.train, seed=0)
print(f"model created (greedy selection M=1024 on device): {time.time()-t0:.1f}s", flush=True)

metrics_fn = Jax.metrics_fn(model, bundle.to_tuple())
t0 = time.time()
res = Jax.optimize(model, bundle.to_tuple(), num_steps=30, optimizer="scipy")
t_train = time.time() - t0
print(f"30 L-BFGS steps: {t_train:.1f}s ({res.num_iters} iters, loss {res.final_loss:.2f})", flush=True)
t0 = time.time()
m = metrics_fn()
print(f"metrics ({time.time()-t0:.1f}s):", {k: round(v, 4) for k, v in m.items()}, flush=True)
