"""Showcase: CGLB mixed-mode training at kin40k shape, 30 L-BFGS steps."""
import time
import numpy as np
from cglb_tpu.backend import Jax
from cglb_tpu.configs import CGLBConfig, InducingVariableConfig, Matern32Config
from cglb_tpu.experiments.datasets import get_dataset

bundle = get_dataset("Wilson_kin40k")
Jax.matvec_mode = "streaming"
Jax.common_dtype = "mixed"
cfg = CGLBConfig(Matern32Config(), InducingVariableConfig(2048))
t0 = time.time()
model = Jax.create_model(cfg, bundle.train, seed=0)
print(f"selection M=2048: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
res = Jax.optimize(model, bundle.to_tuple(), num_steps=30, optimizer="scipy")
print(f"30 L-BFGS steps (mixed, M=2048): {time.time()-t0:.1f}s "
      f"({res.num_iters} iters, loss {res.final_loss:.2f})", flush=True)
m = Jax.metrics_fn(model, bundle.to_tuple())()
print({k: round(v, 4) for k, v in m.items()}, flush=True)
