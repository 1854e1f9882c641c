"""Global numeric configuration.

The reference library configures float type / jitter / seed once per process on a
backend object (reference: cglb/backend/backend.py:72-91, cglb/backend/tensorflow/
interface.py:87-119).  We keep the same once-per-process model: a tiny module-level
settings object consulted when *creating* models.  All jitted compute is purely
functional; the settings only pick dtypes and constants at construction time.

TPU note: fp64 is supported through XLA's software emulation (enabled via
``jax.config.update("jax_enable_x64", True)``); the performance-critical matvec path
has dedicated fp32/df64 Pallas kernels (see cglb_tpu/ops/matvec_pallas.py) so that
the MXU is never asked to do emulated fp64 matmuls in the hot loop.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import numpy as np

__all__ = [
    "default_float",
    "default_jitter",
    "positive_lower_bound",
    "set_default_float",
    "set_default_jitter",
    "set_default_seed",
    "settings",
]

_FLOAT_ALIASES = {
    "fp32": np.float32,
    "float32": np.float32,
    "fp64": np.float64,
    "float64": np.float64,
    np.float32: np.float32,
    np.float64: np.float64,
    np.dtype(np.float32): np.float32,
    np.dtype(np.float64): np.float64,
}

# Reference jitter policy: 1e-5 for fp32, 1e-6 for fp64
# (reference: cglb/backend/backend.py:76-83).
_DEFAULT_JITTER = {np.float32: 1e-5, np.float64: 1e-6}

# Reference lower bound for positive parameters: 5e-3 (fp32) / 1e-6 (fp64)
# (reference: cglb/backend/tensorflow/interface.py:167-171).
_POSITIVE_LOWER = {np.float32: 5e-3, np.float64: 1e-6}


@dataclasses.dataclass
class _Settings:
    float_type: type = np.float64
    jitter: Optional[float] = None  # None -> dtype-dependent default
    seed: int = 0

    @property
    def effective_jitter(self) -> float:
        if self.jitter is not None:
            return self.jitter
        return _DEFAULT_JITTER[self.float_type]


settings = _Settings()


def default_float() -> type:
    return settings.float_type


def default_jitter() -> float:
    return settings.effective_jitter


def positive_lower_bound(dtype=None) -> float:
    ft = _FLOAT_ALIASES[dtype] if dtype is not None else settings.float_type
    return _POSITIVE_LOWER[ft]


def set_default_float(float_type) -> None:
    """Set the process-wide default float ("fp32"/"fp64" or numpy dtype)."""
    if float_type not in _FLOAT_ALIASES:
        raise NotImplementedError(f"Unknown float type {float_type!r}")
    settings.float_type = _FLOAT_ALIASES[float_type]
    if settings.float_type is np.float64:
        jax.config.update("jax_enable_x64", True)


def set_default_jitter(value) -> None:
    """Set jitter; accepts a float or a float-type string for the dtype default."""
    if isinstance(value, str):
        ft = _FLOAT_ALIASES[value]
        settings.jitter = _DEFAULT_JITTER[ft]
    else:
        settings.jitter = float(value)


def set_default_seed(seed: int) -> None:
    settings.seed = int(seed)
    np.random.seed(seed)


def enable_x64() -> None:
    jax.config.update("jax_enable_x64", True)


# fp64 is the reference's experiment dtype; enable by default unless the user
# explicitly opted out through JAX's own env var.
if os.environ.get("JAX_ENABLE_X64", "").lower() not in ("0", "false"):
    enable_x64()


# Honor JAX_PLATFORMS explicitly: in environments where a TPU PJRT plugin
# registers itself, the env var alone can lose to the plugin at backend init —
# the config update is authoritative as long as no backend has been touched
# yet (same technique as tests/conftest.py; lets CLI entry points run forced
# CPU meshes, e.g. `JAX_PLATFORMS=cpu ... --mesh 8` with
# --xla_force_host_platform_device_count).
_platforms_env = os.environ.get("JAX_PLATFORMS", "")
if _platforms_env:
    try:
        jax.config.update("jax_platforms", _platforms_env)
    except Exception:  # backend already initialized by the embedding process
        pass


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache.  fp64-heavy CGLB graphs can take
    minutes to compile on TPU toolchains (fp64 emulation multiplies the HLO);
    caching makes that a one-time cost per (shape, config)."""
    path = path or os.environ.get(
        "CGLB_COMPILE_CACHE", os.path.expanduser("~/.cache/cglb_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


if os.environ.get("CGLB_COMPILE_CACHE", "") != "off":
    try:
        enable_compilation_cache()
    except Exception:  # cache is an optimization, never a requirement
        pass
