"""ctypes bindings for the native host runtime (native/*.cpp).

The reference's host-side native pieces are all third-party (scipy Fortran
L-BFGS-B, robustgp numpy selection; SURVEY.md section 2.9).  Here they are
first-party C++, built on demand with g++ into native/build/libcglb_native.so
and bound via ctypes (no pybind11 in this environment):

- ``conditional_variance_native``: greedy ConditionalVariance selection
  (OpenMP-parallel kernel columns, cache-friendly transposed pivot matrix).
- ``NativeLBFGS``: reverse-communication L-BFGS with strong-Wolfe line search
  (the optimizer *driver*; JAX evaluates value+grad on device).

Everything degrades gracefully: if g++ or the library is unavailable, callers
fall back to the numpy / scipy / optax paths.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["load_native", "native_available", "conditional_variance_native",
           "NativeLBFGS"]

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libcglb_native.so"
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _stale() -> bool:
    """True when any source is newer than the built library (the .so is a
    build artifact, never committed; rebuild keeps it in sync with sources)."""
    if not _LIB_PATH.exists():
        return True
    built = _LIB_PATH.stat().st_mtime
    sources = list(_NATIVE_DIR.glob("*.cpp")) + [_NATIVE_DIR / "Makefile"]
    return any(s.exists() and s.stat().st_mtime > built for s in sources)


def load_native() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if _stale() and not _build() and not _LIB_PATH.exists():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None

    lib.cglb_conditional_variance.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.cglb_conditional_variance.restype = ctypes.c_int
    lib.cglb_native_version.restype = ctypes.c_int
    lib.cglb_lbfgs_create.argtypes = [
        ctypes.c_int64, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_double,
    ]
    lib.cglb_lbfgs_create.restype = ctypes.c_void_p
    lib.cglb_lbfgs_destroy.argtypes = [ctypes.c_void_p]
    lib.cglb_lbfgs_step.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.cglb_lbfgs_step.restype = ctypes.c_int
    lib.cglb_lbfgs_best_f.argtypes = [ctypes.c_void_p]
    lib.cglb_lbfgs_best_f.restype = ctypes.c_double
    lib.cglb_lbfgs_best_x.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_native() is not None


def conditional_variance_native(X, M: int, kernel, seed: int = 0,
                                jitter: float = 1e-12):
    """Native greedy selection; same semantics as utils.inducing (permute with
    seed, pre-scale by lengthscales, argmax conditional variance)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    from ..ops import kernels as _k

    family = 0 if isinstance(kernel, _k.SquaredExponential) else 1
    var = float(np.asarray(kernel.variance.value))
    ls = np.asarray(kernel.lengthscales.value, dtype=np.float64)

    X = np.asarray(X, dtype=np.float64)
    N = X.shape[0]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(N)
    Xs = np.ascontiguousarray(X[perm] / ls)
    out = np.zeros(M, dtype=np.int64)
    rc = lib.cglb_conditional_variance(
        Xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        N, X.shape[1], M, family, var, jitter,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError(f"cglb_conditional_variance failed rc={rc}")
    Z = X[perm][out]
    return Z, perm[out]


class NativeLBFGS:
    """Reverse-communication L-BFGS handle.

    Usage:
        opt = NativeLBFGS(n)
        x = x0
        while evals < budget:
            f, g = value_and_grad(x)
            status, x = opt.step(x, f, g)
            if status in (NativeLBFGS.CONVERGED, NativeLBFGS.FAIL): break
    """

    EVALUATE = 0
    ACCEPTED = 1
    CONVERGED = 2
    FAIL = 3

    def __init__(self, n: int, history: int = 15, c1: float = 1e-4,
                 c2: float = 0.9, max_linesearch: int = 25,
                 gtol: float = 1e-9):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.n = n
        self._h = lib.cglb_lbfgs_create(n, history, c1, c2, max_linesearch,
                                        gtol)

    def step(self, x: np.ndarray, f: float, g: np.ndarray):
        x = np.ascontiguousarray(x, dtype=np.float64)
        g = np.ascontiguousarray(g, dtype=np.float64)
        x_out = np.empty_like(x)
        status = self._lib.cglb_lbfgs_step(
            self._h,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            float(f),
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            x_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return status, x_out

    @property
    def best_f(self) -> float:
        return self._lib.cglb_lbfgs_best_f(self._h)

    @property
    def best_x(self) -> np.ndarray:
        out = np.empty(self.n, dtype=np.float64)
        self._lib.cglb_lbfgs_best_x(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )
        return out

    def __del__(self):
        try:
            self._lib.cglb_lbfgs_destroy(self._h)
        except Exception:
            pass
