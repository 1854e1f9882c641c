"""Device-mesh helpers.

The reference's only multi-device mechanism is gpytorch's MultiDeviceKernel —
row-block data parallelism for kernel evaluation across CUDA GPUs
(cglb/backend/pytorch/interface.py:241-244).  The TPU-native equivalent is a
1-D ``jax.sharding.Mesh`` over the data axis: kernel-matrix columns, CG state,
and Kuf columns are sharded along N; M x M terms stay replicated; XLA inserts
the psum/all-gather collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["data_mesh", "P", "NamedSharding", "replicated", "data_sharded"]

DATA_AXIS = "data"


def data_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the data axis using the first n devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis_index: int = 0, ndim: int = 2) -> NamedSharding:
    """Sharding with the data axis on dimension `axis_index` of an ndim array."""
    spec = [None] * ndim
    spec[axis_index] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))
