"""Sharded streaming kernel matvec: Pallas tiles + shard_map over the mesh.

The large-N story (SURVEY.md sections 5.7-5.8): the reference streams K@v on
one GPU via KeOps and has no multi-device matvec.  Here the column space of
K(X, X) is sharded over the mesh's data axis; each device runs the streaming
Pallas kernel on its column block against the full row space:

    out[:, cols_d] = p @ K(X_all, X_cols_d)      (per device, K never in HBM)

then the result is reassembled over ICI by shard_map's output spec.  Memory
per chip: the packed representation of X (~70 bytes/row) + CG vectors —
houseelectric (N~1.6M) is ~120 MB/chip of packed X, far under HBM, with the
O(N^2) compute split across the slice.

The packed tensors are prepared ONCE per operator construction (outside the
CG while_loop); the per-device column slice is what shard_map hands each
device.  Gradients: the custom_vjp inside shard_map yields per-device partial
var/ls cotangents that shard_map's reverse psums automatically.
"""

from __future__ import annotations

import functools
from typing import Callable

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import matvec_pallas as _mv
from .mesh import DATA_AXIS

__all__ = ["make_sharded_streaming_operator"]


def make_sharded_streaming_operator(mesh: Mesh, kernel, X, sigma_sq,
                                    block_i: int = 512, block_j: int = 512,
                                    interpret: bool = None) -> Callable:
    """Matvec closure p [B, N] -> p (K + s2 I) [B, N], column-sharded.

    Arbitrary N: the packed tensors are zero-padded up to a multiple of
    mesh_size * block (padded rows are harmless — p is zero there and the
    padded output columns are sliced off, exactly as in the single-device
    kernel).
    """
    if interpret is None:
        # decide per-MESH, not per-process: the process's default device may be
        # a TPU while the mesh is virtual CPU devices (or vice versa)
        platform = mesh.devices.flat[0].platform
        interpret = platform not in ("tpu", "axon")
    _mv._check_blocks(block_i, block_j, interpret)
    if block_i != block_j:
        raise ValueError("sharded streaming operator requires block_i == "
                         f"block_j (got {block_i}, {block_j})")
    n_dev = mesh.shape[DATA_AXIS]
    n = X.shape[0]
    var = kernel.variance.value
    ls = kernel.lengthscales.value
    family = _mv._family_of(kernel)
    spec = _mv._Spec(family=family, block_i=block_i, block_j=block_j,
                     interpret=interpret, contract="highest")
    prep = _mv._prepare(block_i, block_j, X, ls, family)
    n_pad = prep.dleft.shape[0]
    stride = n_dev * block_j
    if n_pad % stride != 0:
        target = -(-n_pad // stride) * stride
        prep = _mv._Prepared(*(_mv._pad_rows(a, target) for a in prep))
        n_pad = target
    cols_per_dev = n_pad // n_dev

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, None), P(DATA_AXIS, None), P(), P()),
        out_specs=P(None, DATA_AXIS),
        # pallas_call outputs carry no varying-mesh-axis metadata
        check_vma=False,
    )
    def _sharded(p, rows, cols, var_, ls_):
        return _mv._streaming_matvec(
            spec, cols_per_dev, rows, cols, var_, ls_, p
        )

    def matvec(p):
        pf = _mv._pad_cols(p, n_pad)
        out = _sharded(pf, prep, prep, var, ls)
        return out[:, :n].astype(p.dtype) + sigma_sq * p

    return matvec
