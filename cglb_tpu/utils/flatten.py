"""Flattening trainable parameters to a single fp64 vector and back.

Used by the scipy L-BFGS-B bridge (the reference flattens torch params the same
way at cglb/backend/pytorch/optimizer.py:63-93) and for masking non-trainable
leaves in on-device optimizers.  Trainability is carried statically by each
``Param`` (transforms.Param.trainable), so the partition is decided at trace time.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import numpy as np

from ..transforms import Param

__all__ = ["flatten_trainable", "make_unflatten", "tree_params",
           "mask_untrainable_grads", "parameter_dict"]


def _param_leaves(tree) -> List[Tuple[tuple, Param]]:
    """All (path, Param) pairs in the tree, in deterministic order."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: isinstance(x, Param)
    )[0]:
        if isinstance(leaf, Param):
            out.append((path, leaf))
    return out


def tree_params(tree) -> List[Tuple[str, Param]]:
    """Named parameters, gpflow-parameter_dict-style keys (reference:
    tensorflow/interface.py:153-154)."""

    def name_of(path):
        parts = []
        for p in path:
            if hasattr(p, "name"):
                parts.append(str(p.name))
            elif hasattr(p, "key"):
                parts.append(str(p.key))
            else:
                parts.append(str(p))
        return "." + ".".join(parts)

    return [(name_of(path), p) for path, p in _param_leaves(tree)]


def parameter_dict(tree) -> dict:
    """Constrained parameter values keyed by dotted path (for save/metrics)."""
    return {name: np.asarray(p.value) for name, p in tree_params(tree)}


def flatten_trainable(tree) -> np.ndarray:
    """Concatenate all trainable raw leaves into one fp64 host vector."""
    chunks = []
    for _, p in _param_leaves(tree):
        if p.trainable:
            chunks.append(np.asarray(p.raw, dtype=np.float64).ravel())
    if not chunks:
        return np.zeros((0,), dtype=np.float64)
    return np.concatenate(chunks)


def make_unflatten(tree) -> Callable[[np.ndarray], object]:
    """Build vector -> pytree (replacing trainable raws; everything else kept)."""
    leaves, treedef = jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: isinstance(x, Param)
    )
    specs = []  # (leaf_index, shape, size) for trainable Params
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, Param) and leaf.trainable:
            shape = np.shape(leaf.raw)
            specs.append((i, shape, int(np.prod(shape)) if shape else 1))

    def unflatten(vector):
        import jax.numpy as jnp

        new_leaves = list(leaves)
        offset = 0
        for i, shape, size in specs:
            chunk = vector[offset : offset + size]
            offset += size
            raw = jnp.asarray(np.reshape(chunk, shape), dtype=new_leaves[i].raw.dtype)
            new_leaves[i] = Param(
                raw=raw,
                transform=new_leaves[i].transform,
                trainable=new_leaves[i].trainable,
            )
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    return unflatten


def flatten_grads_like(tree, grads) -> np.ndarray:
    """Flatten the grad pytree (same structure as tree) over trainable raws."""
    gleaves = jax.tree_util.tree_flatten(
        grads, is_leaf=lambda x: isinstance(x, Param)
    )[0]
    leaves = jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: isinstance(x, Param)
    )[0]
    chunks = []
    for leaf, gleaf in zip(leaves, gleaves):
        if isinstance(leaf, Param) and leaf.trainable:
            chunks.append(np.asarray(gleaf.raw, dtype=np.float64).ravel())
    if not chunks:
        return np.zeros((0,), dtype=np.float64)
    return np.concatenate(chunks)


def assign_parameters(tree, values: dict):
    """Return a copy of `tree` with Params assigned from a {dotted-name: value}
    dict of *constrained* values; keys not present are kept (reference load
    semantics with key-intersection warnings: tensorflow/interface.py:366-383)."""
    import warnings

    import jax.numpy as jnp

    names = dict(tree_params(tree))
    missing = set(names.keys()) - set(values.keys())
    if missing:
        warnings.warn(f"Cannot load some parameters: {sorted(missing)}")

    leaves, treedef = jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: isinstance(x, Param)
    )
    named = tree_params(tree)
    name_iter = iter(named)
    new_leaves = []
    for leaf in leaves:
        if isinstance(leaf, Param):
            name, _ = next(name_iter)
            if name in values:
                val = jnp.asarray(values[name], dtype=leaf.raw.dtype)
                val = jnp.reshape(val, np.shape(leaf.value))
                raw = jnp.asarray(leaf.transform.inverse(val), dtype=leaf.raw.dtype)
                leaf = Param(raw=raw, transform=leaf.transform,
                             trainable=leaf.trainable)
            new_leaves.append(leaf)
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def mask_untrainable_grads(tree, grads):
    """Zero grads of non-trainable Params (for on-device optimizers)."""
    import jax.numpy as jnp

    def mask(p, g):
        if isinstance(p, Param) and not p.trainable:
            return Param(raw=jnp.zeros_like(g.raw), transform=g.transform,
                         trainable=g.trainable)
        return g

    return jax.tree_util.tree_map(
        mask, tree, grads, is_leaf=lambda x: isinstance(x, Param)
    )
