"""Parameter transforms (bijectors) and the Param container.

The reference constrains positive hyperparameters with a shifted-softplus bijector:
``value = lower + softplus(raw)`` with lower = 5e-3 (fp32) / 1e-6 (fp64)
(reference: cglb/backend/tensorflow/interface.py:167-197 via gpflow.utilities.positive;
cglb/backend/pytorch/interface.py:90-117).  We implement the same transform as pure
functions so gradients flow through ``jax.grad`` with no framework Parameter objects.

``Param`` couples an unconstrained ``raw`` array with a static transform tag and a
static ``trainable`` flag.  Optimizers flatten only trainable raw leaves; constrained
values are materialized inside the jitted objective via ``.value``.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from .struct import pytree_dataclass, static_field

__all__ = ["Param", "positive", "identity", "softplus", "softplus_inverse"]


def softplus(x):
    return jnp.logaddexp(x, 0.0)


def softplus_inverse(y):
    # Stable inverse: log(e^y - 1) = y + log(1 - e^(-y)) = y + log(-expm1(-y)).
    return y + jnp.log(-jnp.expm1(-y))


_TRANSFORMS = {}


def _register(name):
    def deco(cls):
        _TRANSFORMS[name] = cls
        return cls

    return deco


class Transform:
    """Static (hashable) transform descriptor."""

    def forward(self, raw):
        raise NotImplementedError

    def inverse(self, value):
        raise NotImplementedError


@_register("identity")
class Identity(Transform):
    def forward(self, raw):
        return raw

    def inverse(self, value):
        return value

    def __repr__(self):
        return "identity"

    def __hash__(self):
        return hash("identity")

    def __eq__(self, other):
        return isinstance(other, Identity)


@_register("positive")
class Positive(Transform):
    """value = lower + softplus(raw)."""

    def __init__(self, lower: float = 0.0):
        self.lower = float(lower)

    def forward(self, raw):
        return self.lower + softplus(raw)

    def inverse(self, value):
        return softplus_inverse(value - self.lower)

    def __repr__(self):
        return f"positive(lower={self.lower:g})"

    def __hash__(self):
        return hash(("positive", self.lower))

    def __eq__(self, other):
        return isinstance(other, Positive) and other.lower == self.lower


def identity() -> Identity:
    return Identity()


def positive(lower: float = 0.0) -> Positive:
    return Positive(lower)


@pytree_dataclass
class Param:
    """Unconstrained parameter with a static transform.

    raw:        the unconstrained array (the pytree leaf that optimizers see)
    transform:  static bijector; constrained value = transform.forward(raw)
    trainable:  static flag; non-trainable params are excluded from flattening
    """

    raw: jnp.ndarray
    transform: Transform = static_field(default_factory=Identity)
    trainable: bool = static_field(default=True)

    @property
    def value(self):
        return self.transform.forward(self.raw)

    @staticmethod
    def create(
        value: Union[float, np.ndarray, jnp.ndarray],
        transform: Transform = None,
        trainable: bool = True,
        dtype=None,
    ) -> "Param":
        transform = transform if transform is not None else Identity()
        value = jnp.asarray(value, dtype=dtype)
        raw = jnp.asarray(transform.inverse(value), dtype=value.dtype)
        return Param(raw=raw, transform=transform, trainable=trainable)

    @staticmethod
    def positive(value, lower: float = 0.0, trainable: bool = True, dtype=None) -> "Param":
        return Param.create(value, positive(lower), trainable=trainable, dtype=dtype)
