"""Custom click parameter types mapping CLI strings to config classes.

Reference: cglb_experiments/click_types.py:47-155 — ParamTypes resolve strings
through the config registries, the dataset type loads + normalizes with the
process dtype and seed-as-split, and ``experiment_id`` builds the canonical
logdir leaf name.
"""

from __future__ import annotations

from dataclasses import dataclass
import click

from .. import config as _config
from ..backend import BACKENDS
from ..configs import (
    GPR_CONFIGS,
    INDUCING_VARIABLE_CONFIGS,
    KERNEL_CONFIGS,
    SGPR_CONFIGS,
)
from .datasets import DatasetBundle, get_dataset

__all__ = [
    "Context",
    "BackendType",
    "GPRConfigType",
    "SGPRConfigType",
    "KernelConfigType",
    "InducingVariableConfigType",
    "DatasetType",
    "experiment_id",
]


@dataclass(frozen=True)
class Context:
    backend: type
    seed: int
    logdir: str


class BackendType(click.ParamType):
    name = "backend"

    def convert(self, value, param, ctx):
        if isinstance(value, type):
            return value
        try:
            return BACKENDS[value]
        except KeyError:
            self.fail(f"Unknown backend {value!r} (available: {list(BACKENDS)})")


class _RegistryType(click.ParamType):
    registry: dict = {}

    def convert(self, value, param, ctx):
        if not isinstance(value, str):
            return value
        try:
            return self.registry[value]
        except KeyError:
            self.fail(
                f"Unknown {self.name} {value!r} (available: {list(self.registry)})"
            )


class GPRConfigType(_RegistryType):
    name = "gpr-model"
    registry = GPR_CONFIGS


class SGPRConfigType(_RegistryType):
    name = "sgpr-model"
    registry = SGPR_CONFIGS


class KernelConfigType(_RegistryType):
    name = "kernel"
    registry = KERNEL_CONFIGS


class InducingVariableConfigType(_RegistryType):
    name = "inducing-variable"
    registry = INDUCING_VARIABLE_CONFIGS


class DatasetType(click.ParamType):
    name = "dataset"

    def convert(self, value, param, ctx) -> DatasetBundle:
        if isinstance(value, DatasetBundle):
            return value
        main_ctx: Context = ctx.obj if ctx is not None else None
        seed = main_ctx.seed if main_ctx is not None else 0
        dtype = _config.default_float()
        try:
            return get_dataset(value, dtype=dtype, split=seed)
        except KeyError:
            self.fail(f"Unknown dataset {value!r}")


def experiment_id(
    model_name: str,
    kernel_name: str,
    num_inducing: int = None,
    float_type: str = "fp64",
    extra: str = "",
) -> str:
    """Canonical experiment leaf name (reference: click_types.py:125-155)."""
    parts = [model_name, kernel_name, float_type]
    if num_inducing is not None:
        parts.append(f"M{num_inducing}")
    if extra:
        parts.append(extra)
    return "-".join(parts)
