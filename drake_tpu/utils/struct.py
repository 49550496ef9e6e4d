"""Pytree dataclasses: the TPU-native replacement for Drake's Context/parameter plumbing.

Drake carries state+params+time in a mutable ``Context<T>`` tree with cache
invalidation (reference: systems/framework/context.h:35, cache.h).  Under XLA
everything is a pure function of immutable inputs, so the idiomatic equivalent
is a frozen dataclass registered as a JAX pytree: state and parameters flow in
and out of jitted functions, XLA does the memoization (CSE) that Drake's
dependency tracker does at runtime.
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a JAX pytree node.

    All fields are treated as pytree children (traced data).  Use
    ``static_field()`` for fields that must stay Python-level metadata
    (shapes, names, solver switches) and therefore act as jit cache keys.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def _replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = _replace
    return cls


def static_field(**kwargs):
    """A dataclass field excluded from the pytree (jit-static metadata)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs):
    """A regular (traced) dataclass field, for symmetry with static_field."""
    return dataclasses.field(**kwargs)
