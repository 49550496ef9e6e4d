"""Stochastic scenario schema: distribution-valued config fields.

Re-derivation of the reference's common/schema/stochastic.h: scenario
YAML fields that are either deterministic values or declared
distributions, sampled into concrete values with a PRNG key.  TPU shape:
`sample` is jit/vmap-able (vmap the key to realize scenario batches — the
MonteCarloSimulation input pattern).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Deterministic:
    value: Any

    def sample(self, key):
        return jnp.asarray(self.value)

    def mean(self):
        return jnp.asarray(self.value)


@dataclasses.dataclass(frozen=True)
class Gaussian:
    mean_value: Any
    stddev: Any

    def sample(self, key):
        m = jnp.asarray(self.mean_value, jnp.float32)
        s = jnp.asarray(self.stddev, jnp.float32)
        return m + s * jax.random.normal(key, jnp.shape(m))

    def mean(self):
        return jnp.asarray(self.mean_value)


@dataclasses.dataclass(frozen=True)
class Uniform:
    min_value: Any
    max_value: Any

    def sample(self, key):
        lo = jnp.asarray(self.min_value, jnp.float32)
        hi = jnp.asarray(self.max_value, jnp.float32)
        return jax.random.uniform(
            key, jnp.shape(lo), minval=lo, maxval=hi
        )

    def mean(self):
        return 0.5 * (
            jnp.asarray(self.min_value) + jnp.asarray(self.max_value)
        )


@dataclasses.dataclass(frozen=True)
class UniformDiscrete:
    values: Sequence[float]

    def sample(self, key):
        vals = jnp.asarray(self.values, jnp.float32)
        i = jax.random.randint(key, (), 0, vals.shape[0])
        return vals[i]

    def mean(self):
        return jnp.mean(jnp.asarray(self.values))


Distribution = Union[Deterministic, Gaussian, Uniform, UniformDiscrete]

_TAGS = {
    "deterministic": Deterministic,
    "gaussian": Gaussian,
    "uniform": Uniform,
    "uniform_discrete": UniformDiscrete,
}


def to_yaml_value(d: Distribution):
    """Distribution -> the reference's YAML tag convention
    (!Gaussian {mean: ..., stddev: ...} expressed as a tagged map)."""
    if isinstance(d, Deterministic):
        return d.value
    name = type(d).__name__.lower()
    if isinstance(d, UniformDiscrete):
        name = "uniform_discrete"
    return {"_dist": name, **dataclasses.asdict(d)}


def from_yaml_value(v) -> Distribution:
    """Parse a YAML value: plain scalars/lists are Deterministic; tagged
    maps become their distribution."""
    if isinstance(v, dict) and "_dist" in v:
        v = dict(v)
        cls = _TAGS[v.pop("_dist")]
        return cls(**v)
    return Deterministic(v)


def sample_tree(tree, key):
    """Sample every Distribution leaf of a pytree-of-(distributions|values)
    with split keys; non-distribution leaves pass through."""
    leaves, treedef = jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: isinstance(x, tuple(_TAGS.values()))
    )
    keys = jax.random.split(key, len(leaves))
    out = [
        leaf.sample(k)
        if isinstance(leaf, tuple(_TAGS.values()))
        else leaf
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)
