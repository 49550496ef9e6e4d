"""Device-mesh utilities: SPMD scenario parallelism over ICI.

The reference's only batch parallelism is a thread pool over cloned Contexts
(reference: systems/analysis/batch_eval.h:48,89, monte_carlo.h:138).  The
TPU-native equivalent shards a batch axis over a ``jax.sharding.Mesh``: XLA
inserts the collectives, the batch rides ICI across chips and DCN across
hosts.  These helpers centralize mesh construction and batch sharding so
every harness (MPC, rollout, trajopt) scales the same way.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shapes: Optional[dict] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a mesh.  Default: 1-D 'batch' axis over all devices.

    axis_shapes: e.g. {"batch": 4, "model": 2}; -1 means 'fill'.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_shapes is None:
        axis_shapes = {"batch": n}
    names = tuple(axis_shapes)
    shape = []
    fill_idx = None
    prod = 1
    for i, (k, v) in enumerate(axis_shapes.items()):
        if v == -1:
            fill_idx = i
            shape.append(1)
        else:
            shape.append(v)
            prod *= v
    if fill_idx is not None:
        shape[fill_idx] = n // prod
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, names)


def shard_batch(x, mesh: Mesh, axis: str = "batch"):
    """Place a batched pytree with its leading axis sharded over `axis`."""
    spec = P(axis)

    def place(leaf):
        sharding = NamedSharding(mesh, P(*([axis] + [None] * (leaf.ndim - 1))))
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(place, x)


def replicate(x, mesh: Mesh):
    """Replicate a pytree across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, sharding), x)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "batch") -> NamedSharding:
    return NamedSharding(mesh, P(*([axis] + [None] * (ndim - 1))))
