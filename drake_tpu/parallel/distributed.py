"""Multi-process (multi-host) execution tier: jax.distributed bring-up.

Reference parity note: the reference (g1n0st/drake) is a single-process
shared-memory library; its only "distributed" component is LCM UDP pub/sub
message passing (reference: lcm/drake_lcm.h:19), which is NOT a compute
fabric.  SURVEY.md §2.9 therefore prescribes the TPU-native scaling story
the reference lacks: a global `jax.sharding.Mesh` spanning processes
(hosts), scenario batches sharded over it, XLA collectives riding ICI
within a slice and DCN across hosts, brought up with the standard JAX
distributed runtime (`jax.distributed.initialize`).

This module is that bring-up tier:

  * :func:`initialize` — one call per process; on real TPU pods the
    coordinator/process topology comes from the environment, while for
    hermetic multi-process tests each process gets K *virtual CPU
    devices* (``--xla_force_host_platform_device_count``) and cross-
    process collectives run over the bundled Gloo transport — the same
    program XLA would partition over DCN on real hosts.
  * :func:`global_mesh` — a named mesh over ALL processes' devices.
  * :func:`shard_local_batch` — place each process's local scenario block
    into a globally-sharded array (`jax.make_array_from_process_local_data`),
    the multi-host analogue of `parallel.mesh.shard_batch`.
  * :func:`process_sum` — a shard_map psum across the global mesh; its
    reduction crosses the process boundary, which is the smoke test that
    the DCN-tier collective path actually works.

Checkpoint/restart across hosts composes with `io/checkpoint.py`: the
state pytree is process-local-shardable, so each process restores its
scenario block and `shard_local_batch` reassembles the global array.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    *,
    local_virtual_devices: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime for this process.

    On a real multi-host TPU slice, call with no arguments (topology is
    discovered from the TPU environment).  For hermetic multi-process CPU
    runs (tests, this machine), pass the explicit triple plus
    ``local_virtual_devices=K`` to give each process K virtual CPU
    devices; cross-process collectives then use the Gloo transport that
    ships with jaxlib.

    Must be called before any JAX backend initialization in the process.
    """
    if local_virtual_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count="
                f"{local_virtual_devices}"
            )
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def global_mesh(axis: str = "batch") -> Mesh:
    """1-D mesh over every device of every process, in process order."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def shard_local_batch(local_x, mesh: Mesh, axis: str = "batch"):
    """Assemble per-process local batches into one globally-sharded pytree.

    ``local_x`` leaves have leading dim = per-process batch; the returned
    global arrays have leading dim = per-process batch x process_count,
    sharded over ``axis``.  Single-process meshes degrade to device_put.
    """

    def place(leaf):
        spec = P(*([axis] + [None] * (leaf.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(leaf, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(leaf))

    return jax.tree_util.tree_map(place, local_x)


def process_sum(x, mesh: Mesh, axis: str = "batch"):
    """Sum a per-device scalar contribution across the WHOLE mesh.

    The psum inside shard_map reduces over every device of every process —
    on multi-host meshes this is the collective that rides DCN.  Returns a
    replicated scalar.
    """
    from jax.experimental.shard_map import shard_map

    f = shard_map(
        lambda v: jax.lax.psum(v.sum(), axis),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(),
    )
    return jax.jit(f)(x)
