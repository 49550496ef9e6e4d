"""Monte-Carlo simulation: batched random rollouts over the device mesh.

Re-derivation of the reference's MonteCarloSimulation / RandomSimulation
(reference: systems/analysis/monte_carlo.h:86,138 — a thread pool over
cloned Contexts).  The TPU version vmaps the scenario over jax.random keys
and shards the batch axis — thousands of rollouts per chip instead of one
per core.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_tpu.parallel.mesh import batch_sharding, shard_batch


class MonteCarloResult(NamedTuple):
    outputs: jnp.ndarray  # (num_samples, ...) per-sample scalar output
    keys: jnp.ndarray  # the PRNG keys used (for reproducing any sample)


def monte_carlo_simulation(
    scenario: Callable,
    num_samples: int,
    seed: int = 0,
    mesh=None,
) -> MonteCarloResult:
    """Run `scenario(key) -> output` for num_samples random keys.

    Mirrors MonteCarloSimulation(make_simulator, output, final_time, n):
    the scenario function owns the rollout; randomness comes from the key
    (the RandomSource role).  With `mesh`, the sample axis is sharded.
    """
    keys = jax.random.split(jax.random.PRNGKey(seed), num_samples)
    fn = jax.vmap(scenario)
    if mesh is not None:
        keys = shard_batch(keys, mesh)
        out_shapes = jax.eval_shape(fn, keys)
        fn = jax.jit(
            fn,
            out_shardings=jax.tree_util.tree_map(
                lambda leaf: batch_sharding(mesh, leaf.ndim), out_shapes
            ),
        )
    else:
        fn = jax.jit(fn)
    outputs = fn(keys)
    return MonteCarloResult(outputs=outputs, keys=keys)


def random_simulation(scenario: Callable, seed: int = 0):
    """Single random rollout (RandomSimulation role)."""
    return scenario(jax.random.PRNGKey(seed))
