"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed compute (SURVEY.md §2.9 — thread pools
only); the TPU build's scaling axis is scenario batching over a
jax.sharding.Mesh.  These tests pin down: batch sharding produces identical
numerics to single-device, collectives work under shard_map, and the batched
MPC/trajopt paths actually run sharded (the dryrun_multichip contract).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from drake_tpu.models import pendulum, quadrotor
from drake_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from drake_tpu.systems import base as sysbase
from drake_tpu.systems import simulator

F32 = jnp.float32


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"batch": 8})


class TestMesh:
    def test_make_mesh_shapes(self, mesh):
        assert mesh.devices.shape == (8,)
        m2 = make_mesh({"dp": 4, "mp": -1})
        assert m2.devices.shape == (4, 2)

    def test_shard_batch_placement(self, mesh):
        x = jnp.arange(16.0).reshape(16, 1)
        xs = shard_batch(x, mesh)
        assert xs.sharding.spec == P("batch", None)
        np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


class TestShardedRollouts:
    def test_sharded_batch_rollout_matches_single_device(self, mesh):
        system = pendulum.make_system(pendulum.default_params(F32))
        params = system.default_params
        rng = np.random.default_rng(0)
        x0s = jnp.asarray(rng.normal(size=(16, 2)) * 0.3, F32)
        us = jnp.zeros((16, 100, 1), F32)

        def batched(x0s, us):
            return jax.vmap(
                lambda x0, u: simulator.simulate(system, params, x0, u, 1e-2)[0]
            )(x0s, us)

        ref = jax.jit(batched)(x0s, us)
        x0s_sh = shard_batch(x0s, mesh)
        us_sh = shard_batch(us, mesh)
        out = jax.jit(
            batched, out_shardings=batch_sharding(mesh, 3)
        )(x0s_sh, us_sh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
        # Verify the output is actually sharded over the mesh.
        assert len(out.sharding.device_set) == 8

    def test_shard_map_psum_statistics(self, mesh):
        """Cross-scenario reductions via psum under shard_map — the KKT/
        statistics-reduction pattern of the MPC harness."""
        try:  # jax >= 0.8
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map

        system = quadrotor.make_system(quadrotor.default_params(F32))
        params = system.default_params
        u_h = quadrotor.hover_input(params)
        rng = np.random.default_rng(1)
        x0s = jnp.asarray(rng.normal(size=(16, 12)) * 0.05, F32)

        def shard_fn(x0_local):
            # Local rollouts, then a global mean cost via psum over the mesh.
            def cost(x0):
                us = jnp.tile(u_h[None], (50, 1))
                xs, _ = simulator.simulate(system, params, x0, us, 1e-2)
                return jnp.sum(xs[-1] ** 2)

            local = jax.vmap(cost)(x0_local)
            total = jax.lax.psum(jnp.sum(local), "batch")
            count = jax.lax.psum(local.shape[0] * 1.0, "batch")
            return local, jnp.broadcast_to(total / count, local.shape[:1])

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=P("batch"),
            out_specs=(P("batch"), P("batch")),
        )
        local, global_mean = jax.jit(fn)(shard_batch(x0s, mesh))
        np.testing.assert_allclose(
            float(global_mean[0]), float(jnp.mean(local)), rtol=1e-5
        )

    def test_weak_scaling_shape(self, mesh):
        """Per-device work stays constant as the batch grows with devices —
        the weak-scaling contract (BASELINE.json >=80% at 2 hosts)."""
        system = pendulum.make_system(pendulum.default_params(F32))
        params = system.default_params

        def batched(x0s):
            us = jnp.zeros((x0s.shape[0], 50, 1), F32)
            return jax.vmap(
                lambda x0, u: simulator.simulate(system, params, x0, u, 1e-2)[0][-1]
            )(x0s, us)

        for per_dev in (2, 4):
            n = per_dev * 8
            x0s = shard_batch(jnp.ones((n, 2), F32) * 0.1, mesh)
            out = jax.jit(batched, out_shardings=batch_sharding(mesh, 2))(x0s)
            assert out.shape == (n, 2)
            assert len(out.sharding.device_set) == 8


class TestMonteCarlo:
    def test_monte_carlo_batched(self, mesh):
        """MonteCarloSimulation analog: random pendulum drops, sharded."""
        from drake_tpu.analysis.monte_carlo import monte_carlo_simulation
        from drake_tpu.models import pendulum

        system = pendulum.make_system(pendulum.default_params(F32))
        params = system.default_params

        def scenario(key):
            x0 = 0.5 * jax.random.normal(key, (2,), F32)
            us = jnp.zeros((200, 1), F32)
            xs, _ = simulator.simulate(system, params, x0, us, 1e-2)
            return jnp.max(jnp.abs(xs[:, 0]))  # peak swing angle

        res = monte_carlo_simulation(scenario, num_samples=32, mesh=mesh)
        assert res.outputs.shape == (32,)
        assert bool(jnp.all(jnp.isfinite(res.outputs)))
        # Deterministic reproduction of one sample.
        v = scenario(res.keys[7])
        np.testing.assert_allclose(float(v), float(res.outputs[7]), rtol=1e-6)
