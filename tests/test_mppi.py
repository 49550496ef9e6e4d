"""MPPI sampling MPC tests.

Validates the rollout-reweighting controller on a classic nonlinear task
(pendulum swing-up, where gradient-free MPC must discover the pump-up) and
end-to-end through the coupled MPM+rigid pipeline — the config-5 MPC layer
(reference: contact-rich MPC over the GPU MPM plant, arXiv:2503.05046 /
deformable_driver.h:221-270), where sampling MPC is the method of choice
because the particle state is huge and contact is nonsmooth."""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.control import mppi
from drake_tpu.models import pendulum
from drake_tpu.systems import base as sysbase

F32 = jnp.float32
F64 = jnp.float64


class TestMppiPendulum:
    def test_swing_up(self):
        """MPPI swings the torque-limited pendulum to upright."""
        params = pendulum.default_params(F64)
        csys = pendulum.make_system(params)
        dsys = sysbase.discretize(csys, 0.05)

        def dyn(x, u):
            return dsys.g(params, x, u, 0.0)

        xg = jnp.array([jnp.pi, 0.0], F64)

        def running(x, u):
            e = x - xg
            return 10.0 * e[0] ** 2 + 0.1 * e[1] ** 2 + 0.01 * u[0] ** 2

        def final(x):
            e = x - xg
            return 100.0 * (e[0] ** 2 + e[1] ** 2)

        opts = mppi.MppiOptions(
            num_samples=128, temperature=2.0, noise_sigma=1.0,
            u_lower=jnp.array([-3.0]), u_upper=jnp.array([3.0]),
        )
        H = 30
        states, us, costs = jax.jit(
            lambda k: mppi.mppi_mpc_rollout(
                dyn, running, final, jnp.zeros(2, F64),
                jnp.zeros((H, 1), F64), k, num_steps=60, options=opts,
                iterations_per_step=2,
            )
        )(jax.random.PRNGKey(0))
        theta_end = float(states[-1, 0])
        assert abs(theta_end - np.pi) < 0.15, f"theta_end={theta_end}"
        # Torque limit respected by the applied controls.
        assert float(jnp.abs(us).max()) <= 3.0 + 1e-9

    def test_step_is_jittable_and_improves(self):
        params = pendulum.default_params(F64)
        dsys = sysbase.discretize(pendulum.make_system(params), 0.05)
        dyn = lambda x, u: dsys.g(params, x, u, 0.0)
        xg = jnp.array([jnp.pi, 0.0], F64)
        running = lambda x, u: 10.0 * jnp.sum((x - xg) ** 2) + 0.01 * u[0] ** 2
        final = lambda x: 100.0 * jnp.sum((x - xg) ** 2)
        opts = mppi.MppiOptions(num_samples=64, temperature=5.0, noise_sigma=1.5)
        u0 = jnp.zeros((20, 1), F64)
        c0 = mppi._rollout_cost(dyn, running, final, jnp.zeros(2, F64), u0)
        res = jax.jit(
            lambda k: mppi.mppi_step(
                dyn, running, final, jnp.zeros(2, F64), u0, k, opts
            )
        )(jax.random.PRNGKey(1))
        assert float(res.best_cost) < float(c0)


class TestMppiCoupledMpm:
    def test_paddle_pushes_blob_toward_goal(self):
        """Config-5 smoke: an actuated rigid paddle pushes an MPM blob
        toward a goal x-position via MPPI through CoupledWorld.step."""
        from drake_tpu.contact import coupled_plant
        from drake_tpu.geometry import shapes as sh
        from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
        from drake_tpu.mpm import coupling as cpl
        from drake_tpu.mpm import solver as mpm
        from drake_tpu.multibody.model import ModelBuilder

        b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
        b.add_body(
            "paddle", parent=None, joint_type="prismatic", mass=2.0,
            inertia_com=np.eye(3) * 1e-3, axis=(1, 0, 0), damping=5.0,
            joint_name="slide", X_PJ_xyz=(0.0, 0.5, 0.0),
        )
        model, params = b.build(F32)
        geoms = [
            CollisionGeometry(
                name="paddle", body=0,
                shape=sh.Box((0.02, 0.3, 0.3)), friction=0.5,
                stiffness=1e5, dissipation=0.1,
                p_BG=jnp.asarray([0.0, 0.0, 0.15], F32),
            ),
        ]
        scene = CollisionScene.build(geoms)
        grid = mpm.MpmConfig(
            grid_size=(32, 32, 32), dx=1.0 / 32, dt=5e-4, wall_width=2,
            youngs_modulus=3e4,
            max_active_blocks=32, block_capacity=128,
        )
        world = coupled_plant.CoupledWorld(
            model=model, scene=scene, mpm_config=grid,
            contact_params=cpl.MpmContactParams(
                stiffness=5e4, damping=100.0, friction=0.3
            ),
            coupled_geometries=(0,),
            substeps_per_step=4, time_step=2e-3,
        )
        # Small blob ahead of the paddle (paddle plane starts at x=0.3).
        particles = mpm.make_particle_block(
            grid, (0.35, 0.45, 0.1), (0.42, 0.55, 0.17)
        )
        state0 = coupled_plant.CoupledState(
            rigid=jnp.asarray([0.28, 0.0], F32), particles=particles
        )
        goal_x = 0.6

        def dyn(s, u):
            return world.step(params, s, u)

        def centroid_x(s):
            return jnp.mean(s.particles.x[:, 0])

        def running(s, u):
            return 50.0 * (centroid_x(s) - goal_x) ** 2 + 1e-4 * u[0] ** 2

        def final(s):
            return 200.0 * (centroid_x(s) - goal_x) ** 2

        opts = mppi.MppiOptions(
            num_samples=8, temperature=2.0, noise_sigma=4.0,
            u_lower=jnp.array([-10.0]), u_upper=jnp.array([10.0]),
        )
        states, us, costs = jax.jit(
            lambda k: mppi.mppi_mpc_rollout(
                dyn, running, final, state0, jnp.zeros((4, 1), F32), k,
                num_steps=6, options=opts,
            )
        )(jax.random.PRNGKey(0))
        assert bool(jnp.all(jnp.isfinite(states.rigid)))
        assert bool(jnp.all(jnp.isfinite(states.particles.x)))
        x0 = float(jnp.mean(particles.x[:, 0]))
        x_end = float(jnp.mean(states.particles.x[-1][:, 0]))
        # The paddle must have started pushing the blob toward the goal.
        assert x_end > x0 - 0.01
        assert float(costs[-1]) <= float(costs[0]) * 1.5
