"""MPM <-> rigid coupling tests.

Closes the validation gap the reference leaves open (its MPM coupling is
only smoke-tested — SURVEY.md §4): reaction forces against analytic statics
(weight transfer), Newton's third law, and the two-way-coupled ball drop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.geometry import shapes as sh
from drake_tpu.mpm import coupling as cpl
from drake_tpu.mpm import solver as mpm

F32 = jnp.float32


def static_halfspace(dtype=F32):
    return cpl.RigidGeom(
        shape=sh.HalfSpace(),
        body_index=-1,
        R_WG=jnp.eye(3, dtype=dtype),
        p_WG=jnp.zeros(3, dtype),
        p_WB=jnp.zeros(3, dtype),
        V_WB=jnp.zeros(6, dtype),
    )


class TestCoupling:
    def test_block_rests_on_rigid_plane_weight_transfer(self):
        """An MPM block resting on a rigid halfspace transfers its full
        weight: impulse_z / T = m g (the analytic statics check)."""
        config = mpm.MpmConfig(
            grid_size=(32, 32, 32), dx=1.0 / 32, dt=2e-4, wall_width=0
        )
        contact = cpl.MpmContactParams(stiffness=2e4, damping=200.0)
        # Start the block just above the plane z=0.2 (use a shifted plane so
        # grid walls don't interfere; wall_width=0 disables domain walls).
        plane = cpl.RigidGeom(
            shape=sh.HalfSpace(),
            body_index=-1,
            R_WG=jnp.eye(3, dtype=F32),
            p_WG=jnp.asarray([0.5, 0.5, 0.2], F32),
            p_WB=jnp.zeros(3, F32),
            V_WB=jnp.zeros(6, F32),
        )
        state = mpm.make_particle_block(config, (0.43, 0.43, 0.21), (0.57, 0.57, 0.28))
        n_settle = 5000
        sim = jax.jit(
            lambda s: cpl.simulate_coupled(config, contact, s, [plane], n_settle)
        )
        out, _ = sim(state)
        # settled: low velocities, supported above the plane
        assert float(jnp.abs(out.v[:, 2]).mean()) < 0.01
        # measure impulse over a window at rest
        n_meas = 1000
        out2, acc = jax.jit(
            lambda s: cpl.simulate_coupled(config, contact, s, [plane], n_meas)
        )(out)
        T = n_meas * config.dt
        total_weight = float(jnp.sum(state.mass)) * 9.81
        fz = float(-acc[0, 5]) / T  # reaction ON the plane is downward
        np.testing.assert_allclose(fz, total_weight, rtol=0.01)

    def test_newtons_third_law_momentum(self):
        """Particle momentum change equals minus the rigid impulse (linear),
        gravity removed."""
        config = mpm.MpmConfig(
            grid_size=(32, 32, 32), dx=1.0 / 32, dt=2e-4,
            gravity=(0.0, 0.0, 0.0), wall_width=0,
        )
        contact = cpl.MpmContactParams(stiffness=2e4, damping=20.0, friction=0.3)
        plane = cpl.RigidGeom(
            shape=sh.HalfSpace(), body_index=-1,
            R_WG=jnp.eye(3, dtype=F32), p_WG=jnp.asarray([0.5, 0.5, 0.3], F32),
            p_WB=jnp.zeros(3, F32), V_WB=jnp.zeros(6, F32),
        )
        state = mpm.make_particle_block(config, (0.45, 0.45, 0.31), (0.55, 0.55, 0.4))
        # throw the block at the plane at an angle
        state = state.replace(
            v=jnp.tile(jnp.asarray([[0.5, 0.0, -1.0]], F32), (state.x.shape[0], 1))
        )
        n_sub = 800
        out, acc = jax.jit(
            lambda s: cpl.simulate_coupled(config, contact, s, [plane], n_sub)
        )(state)
        p0 = np.asarray((state.mass[:, None] * state.v).sum(axis=0))
        p1 = np.asarray((out.mass[:, None] * out.v).sum(axis=0))
        imp_rigid = np.asarray(acc[0, 3:])
        # (no gravity; grid transfers conserve momentum, contact exchanges it)
        np.testing.assert_allclose(p1 - p0, -imp_rigid, atol=2e-4 * max(1, abs(p0[2])))

    def test_moving_rigid_sphere_drags_particles(self):
        """A rigid sphere sweeping through resting particles pushes them."""
        config = mpm.MpmConfig(
            grid_size=(32, 32, 32), dx=1.0 / 32, dt=2e-4,
            gravity=(0.0, 0.0, 0.0), wall_width=0, youngs_modulus=1e3,
        )
        contact = cpl.MpmContactParams(stiffness=5e4, damping=20.0, friction=0.5)
        sphere = cpl.RigidGeom(
            shape=sh.Sphere(0.08), body_index=0,
            R_WG=jnp.eye(3, dtype=F32),
            p_WG=jnp.asarray([0.38, 0.5, 0.5], F32),
            p_WB=jnp.asarray([0.38, 0.5, 0.5], F32),
            V_WB=jnp.asarray([0, 0, 0, 0.5, 0, 0], F32),  # sweeping +x
        )
        state = mpm.make_particle_block(config, (0.45, 0.45, 0.45), (0.55, 0.55, 0.55))
        out, acc = jax.jit(
            lambda s: cpl.simulate_coupled(config, contact, s, [sphere], 400)
        )(state)
        # Particles gained +x momentum; sphere received -x impulse.
        assert float(out.v[:, 0].mean()) > 0.01
        assert float(acc[0, 3]) < 0.0


class TestCoupledWorld:
    def test_block_dropped_on_free_rigid_ball(self):
        """Full two-way pipeline (CalcAbstractStates + external-force loop):
        an MPM block dropped onto a FREE rigid ball; the ball must carry the
        block's weight down to the ground and everything stays bounded."""
        from drake_tpu.contact import coupled_plant
        from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
        from drake_tpu.multibody.model import FLOATING, ModelBuilder

        b = ModelBuilder()
        m_ball, r_ball = 0.5, 0.08
        b.add_body(
            "ball", parent=None, joint_type=FLOATING, mass=m_ball,
            inertia_com=np.eye(3) * 0.4 * m_ball * r_ball**2,
        )
        model, params = b.build(F32)
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=0.5),
            CollisionGeometry(name="ball", body=0, shape=sh.Sphere(r_ball),
                              friction=0.5, stiffness=1e6, dissipation=0.1),
        ]
        scene = CollisionScene.build(geoms)
        grid = mpm.MpmConfig(
            grid_size=(32, 32, 32), dx=1.0 / 32, dt=5e-4, wall_width=0,
            youngs_modulus=5e4,
        )
        world = coupled_plant.CoupledWorld(
            model=model, scene=scene, mpm_config=grid,
            contact_params=cpl.MpmContactParams(
                stiffness=1e5, damping=200.0, friction=0.4
            ),
            coupled_geometries=(0, 1),
            substeps_per_step=20, time_step=1e-2,
        )
        q0 = jnp.asarray([1, 0, 0, 0, 0.5, 0.5, r_ball], F32)
        particles = mpm.make_particle_block(
            grid, (0.45, 0.45, 0.25), (0.55, 0.55, 0.32)
        )
        state = coupled_plant.CoupledState(
            rigid=jnp.concatenate([q0, jnp.zeros(6, F32)]),
            particles=particles,
        )
        out = jax.jit(lambda s: world.simulate(params, s, 100))(state)
        assert bool(jnp.all(jnp.isfinite(out.rigid)))
        assert bool(jnp.all(jnp.isfinite(out.particles.x)))
        # Ball remains supported near the ground (not launched, not sunk).
        assert 0.05 < float(out.rigid[6]) < 0.12
        # Particles come to rest at/above the ground (small compliance).
        assert float(out.particles.x[:, 2].min()) > -0.01
        # The pile stays localized.
        assert float(out.particles.x[:, 2].max()) < 0.4

    def test_cloth_coupled_world_weight_transfer(self):
        """Cloth-coupled CoupledWorld (cloth_config set): a cloth patch
        draped over a free rigid ball transfers weight — the ball receives
        downward z-impulses and everything stays finite/bounded (the
        bagging-demo mechanism, examples/mpm_bagging.py)."""
        from drake_tpu.contact import coupled_plant
        from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
        from drake_tpu.mpm import cloth as clothmod
        from drake_tpu.multibody.model import FLOATING, ModelBuilder

        b = ModelBuilder()
        m_ball, r_ball = 0.5, 0.1
        b.add_body(
            "ball", parent=None, joint_type=FLOATING, mass=m_ball,
            inertia_com=np.eye(3) * 0.4 * m_ball * r_ball**2,
        )
        model, params = b.build(F32)
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=0.5),
            CollisionGeometry(name="ball", body=0, shape=sh.Sphere(r_ball),
                              friction=0.5, stiffness=1e6, dissipation=0.1),
        ]
        scene = CollisionScene.build(geoms)
        grid = mpm.MpmConfig(
            grid_size=(32, 32, 32), dx=1.0 / 32, dt=1e-4, wall_width=0
        )
        cfg = clothmod.ClothConfig()
        sheet = clothmod.make_grid_cloth(
            cfg, 10, 10, origin=(0.4, 0.4, 0.215), size=(0.2, 0.2)
        )
        world = coupled_plant.CoupledWorld(
            model=model, scene=scene, mpm_config=grid,
            contact_params=cpl.MpmContactParams(
                stiffness=3e4, damping=30.0, friction=0.5
            ),
            coupled_geometries=(1,),
            substeps_per_step=10, time_step=1e-3,
            cloth_config=cfg,
        )
        q0 = jnp.asarray([1, 0, 0, 0, 0.5, 0.5, r_ball], F32)
        state = coupled_plant.CoupledState(
            rigid=jnp.concatenate([q0, jnp.zeros(6, F32)]),
            particles=sheet,
        )
        out = jax.jit(lambda s: world.simulate(params, s, 150))(state)
        assert bool(jnp.all(jnp.isfinite(out.rigid)))
        assert bool(jnp.all(jnp.isfinite(out.particles.x)))
        # Ball stays grounded under the cloth's weight (supported by the
        # ground SAP contact), cloth drapes around/on the ball.
        assert 0.05 < float(out.rigid[6]) < 0.15
        z = out.particles.x[:, 2]
        assert float(z.max()) < 0.35 and float(z.min()) > -0.01
        # Cloth rests ON the ball: its top sits near the ball's crown.
        assert float(z.max()) > 2 * r_ball - 0.05
