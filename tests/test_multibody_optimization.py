"""multibody/optimization tests: centroidal momentum, quaternion
integration, static equilibrium (reference: multibody/optimization/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.math import rotations
from drake_tpu.multibody import optimization as mopt
from drake_tpu.multibody.model import FLOATING, PRISMATIC, ModelBuilder

F64 = jnp.float64


def _free_ball(mass=0.5, radius=0.05):
    b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
    b.add_body(
        "ball", parent=None, joint_type=FLOATING, mass=mass,
        inertia_com=np.eye(3) * 0.4 * mass * radius**2,
    )
    return b.build(F64)


class TestCentroidalMomentum:
    def test_translating_body(self):
        """A single free body translating at v: h_lin = m v, h_ang = 0."""
        model, params = _free_ball(mass=2.0)
        q = jnp.asarray([1.0, 0, 0, 0, 0.3, -0.2, 1.1], F64)
        v = jnp.asarray([0, 0, 0, 0.5, -0.25, 2.0], F64)  # [w; v]
        h = mopt.centroidal_momentum(model, params, q, v)
        np.testing.assert_allclose(h[:3], 0.0, atol=1e-12)
        np.testing.assert_allclose(h[3:], 2.0 * np.array([0.5, -0.25, 2.0]),
                                   atol=1e-12)

    def test_spinning_body(self):
        """Pure spin about the CoM: h_ang = I w, h_lin = 0."""
        model, params = _free_ball(mass=0.5, radius=0.05)
        I = 0.4 * 0.5 * 0.05**2
        q = jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], F64)
        w = np.array([0.0, 0.0, 3.0])
        v = jnp.asarray(np.concatenate([w, np.zeros(3)]), F64)
        h = mopt.centroidal_momentum(model, params, q, v)
        np.testing.assert_allclose(h[:3], I * w, atol=1e-12)
        np.testing.assert_allclose(h[3:], 0.0, atol=1e-12)

    def test_orbiting_point_mass(self):
        """Mass at radius r moving tangentially: |h_ang| = m r v about CoM
        of the two-body system."""
        b = ModelBuilder(gravity=(0.0, 0.0, 0.0))
        b.add_body("a", parent=None, joint_type=FLOATING, mass=1.0,
                   inertia_com=np.eye(3) * 1e-8)
        model, params = b.build(F64)
        q = jnp.asarray([1.0, 0, 0, 0, 1.0, 0.0, 0.0], F64)  # at x = 1
        v = jnp.asarray([0, 0, 0, 0.0, 2.0, 0.0], F64)  # v = 2 in +y
        h = mopt.centroidal_momentum(model, params, q, v)
        # Single body: momentum about its own CoM -> h_ang ~ 0.
        np.testing.assert_allclose(h[:3], 0.0, atol=1e-8)
        np.testing.assert_allclose(h[3:], [0.0, 2.0, 0.0], atol=1e-12)


class TestQuaternionIntegration:
    def test_exact_integration_zero_residual(self):
        z1 = rotations.quat_normalize(jnp.asarray([0.9, 0.1, -0.3, 0.2], F64))
        w = jnp.asarray([0.4, -1.2, 0.7], F64)
        dt = 0.01
        z2 = rotations.quat_integrate(z1, w, dt)
        r = mopt.quaternion_integration_residual(z1, z2, w, dt)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)

    def test_negated_quaternion_also_zero(self):
        z1 = rotations.quat_normalize(jnp.asarray([0.9, 0.1, -0.3, 0.2], F64))
        w = jnp.asarray([0.4, -1.2, 0.7], F64)
        dt = 0.01
        z2 = -rotations.quat_integrate(z1, w, dt)  # double cover
        r = mopt.quaternion_integration_residual(z1, z2, w, dt)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)

    def test_wrong_rate_nonzero(self):
        z1 = rotations.quat_identity(F64)
        w = jnp.asarray([0.0, 0.0, 1.0], F64)
        z2 = rotations.quat_integrate(z1, w, 0.1)
        r = mopt.quaternion_integration_residual(z1, z2, 2.0 * w, 0.1)
        assert float(jnp.linalg.norm(r)) > 1e-3


class TestStaticEquilibrium:
    def _vertical_box_world(self, mass=2.0, half=0.1):
        """1-dof vertical prismatic box above a halfspace ground."""
        b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
        b.add_body(
            "box", parent=None, joint_type=PRISMATIC, axis=(0, 0, 1),
            mass=mass, inertia_com=np.eye(3) * 2e-3,
        )
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=0.5),
            CollisionGeometry(name="box", body=0,
                              shape=sh.Box((half, half, half)),
                              friction=0.5, stiffness=1e6, dissipation=0.1),
        ]
        scene = CollisionScene.build(geoms)
        return model, params, scene, mass, half

    def test_residual_balanced_at_weight(self):
        model, params, scene, mass, half = self._vertical_box_world()
        q = jnp.asarray([half], F64)  # resting exactly on the ground
        contact = scene.query(model, params, q)
        nc = contact.phi.shape[0]
        # Box-halfspace manifold: weight split across the contact points.
        fz = 9.81 * mass / nc
        f = jnp.tile(jnp.asarray([0.0, 0.0, fz], F64), (nc, 1))
        r = mopt.static_equilibrium_residual(model, params, scene, q, f)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)

    def test_solve_finds_resting_height(self):
        model, params, scene, mass, half = self._vertical_box_world()
        # Box() takes full side lengths: rest height = half side = half/2.
        # Guess slightly penetrating — the compliant force law needs live
        # contact gradients (see StaticEquilibriumProblem docstring).
        rest = half / 2
        prob = mopt.StaticEquilibriumProblem(
            model, params, scene, q_guess=jnp.asarray([rest - 1e-3], F64),
            q_bounds=([rest - 0.03], [rest + 0.05]),
        )
        res = prob.Solve()
        assert res.is_success()
        q = res.GetSolution(prob.q_var)
        q = float(np.atleast_1d(q)[0])
        assert q == pytest.approx(rest, abs=1e-3)
        f = np.asarray(prob.GetContactForces(res))
        assert f[:, 2].sum() == pytest.approx(9.81 * mass, rel=1e-3)
        assert np.all(f[:, 2] >= -1e-8)


class TestSlidingFrictionComplementarity:
    def test_sliding_split_consistent(self):
        mu = 0.6
        fn = 10.0
        v_t = jnp.asarray([0.5, 0.0], F64)
        f_sliding = jnp.asarray([-mu * fn, 0.0, fn], F64)
        f_static = jnp.zeros(3, F64)
        f_total = f_sliding + f_static
        r = mopt.sliding_friction_complementarity_residual(
            f_total, f_static, f_sliding, v_t, mu
        )
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)

    def test_static_force_with_slip_flagged(self):
        mu = 0.6
        v_t = jnp.asarray([0.5, 0.0], F64)
        f_static = jnp.asarray([1.0, 0.0, 5.0], F64)
        f_sliding = jnp.zeros(3, F64)
        r = mopt.sliding_friction_complementarity_residual(
            f_static + f_sliding, f_static, f_sliding, v_t, mu
        )
        # complementarity rows (last 3) must be violated
        assert float(jnp.linalg.norm(r[-3:])) > 0.1


class TestManipulatorEquation:
    def _world(self):
        b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
        b.add_body(
            "box", parent=None, joint_type=PRISMATIC, axis=(0, 0, 1),
            mass=2.0, inertia_com=np.eye(3) * 2e-3,
        )
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=0.5),
            CollisionGeometry(name="box", body=0,
                              shape=sh.Box((0.1, 0.1, 0.1)),
                              friction=0.5, stiffness=1e6, dissipation=0.1),
        ]
        return model, params, CollisionScene.build(geoms)

    def test_rest_balance(self):
        """At rest with the weight carried by the contacts, vdot = 0."""
        model, params, scene = self._world()
        q = jnp.asarray([0.1], F64)
        v = jnp.zeros(1, F64)
        contact = scene.query(model, params, q)
        nc = contact.phi.shape[0]
        f = jnp.tile(jnp.asarray([0.0, 0.0, 9.81 * 2.0 / nc], F64), (nc, 1))
        r = mopt.manipulator_equation_residual(
            model, params, scene, q, v, jnp.zeros(1, F64), f
        )
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)

    def test_free_fall_needs_gravity_acceleration(self):
        """With zero contact force the residual vanishes iff vdot = -g."""
        model, params, scene = self._world()
        q = jnp.asarray([0.1], F64)
        v = jnp.zeros(1, F64)
        contact = scene.query(model, params, q)
        f = jnp.zeros((contact.phi.shape[0], 3), F64)
        r = mopt.manipulator_equation_residual(
            model, params, scene, q, v, jnp.asarray([-9.81], F64), f
        )
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)

    def test_contact_wrench_totals_weight(self):
        """The wrench the resting contact set applies to the box equals its
        weight (force) with zero net moment about the symmetric patch."""
        model, params, scene = self._world()
        q = jnp.asarray([0.1], F64)
        contact = scene.query(model, params, q)
        nc = contact.phi.shape[0]
        f = jnp.tile(jnp.asarray([0.0, 0.0, 9.81 * 2.0 / nc], F64), (nc, 1))
        w = mopt.contact_wrench_on_body(model, params, scene, q, f, body=0)
        np.testing.assert_allclose(float(w[5]), 9.81 * 2.0, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(w[3:5]), 0.0, atol=1e-12)
        # Symmetric support patch centred on the box: zero x/y moment.
        np.testing.assert_allclose(np.asarray(w[:2]), 0.0, atol=1e-9)
