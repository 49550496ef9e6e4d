"""Continuous-time compliant point contact (the MultibodyPlant time_step=0
ContactModel-point path; reference multibody/plant/multibody_plant.h:134,
Hunt-Crossley dissipation + regularized friction).

Physics checks mirror the discrete SAP suite: settled normal force balances
gravity, Hunt-Crossley dissipation kills the rebound, and sliding friction
decelerates a cube at exactly mu*g.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.contact.plant import (
    contact_forces_continuous,
    make_continuous_contact_system,
)
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import FLOATING, ModelBuilder
from drake_tpu.systems import simulator

F64 = jnp.float64


def _ball_world(mu=0.5, radius=0.05, mass=0.5, k=5e4, d=0.5):
    b = ModelBuilder()
    b.add_body(
        "ball", parent=None, joint_type=FLOATING, mass=mass,
        inertia_com=np.eye(3) * 0.4 * mass * radius**2,
    )
    model, params = b.build(F64)
    # rigid ground (huge stiffness) so the series-combined k is the ball's
    geoms = [
        CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                          friction=mu, stiffness=1e14),
        CollisionGeometry(name="ball", body=0, shape=sh.Sphere(radius),
                          friction=mu, stiffness=k, dissipation=d),
    ]
    scene = CollisionScene.build(geoms)
    return model, params, scene, radius, mass


class TestContinuousContact:
    def test_settled_force_balances_gravity(self):
        model, params, scene, radius, mass = _ball_world()
        k = 5e4
        # static equilibrium: k * x = m g  =>  x = m g / k
        x_pen = mass * 9.81 / k
        q = jnp.asarray([1, 0, 0, 0, 0, 0, radius - x_pen], F64)
        v = jnp.zeros(6, F64)
        tau = contact_forces_continuous(model, params, scene, q, v)
        # generalized force on the floating dofs: [torque; force]
        np.testing.assert_allclose(float(tau[5]), mass * 9.81, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(tau[:5]), np.zeros(5),
                                   atol=1e-12)

    def test_drop_settles_near_equilibrium(self):
        model, params, scene, radius, mass = _ball_world(d=2.0)
        sys = make_continuous_contact_system(model, params, scene)
        x0 = jnp.asarray([1, 0, 0, 0, 0, 0, radius + 0.02] + [0] * 6, F64)
        u = jnp.zeros((0,), F64)
        h = 2e-4
        xs, _ = simulator.simulate(
            sys, params, x0, jnp.zeros((4000, 0), F64), h, method="rk4"
        )
        z_final = float(xs[-1, 6])
        x_pen = mass * 9.81 / 5e4
        assert abs(z_final - (radius - x_pen)) < 2e-3
        # kinetic energy is gone
        assert float(jnp.sum(xs[-1, 7:] ** 2)) < 1e-3

    def test_hunt_crossley_dissipates_rebound(self):
        model, params, scene, radius, mass = _ball_world(d=1.5)
        sys = make_continuous_contact_system(model, params, scene)
        drop_h = 0.1
        x0 = jnp.asarray([1, 0, 0, 0, 0, 0, radius + drop_h] + [0] * 6, F64)
        h = 1e-4
        xs, _ = simulator.simulate(
            sys, params, x0, jnp.zeros((6000, 0), F64), h, method="rk4"
        )
        z = np.asarray(xs[:, 6])
        # find the first rebound apex after the first impact
        hit = np.argmax(z < radius)
        apex = z[hit:].max() - radius
        assert apex < 0.6 * drop_h  # dissipation took real energy
        assert apex > 0.0  # but it did bounce

    def test_sliding_friction_decelerates_at_mu_g(self):
        mu = 0.3
        model, params, scene, radius, mass = _ball_world(mu=mu, d=0.0)
        # disable rolling: spin-free sliding puck approximation via huge
        # inertia (so contact torque barely rotates it)
        from drake_tpu.multibody.model import ModelBuilder as MB

        b = MB()
        b.add_body("puck", parent=None, joint_type=FLOATING, mass=mass,
                   inertia_com=np.eye(3) * 1e6)
        model, params = b.build(F64)
        k = 5e4
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=mu, stiffness=1e14),
            CollisionGeometry(name="puck", body=0, shape=sh.Sphere(radius),
                              friction=mu, stiffness=k, dissipation=0.0),
        ]
        scene = CollisionScene.build(geoms)
        sys = make_continuous_contact_system(model, params, scene,
                                             stiction_velocity=1e-4)
        x_pen = mass * 9.81 / k
        v0 = 1.0
        x0 = jnp.asarray(
            [1, 0, 0, 0, 0, 0, radius - x_pen, 0, 0, 0, v0, 0, 0], F64)
        h = 1e-4
        T = 1500
        xs, _ = simulator.simulate(
            sys, params, x0, jnp.zeros((T, 0), F64), h, method="rk4"
        )
        vx = np.asarray(xs[:, 10])
        # deceleration while sliding ~ mu g (within regularization slop)
        decel = (vx[0] - vx[1000]) / (1000 * h)
        np.testing.assert_allclose(decel, mu * 9.81, rtol=0.05)

    def test_gradients_flow_through_contact(self):
        model, params, scene, radius, mass = _ball_world()
        sys = make_continuous_contact_system(model, params, scene)
        x0 = jnp.asarray([1, 0, 0, 0, 0, 0, radius - 1e-4] + [0] * 6, F64)

        def zdot_after_step(z):
            x = x0.at[6].set(z)
            xdot = sys.f(params, x, jnp.zeros((0,), F64), 0.0)
            return xdot[12]  # vdot_z: xdot = [qdot (7); vdot (6)], last entry

        g = jax.grad(zdot_after_step)(jnp.asarray(radius - 1e-4, F64))
        # deeper penetration (smaller z) -> more upward force: dg/dz < 0
        assert float(g) < 0.0
