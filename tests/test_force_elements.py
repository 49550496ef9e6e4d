"""Force element tests.

Mirrors the reference test strategy for force elements
(multibody/tree/test/linear_spring_damper_test.cc, revolute_spring_test.cc,
linear_bushing_roll_pitch_yaw_test.cc): analytic oscillator solutions,
energy bookkeeping, and consistency of generalized forces with the
potential-energy gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody import force_elements as fel
from drake_tpu.multibody import plant
from drake_tpu.multibody.model import ModelBuilder
from drake_tpu.systems import simulator


def _mass_spring(k=40.0, d=0.0, m=2.0, l0=0.5):
    """Anchor welded to world + mass on a prismatic x-joint, connected by a
    spring of free length l0 (gravity perpendicular to motion)."""
    b = ModelBuilder(gravity=(0.0, 0.0, 0.0))
    b.add_body("anchor", parent=None, joint_type="weld", mass=0.0)
    b.add_body(
        "block", parent="anchor", joint_type="prismatic", mass=m,
        inertia_com=np.eye(3) * 1e-3, axis=(1.0, 0.0, 0.0),
    )
    model, params = b.build(jnp.float64)
    feb = fel.ForceElementBuilder(model)
    feb.add_linear_spring_damper(
        "anchor", (0, 0, 0), "block", (0, 0, 0),
        free_length=l0, stiffness=k, damping=d)
    fe, fp = feb.build(jnp.float64)
    return model, params, fe, fp


class TestLinearSpringDamper:
    def test_restoring_force_value(self):
        """At stretch s the generalized force is exactly -k s (the joint
        axis is the spring line)."""
        model, params, fe, fp = _mass_spring(k=40.0, l0=0.5)
        q = jnp.array([0.8], jnp.float64)  # length 0.8, stretch 0.3
        v = jnp.zeros(1, jnp.float64)
        tau = fel.generalized_forces(model, params, fe, fp, q, v)
        np.testing.assert_allclose(np.asarray(tau), [-40.0 * 0.3], atol=1e-9)

    def test_oscillator_frequency(self):
        """Undamped mass-spring oscillates at omega = sqrt(k/m)."""
        k, m, l0 = 40.0, 2.0, 0.5
        model, params, fe, fp = _mass_spring(k=k, m=m, l0=l0)
        sys = plant.make_system(
            model, params,
            applied_forces=lambda p, q, v, t: fel.generalized_forces(
                model, p, fe, fp, q, v))
        x0 = jnp.array([l0 + 0.1, 0.0], jnp.float64)
        omega = np.sqrt(k / m)
        T = 2 * np.pi / omega
        dt = T / 400.0
        us = jnp.zeros((400, 1), jnp.float64)
        xs, _ = simulator.simulate(sys, params, x0, us, dt)
        # after one full period the state returns to x0
        np.testing.assert_allclose(
            np.asarray(xs[-1]), np.asarray(x0), atol=2e-4)

    def test_damped_decay_rate(self):
        """Damping d gives envelope exp(-d t / 2m)."""
        k, m, d, l0 = 40.0, 2.0, 1.6, 0.5
        model, params, fe, fp = _mass_spring(k=k, m=m, d=d, l0=l0)
        sys = plant.make_system(
            model, params,
            applied_forces=lambda p, q, v, t: fel.generalized_forces(
                model, p, fe, fp, q, v))
        x0 = jnp.array([l0 + 0.1, 0.0], jnp.float64)
        T = 2 * np.pi / np.sqrt(k / m - (d / (2 * m)) ** 2)
        n, dt = 800, T / 400.0
        us = jnp.zeros((n, 1), jnp.float64)
        xs, _ = simulator.simulate(sys, params, x0, us, dt)
        # displacement after exactly two damped periods
        amp = float(xs[-1, 0] - l0)
        expected = 0.1 * np.exp(-d / (2 * m) * n * dt)
        np.testing.assert_allclose(amp, expected, rtol=2e-3)

    def test_damping_in_linearization(self):
        """d tau / d v must include the damper (no stop_gradient leak)."""
        model, params, fe, fp = _mass_spring(k=40.0, d=1.6)
        q = jnp.array([0.7], jnp.float64)
        J = jax.jacobian(
            lambda vv: fel.generalized_forces(model, params, fe, fp, q, vv)
        )(jnp.zeros(1, jnp.float64))
        np.testing.assert_allclose(np.asarray(J), [[-1.6]], atol=1e-9)


class TestJointSpring:
    def test_pendulum_equilibrium_shift(self):
        """Pendulum + revolute spring: equilibrium satisfies
        k (q - q0) = -m g l sin(q)."""
        m, l = 1.0, 0.8
        b = ModelBuilder()
        b.add_body(
            "arm", parent=None, joint_type="revolute", mass=m,
            com=(0, 0, -l), inertia_com=np.eye(3) * 1e-4,
            axis=(0, 1, 0), damping=2.0,
        )
        model, params = b.build(jnp.float64)
        feb = fel.ForceElementBuilder(model)
        feb.add_joint_spring("arm_joint", nominal=0.6, stiffness=30.0)
        fe, fp = feb.build(jnp.float64)
        sys = plant.make_system(
            model, params,
            applied_forces=lambda p, q, v, t: fel.generalized_forces(
                model, p, fe, fp, q, v))
        x = jnp.array([0.5, 0.0], jnp.float64)
        us = jnp.zeros((4000, 1), jnp.float64)
        xs, _ = simulator.simulate(sys, params, x, us, 0.005)
        q_eq = float(xs[-1, 0])
        # torque balance about +y: spring -k (q - q0), gravity -m g l sin q
        resid = 30.0 * (q_eq - 0.6) + m * 9.81 * l * np.sin(q_eq)
        assert abs(float(xs[-1, 1])) < 1e-6  # settled
        assert abs(resid) < 1e-4

    def test_energy_conservation_with_spring(self):
        """Undamped pendulum + spring conserves kinetic + gravity + elastic
        energy under RK4."""
        b = ModelBuilder()
        b.add_body(
            "arm", parent=None, joint_type="revolute", mass=1.0,
            com=(0, 0, -0.8), inertia_com=np.eye(3) * 1e-4, axis=(0, 1, 0),
        )
        model, params = b.build(jnp.float64)
        feb = fel.ForceElementBuilder(model)
        feb.add_joint_spring("arm_joint", nominal=0.0, stiffness=12.0)
        fe, fp = feb.build(jnp.float64)
        sys = plant.make_system(
            model, params,
            applied_forces=lambda p, q, v, t: fel.generalized_forces(
                model, p, fe, fp, q, v))

        def energy(x):
            q, v = x[:1], x[1:]
            return (dyn.total_energy(model, params, q, v)
                    + fel.spring_potential_energy(model, params, fe, fp, q))

        x0 = jnp.array([1.2, 0.0], jnp.float64)
        us = jnp.zeros((2000, 1), jnp.float64)
        xs, _ = simulator.simulate(sys, params, x0, us, 0.001)
        e0, e1 = float(energy(x0)), float(energy(xs[-1]))
        assert abs(e1 - e0) < 1e-6 * max(1.0, abs(e0))


class TestBushing:
    def _model(self):
        b = ModelBuilder()
        b.add_body("anchor", parent=None, joint_type="weld", mass=0.0)
        b.add_body(
            "box", parent="anchor", joint_type="floating", mass=1.5,
            inertia_com=np.eye(3) * 0.02,
        )
        model, params = b.build(jnp.float64)
        feb = fel.ForceElementBuilder(model)
        feb.add_bushing(
            "anchor", "box",
            X_AF_xyz=(0.0, 0.0, 0.3),
            X_CM_xyz=(0.05, 0.0, 0.0),
            torque_stiffness=(9.0, 7.0, 5.0),
            torque_damping=(0.3, 0.2, 0.1),
            force_stiffness=(400.0, 300.0, 200.0),
            force_damping=(4.0, 3.0, 2.0),
        )
        fe, fp = feb.build(jnp.float64)
        return model, params, fe, fp

    def test_elastic_force_matches_energy_gradient(self):
        """With damping zeroed, tau . v == -dU/dt for arbitrary v — the
        generalized force is the exact negative gradient of the bushing
        potential (independent check of the virtual-power mapping)."""
        model, params, fe, fp = self._model()
        fp0 = fp.replace(bu_d=jnp.zeros_like(fp.bu_d))
        rng = np.random.default_rng(3)
        q = model.default_state(jnp.float64)[: model.num_positions]
        quat = rng.normal(size=4)
        quat /= np.linalg.norm(quat)
        q = q.at[:4].set(jnp.asarray(quat))
        q = q.at[4:7].set(jnp.asarray(rng.normal(size=3) * 0.1))
        v = jnp.asarray(rng.normal(size=model.num_velocities))
        tau = fel.generalized_forces(model, params, fe, fp0, q, v)

        qdot = plant.qdot_from_v(model, params, q, v)
        dUdt = jax.jvp(
            lambda qq: fel.spring_potential_energy(
                model, params, fe, fp0, qq),
            (q,), (qdot,))[1]
        np.testing.assert_allclose(
            float(jnp.dot(tau, v)), -float(dUdt), rtol=1e-10)

    def test_damping_dissipates(self):
        """Full bushing at rest offset: released, it settles toward the
        undeformed pose and total energy decreases monotonically."""
        model, params, fe, fp = self._model()
        sys = plant.make_system(
            model, params,
            applied_forces=lambda p, q, v, t: fel.generalized_forces(
                model, p, fe, fp, q, v))
        x0 = model.default_state(jnp.float64)
        # F is 0.3 above anchor; M is offset 0.05 in box x.  Start the box
        # displaced from the rest pose.
        x0 = x0.at[4:7].set(jnp.array([0.0, 0.02, 0.25]))

        def energy(x):
            q, v = x[: model.num_positions], x[model.num_positions:]
            return (dyn.total_energy(model, params, q, v)
                    + fel.spring_potential_energy(model, params, fe, fp, q))

        us = jnp.zeros((3000, 0), jnp.float64)
        xs, _ = simulator.simulate(sys, params, x0, us, 0.002)
        es = [float(energy(xs[i])) for i in range(0, 3000, 500)]
        assert all(b <= a + 1e-9 for a, b in zip(es, es[1:]))
        # deflection x -> where gravity balances the spring; the box hangs
        # near the anchor attachment, well inside the initial offset
        assert float(jnp.linalg.norm(xs[-1, 4:7] - jnp.array(
            [-0.05, 0.0, 0.3]))) < 0.08


class TestDoorHinge:
    """DoorHinge force element (reference multibody/tree/door_hinge.h) —
    dishwasher-door torques: spring + tanh-doublet catch + smooth
    dynamic/static/viscous friction."""

    def _door(self):
        b = ModelBuilder(gravity=(0.0, 0.0, 0.0))
        b.add_body(
            "door", parent=None, joint_type="revolute", mass=2.0,
            com=(0.3, 0, 0), inertia_com=np.eye(3) * 0.05, axis=(0, 0, 1),
        )
        model, params = b.build(jnp.float64)
        feb = fel.ForceElementBuilder(model)
        feb.add_door_hinge("door_joint")  # reference default config
        fe, fp = feb.build(jnp.float64)
        return model, params, fe, fp

    def test_torque_matches_reference_formula(self):
        model, params, fe, fp = self._door()
        angle, rate = 0.3, 0.5
        tau = float(fel.generalized_forces(
            model, fp, fe, fp, jnp.asarray([angle]), jnp.asarray([rate])
        )[0]) if False else float(fel.generalized_forces(
            model, params, fe, fp, jnp.asarray([angle]), jnp.asarray([rate])
        )[0])
        # Hand evaluation of door_hinge.cc CalcHingeTorque with the
        # DoorHingeConfig defaults (k_ts=1.5, k_df=3, k_sf=2, k_vf=1,
        # w=0.02, k_c=15, vt=0.001, q0=0).
        s_v = np.tanh(rate / 0.001)
        tau_f = -(3 * s_v + 2 * 2 * s_v * (1 - s_v**2) + 1 * rate)
        c = 0.01
        s_q = np.tanh((angle - c) / c)
        tau_s = 15 * 2 * s_q * (1 - s_q**2) - 1.5 * angle
        np.testing.assert_allclose(tau, tau_f + tau_s, rtol=1e-12)

    def test_catch_torque_is_gradient_of_energy(self):
        model, params, fe, fp = self._door()
        g = jax.grad(lambda qq: fel.spring_potential_energy(
            model, params, fe, fp, qq))(jnp.asarray([0.004]))
        # At zero velocity the hinge torque is purely conservative:
        # tau = -dU/dq.
        tau = fel.generalized_forces(
            model, params, fe, fp, jnp.asarray([0.004]), jnp.zeros(1))
        np.testing.assert_allclose(float(tau[0]), -float(g[0]), atol=1e-9)

    def test_rests_motionless_then_shuts_into_the_catch(self):
        """The reference's documented dishwasher behavior (door_hinge.h
        :117-121): friction alone holds the door motionless at any angle;
        pushed shut with enough energy, the catch grabs and holds it."""
        from drake_tpu.multibody import plant as mplant
        from drake_tpu.systems import simulator

        model, params, fe, fp = self._door()
        sys_ = mplant.make_system(
            model, params,
            applied_forces=lambda p, q, v, t: fel.generalized_forces(
                model, p, fe, fp, q, v))

        # (a) released open: static+dynamic friction (~5 Nm) beats the
        # spring (1.5 * 0.8 Nm) — the door rests where it is.
        x0 = jnp.asarray([0.8, 0.0], jnp.float64)
        us = jnp.zeros((2000, 1), jnp.float64)
        xs, _ = simulator.simulate(sys_, params, x0, us, 2e-3)
        assert abs(float(xs[-1, 1])) < 0.02
        assert abs(float(xs[-1, 0]) - 0.8) < 0.05

        # (b) pushed shut hard enough to beat friction work, the door
        # reaches the catch and stays closed.
        x0 = jnp.asarray([0.3, -4.0], jnp.float64)
        xs, _ = simulator.simulate(sys_, params, x0, us, 2e-3)
        qf, vf = float(xs[-1, 0]), float(xs[-1, 1])
        assert abs(vf) < 0.05, vf
        assert qf < 0.05, qf
