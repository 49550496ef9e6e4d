"""Model dynamics tests against closed-form physics.

Mirrors the reference's analytic-fixture strategy (multibody/benchmarks/
acrobot, pendulum — SURVEY.md §4): energy conservation, manipulator-equation
structure, and known equilibria.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.models import acrobot, cart_pole, pendulum, quadrotor
from drake_tpu.systems import simulator

F64 = jnp.float64


class TestPendulum:
    def setup_method(self):
        self.sys = pendulum.make_system(pendulum.default_params(F64))
        self.p = self.sys.default_params

    def test_equilibrium(self):
        x = jnp.array([0.0, 0.0], dtype=F64)
        u = jnp.zeros(1, dtype=F64)
        np.testing.assert_allclose(self.sys.f(self.p, x, u), 0.0, atol=1e-14)

    def test_small_oscillation_frequency(self):
        """Undamped small oscillations: omega = sqrt(g/l)."""
        p = self.p.replace(damping=jnp.asarray(0.0, F64))
        omega = float(jnp.sqrt(p.gravity / p.length))
        period = 2 * np.pi / omega
        dt = 1e-4
        n = int(period / dt)
        x0 = jnp.array([1e-3, 0.0], dtype=F64)
        us = jnp.zeros((n, 1), dtype=F64)
        xs, _ = simulator.simulate(self.sys, p, x0, us, dt)
        # After one period the state returns to the start.
        np.testing.assert_allclose(xs[-1], x0, atol=1e-6)

    def test_energy_conservation_undamped(self):
        p = self.p.replace(damping=jnp.asarray(0.0, F64))
        x0 = jnp.array([2.0, 0.0], dtype=F64)
        us = jnp.zeros((2000, 1), dtype=F64)
        xs, _ = simulator.simulate(self.sys, p, x0, us, 1e-3)
        E = pendulum.total_energy(p, xs)
        assert float(jnp.abs(E - E[0]).max()) < 1e-8

    def test_energy_decay_damped(self):
        x0 = jnp.array([2.0, 0.0], dtype=F64)
        us = jnp.zeros((2000, 1), dtype=F64)
        xs, _ = simulator.simulate(self.sys, self.p, x0, us, 1e-3)
        E = pendulum.total_energy(self.p, xs)
        assert float(E[-1]) < float(E[0])


class TestAcrobot:
    def setup_method(self):
        self.sys = acrobot.make_system(acrobot.default_params(F64))
        self.p = self.sys.default_params

    def test_equilibria(self):
        u = jnp.zeros(1, dtype=F64)
        for q in ([0.0, 0.0], [np.pi, 0.0], [0.0, np.pi]):
            x = jnp.array(q + [0.0, 0.0], dtype=F64)
            np.testing.assert_allclose(
                self.sys.f(self.p, x, u), 0.0, atol=1e-12, err_msg=str(q)
            )

    def test_mass_matrix_spd_and_symmetric(self):
        rng = np.random.default_rng(0)
        qs = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(32, 2)))
        Ms = acrobot.mass_matrix(self.p, qs)
        np.testing.assert_allclose(Ms, jnp.swapaxes(Ms, -1, -2), atol=1e-14)
        assert np.all(np.linalg.eigvalsh(np.asarray(Ms)) > 0)

    def test_energy_conservation_undamped(self):
        p = self.p.replace(b1=jnp.asarray(0.0, F64), b2=jnp.asarray(0.0, F64))
        x0 = jnp.array([0.3, -0.6, 0.0, 0.0], dtype=F64)
        us = jnp.zeros((5000, 1), dtype=F64)
        xs, _ = simulator.simulate(self.sys, p, x0, us, 2e-4)
        E = acrobot.total_energy(p, xs)
        assert float(jnp.abs(E - E[0]).max()) < 1e-6

    def test_mass_matrix_is_hessian_of_kinetic_energy(self):
        """M(q) == d^2 KE / dv^2 — structural consistency check."""
        q = jnp.array([0.4, -0.9], dtype=F64)
        v0 = jnp.zeros(2, dtype=F64)

        def ke(v):
            return acrobot.total_energy(
                self.p, jnp.concatenate([q, v])
            ) - acrobot.total_energy(self.p, jnp.concatenate([q, v0]))

        H = jax.hessian(ke)(v0)
        np.testing.assert_allclose(H, acrobot.mass_matrix(self.p, q), atol=1e-10)


class TestCartPole:
    def setup_method(self):
        self.sys = cart_pole.make_system(cart_pole.default_params(F64))
        self.p = self.sys.default_params

    def test_equilibrium_and_force_response(self):
        x = jnp.zeros(4, dtype=F64)
        u = jnp.zeros(1, dtype=F64)
        np.testing.assert_allclose(self.sys.f(self.p, x, u), 0.0, atol=1e-14)
        # With the pole hanging straight down a horizontal force accelerates
        # cart and pole: xddot = u/(mc) only if pole swings; at theta=0 exact:
        # [mc+mp, mp*l; mp*l, mp*l^2][a; alpha] = [u; 0]
        u = jnp.array([5.0], dtype=F64)
        xdot = self.sys.f(self.p, x, u)
        M = np.array(
            [
                [float(self.p.mc + self.p.mp), float(self.p.mp * self.p.l)],
                [float(self.p.mp * self.p.l), float(self.p.mp * self.p.l**2)],
            ]
        )
        expected = np.linalg.solve(M, [5.0, 0.0])
        np.testing.assert_allclose(xdot[2:], expected, atol=1e-12)


class TestQuadrotor:
    def setup_method(self):
        self.sys = quadrotor.make_system(quadrotor.default_params(F64))
        self.p = self.sys.default_params

    def test_hover_equilibrium(self):
        x = jnp.zeros(12, dtype=F64)
        u = quadrotor.hover_input(self.p)
        np.testing.assert_allclose(self.sys.f(self.p, x, u), 0.0, atol=1e-12)

    def test_free_fall(self):
        x = jnp.zeros(12, dtype=F64)
        u = jnp.zeros(4, dtype=F64)
        xdot = self.sys.f(self.p, x, u)
        np.testing.assert_allclose(xdot[8], -9.81, atol=1e-12)

    def test_yaw_torque(self):
        """Asymmetric rotor speeds produce pure yaw moment at hover attitude."""
        x = jnp.zeros(12, dtype=F64)
        u0 = quadrotor.hover_input(self.p)
        du = jnp.array([1.0, -1.0, 1.0, -1.0], dtype=F64) * 0.01
        xdot = self.sys.f(self.p, x, u0 + du)
        # z-acceleration zero (total thrust unchanged), yaw accel nonzero.
        np.testing.assert_allclose(xdot[6:9], 0.0, atol=1e-12)
        assert abs(float(xdot[11])) > 1e-3
        np.testing.assert_allclose(xdot[9:11], 0.0, atol=1e-12)

    def test_batched_dynamics(self):
        rng = np.random.default_rng(1)
        xs = jnp.asarray(rng.normal(size=(64, 12)) * 0.1)
        us = jnp.asarray(rng.uniform(1.0, 3.0, size=(64, 4)))
        batched = self.sys.f(self.p, xs, us)
        single = jax.vmap(lambda x, u: self.sys.f(self.p, x, u))(xs, us)
        np.testing.assert_allclose(batched, single, atol=1e-12)
