"""iiwa 7-dof arm model tests.

Mirrors the reference's iiwa validation strategy (multibody/benchmarks/
kuka_iiwa_robot — MotionGenesis cross-checks of the tree algorithms): here
the cross-checks are internal consistency (RNEA vs CRBA, KE Hessian vs M),
conservation laws, and controller behavior (gravity-comp + PD hold).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.models import iiwa
from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody import plant as mb_plant
from drake_tpu.systems import simulator

F64 = jnp.float64


@pytest.fixture(scope="module")
def arm():
    return iiwa.make_model(F64, damping=0.0)


class TestIiwaDynamics:
    def test_dims(self, arm):
        model, params = arm
        assert model.num_positions == 7
        assert model.num_velocities == 7

    def test_mass_matrix_spd(self, arm):
        model, params = arm
        rng = np.random.default_rng(0)
        for _ in range(5):
            q = jnp.asarray(rng.uniform(-1.5, 1.5, 7))
            M = dyn.mass_matrix(model, params, q)
            eigs = np.linalg.eigvalsh(np.asarray(M))
            assert eigs.min() > 0
            np.testing.assert_allclose(M, M.T, atol=1e-13)

    def test_rnea_crba_consistency(self, arm):
        model, params = arm
        rng = np.random.default_rng(1)
        for _ in range(5):
            q = jnp.asarray(rng.uniform(-1.5, 1.5, 7))
            v = jnp.asarray(rng.normal(size=7))
            vd = jnp.asarray(rng.normal(size=7))
            tau = dyn.inverse_dynamics(model, params, q, v, vd)
            tau2 = dyn.mass_matrix(model, params, q) @ vd + dyn.bias_forces(
                model, params, q, v
            )
            np.testing.assert_allclose(tau, tau2, atol=1e-10)

    def test_mass_matrix_is_ke_hessian(self, arm):
        model, params = arm
        q = iiwa.home_position(F64)
        H = jax.hessian(lambda v: dyn.kinetic_energy(model, params, q, v))(
            jnp.zeros(7, F64)
        )
        np.testing.assert_allclose(
            H, dyn.mass_matrix(model, params, q), atol=1e-12
        )

    def test_energy_conservation_passive(self, arm):
        model, params = arm
        system = mb_plant.make_system(model, params)
        x0 = jnp.concatenate([iiwa.home_position(F64), jnp.zeros(7, F64)])
        us = jnp.zeros((2000, 7), dtype=F64)
        xs, _ = simulator.simulate(system, params, x0, us, 5e-4)
        E = jax.vmap(
            lambda x: dyn.total_energy(model, params, x[:7], x[7:])
        )(xs[::200])
        assert float(jnp.abs(E - E[0]).max()) < 1e-5

    def test_gravity_compensation_holds_pose(self, arm):
        """Inverse-dynamics gravity feedforward + small PD holds the arm
        (the reference InverseDynamicsController's role,
        systems/controllers/inverse_dynamics_controller.h)."""
        model, params = iiwa.make_model(F64, damping=0.5)
        system = mb_plant.make_system(model, params)
        q0 = iiwa.home_position(F64)
        # Computed-torque control (the reference InverseDynamicsController):
        # tau = ID(q, v, vdot_des) gives exact decoupled error dynamics.
        # (Uniform joint-space PD gains would put the light wrist joints'
        # closed-loop poles outside RK4's stability region at dt=1e-3.)
        Kp, Kd = 100.0, 20.0

        def policy(_, x, t):
            q, v = x[:7], x[7:]
            vdot_des = Kp * (q0 - q) - Kd * v
            return dyn.inverse_dynamics(model, params, q, v, vdot_des)

        x0 = jnp.concatenate([q0 + 0.05, jnp.zeros(7, F64)])
        xs, _, _ = simulator.simulate_controlled(
            system, params, x0, policy, 2000, 1e-3
        )
        assert float(jnp.abs(xs[-1, :7] - q0).max()) < 1e-3

    def test_vmap_forward_dynamics(self, arm):
        model, params = arm
        rng = np.random.default_rng(2)
        qs = jnp.asarray(rng.uniform(-1, 1, (32, 7)))
        vs = jnp.asarray(rng.normal(size=(32, 7)))
        taus = jnp.asarray(rng.normal(size=(32, 7)))
        vds = jax.vmap(
            lambda q, v, tau: dyn.forward_dynamics(model, params, q, v, tau)
        )(qs, vs, taus)
        assert vds.shape == (32, 7)
        assert bool(jnp.all(jnp.isfinite(vds)))
