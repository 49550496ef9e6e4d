"""LQR family tests against reference semantics.

Mirrors systems/controllers/test/linear_quadratic_regulator_test.cc and
finite_horizon_linear_quadratic_regulator_test.cc: double-integrator closed
forms, stabilization of nonlinear plants, and convergence of the
finite-horizon solution to the infinite-horizon one.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.control import lqr as lqr_mod
from drake_tpu.models import acrobot, cart_pole, quadrotor
from drake_tpu.systems import simulator

F64 = jnp.float64


class TestLqr:
    def test_double_integrator_closed_form(self):
        """Known LQR solution for the double integrator (Q=I, R=I):
        S = [[sqrt(3), 1], [1, sqrt(3)]], K = [1, sqrt(3)]."""
        A = jnp.array([[0.0, 1.0], [0.0, 0.0]])
        B = jnp.array([[0.0], [1.0]])
        res = lqr_mod.lqr(A, B, jnp.eye(2), jnp.eye(1))
        s3 = np.sqrt(3.0)
        np.testing.assert_allclose(res.S, [[s3, 1], [1, s3]], atol=1e-7)
        np.testing.assert_allclose(res.K, [[1.0, s3]], atol=1e-7)

    def test_discrete_lqr_stabilizes(self):
        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.normal(size=(4, 4)))
        B = jnp.asarray(rng.normal(size=(4, 2)))
        res = lqr_mod.discrete_lqr(A, B, jnp.eye(4), jnp.eye(2))
        eigs = np.linalg.eigvals(np.asarray(A - B @ res.K))
        assert np.all(np.abs(eigs) < 1.0)

    def test_acrobot_balancing(self):
        """LQR balances the acrobot upright from a small perturbation
        (mirror of examples/acrobot/run_lqr.cc)."""
        system = acrobot.make_system(acrobot.default_params(F64))
        p = system.default_params
        xu = acrobot.upright_state(F64)
        u0 = jnp.zeros(1, dtype=F64)
        Q = jnp.diag(jnp.array([10.0, 10.0, 1.0, 1.0], dtype=F64))
        R = jnp.eye(1, dtype=F64)
        res = lqr_mod.lqr_for_system(system, p, xu, u0, Q, R)
        policy = lambda _, x, t: u0 - res.K @ (x - xu)
        x_init = xu + jnp.array([0.05, -0.05, 0.0, 0.0], dtype=F64)
        xs, _, _ = simulator.simulate_controlled(system, p, x_init, policy, 8000, 1e-3)
        assert float(jnp.linalg.norm(xs[-1] - xu)) < 1e-4

    def test_quadrotor_hover_lqr(self):
        """Mirror of examples/quadrotor/run_quadrotor_lqr.cc: stabilize hover."""
        system = quadrotor.make_system(quadrotor.default_params(F64))
        p = system.default_params
        x0 = jnp.zeros(12, dtype=F64)
        u0 = quadrotor.hover_input(p)
        Q = jnp.diag(jnp.concatenate([10 * jnp.ones(6), jnp.ones(6)]).astype(F64))
        R = 0.1 * jnp.eye(4, dtype=F64)
        res = lqr_mod.lqr_for_system(system, p, x0, u0, Q, R)
        policy = lambda _, x, t: u0 - res.K @ (x - x0)
        x_init = x0.at[0].set(0.5).at[4].set(0.1)
        xs, _, _ = simulator.simulate_controlled(system, p, x_init, policy, 6000, 1e-3)
        assert float(jnp.linalg.norm(xs[-1])) < 1e-5


class TestFiniteHorizonLqr:
    def test_converges_to_infinite_horizon(self):
        """S(t0) of a long horizon matches the CARE solution (reference
        finite_horizon_linear_quadratic_regulator_test.cc idiom)."""
        from drake_tpu.systems.base import ContinuousSystem

        A = jnp.array([[0.0, 1.0], [0.0, 0.0]])
        B = jnp.array([[0.0], [1.0]])

        def f(params, x, u, t):
            return A @ x + B @ u

        system = ContinuousSystem(f=f, num_states=2, num_inputs=1)
        Q = jnp.eye(2, dtype=F64)
        R = jnp.eye(1, dtype=F64)
        res_inf = lqr_mod.lqr(A.astype(F64), B.astype(F64), Q, R)
        res_fh = lqr_mod.finite_horizon_lqr(
            system, None, Q, R, t0=0.0, tf=20.0, num_steps=2000, Qf=res_inf.S * 0.0
        )
        np.testing.assert_allclose(res_fh.S[0], res_inf.S, atol=1e-3)
        np.testing.assert_allclose(res_fh.K[0], res_inf.K, atol=1e-3)

    def test_tvlqr_tracks_pendulum_trajectory(self):
        """TV-LQR stabilizes a passive pendulum trajectory under perturbation."""
        from drake_tpu.models import pendulum

        system = pendulum.make_system(pendulum.default_params(F64))
        p = system.default_params
        dt = 1e-2
        n = 200
        x0 = jnp.array([1.2, 0.0], dtype=F64)
        us = jnp.zeros((n, 1), dtype=F64)
        xs_nom, ts = simulator.simulate(system, p, x0, us, dt)

        Q = jnp.eye(2, dtype=F64)
        R = 0.1 * jnp.eye(1, dtype=F64)
        res = lqr_mod.finite_horizon_lqr(
            system, p, Q, R,
            t0=0.0, tf=n * dt, num_steps=n,
            x0_traj=xs_nom,
            u0_traj=jnp.concatenate([us, us[-1:]], axis=0),
            Qf=10 * jnp.eye(2, dtype=F64),
        )
        policy = lqr_mod.tvlqr_policy(res)
        x_pert = x0 + jnp.array([0.1, 0.0], dtype=F64)
        xs_cl, _, _ = simulator.simulate_controlled(system, p, x_pert, policy, n, dt)
        err_cl = float(jnp.linalg.norm(xs_cl[-1] - xs_nom[-1]))
        # open loop for comparison
        xs_ol, _ = simulator.simulate(system, p, x_pert, us, dt)
        err_ol = float(jnp.linalg.norm(xs_ol[-1] - xs_nom[-1]))
        assert err_cl < 0.3 * err_ol
        assert err_cl < 0.02


class TestIlqrMpcRefresh:
    """Periodic re-planning (`refresh_every`) in ilqr_mpc_rollout."""

    def _setup(self):
        from drake_tpu.control import mpc as mpc_mod
        from drake_tpu.trajopt import ilqr

        dt = 0.1

        def dyn(params, x, u, t):
            # double integrator
            return jnp.array([x[0] + dt * x[1], x[1] + dt * u[0]])

        def run_cost(params, x, u, t):
            return 0.1 * jnp.sum(u**2) + jnp.sum(x**2)

        def fin_cost(params, x):
            return 10.0 * jnp.sum(x**2)

        x0 = jnp.array([1.0, 0.0])
        u_init = jnp.zeros((8, 1))
        return mpc_mod, ilqr, dyn, run_cost, fin_cost, x0, u_init, dt

    def test_refresh_equals_head_path_when_one_block(self):
        """refresh_every >= num_steps reduces to heavy-solve-at-0 + light
        tracking, which must match the existing first_options head path."""
        mpc_mod, ilqr, dyn, rc, fc, x0, u_init, dt = self._setup()
        kw = dict(
            params=None, x0=x0, u_init=u_init, num_steps=6, dt=dt,
            options=ilqr.IlqrOptions(max_iters=1),
            first_options=ilqr.IlqrOptions(max_iters=8),
        )
        a = mpc_mod.ilqr_mpc_rollout(dyn, rc, fc, **kw)
        b = mpc_mod.ilqr_mpc_rollout(dyn, rc, fc, refresh_every=6, **kw)
        c = mpc_mod.ilqr_mpc_rollout(dyn, rc, fc, refresh_every=99, **kw)
        np.testing.assert_allclose(a.xs, b.xs, atol=1e-12)
        np.testing.assert_allclose(a.us, b.us, atol=1e-12)
        np.testing.assert_allclose(b.xs, c.xs, atol=1e-12)

    def test_refresh_with_remainder_stabilizes(self):
        """num_steps not a multiple of refresh_every: shapes are right and
        the controller still drives the state to the origin."""
        mpc_mod, ilqr, dyn, rc, fc, x0, u_init, dt = self._setup()
        res = mpc_mod.ilqr_mpc_rollout(
            dyn, rc, fc, None, x0, u_init, num_steps=11, dt=dt,
            options=ilqr.IlqrOptions(max_iters=1),
            first_options=ilqr.IlqrOptions(max_iters=8),
            refresh_every=4,
        )
        assert res.xs.shape == (12, 2)
        assert res.us.shape == (11, 1)
        assert res.costs.shape == (11,)
        # regulation toward the origin is monotone-ish and substantial
        assert float(jnp.linalg.norm(res.xs[-1])) < 0.75
        # heavy solves at steps 0, 4, 8 burn more iterations
        assert float(res.solve_iters[0]) >= float(res.solve_iters[1])


class TestRtiSolve:
    """rti_solve: the fused one-Newton-step real-time-iteration iLQR.

    On a linear-quadratic problem the Riccati backward pass is exact, so a
    single RTI step from ANY warm start must match the fully converged iLQR
    solution (reference MPC tracking role:
    systems/controllers/linear_model_predictive_controller.h:41 re-solves a
    QP each period; RTI is the fixed-one-iteration SQP variant of that).
    """

    def _lq(self):
        from drake_tpu.trajopt import ilqr

        dt = 0.1

        def dyn(params, x, u, t):
            return jnp.array([x[0] + dt * x[1], x[1] + dt * u[0]])

        def rc(params, x, u, t):
            return 0.1 * jnp.sum(u**2) + jnp.sum(x**2)

        def fc(params, x):
            return 10.0 * jnp.sum(x**2)

        x0 = jnp.array([1.0, -0.5])
        us0 = jnp.full((8, 1), 0.3)
        return ilqr, dyn, rc, fc, x0, us0

    def test_one_rti_step_exact_on_lq(self):
        ilqr, dyn, rc, fc, x0, us0 = self._lq()
        full = ilqr.solve(dyn, rc, fc, None, x0, us0,
                          options=ilqr.IlqrOptions(max_iters=30))
        rti = ilqr.rti_solve(dyn, rc, fc, None, x0, us0, reg=1e-10)
        np.testing.assert_allclose(
            np.asarray(rti.us), np.asarray(full.us), atol=1e-6)
        np.testing.assert_allclose(
            float(rti.cost), float(full.cost), rtol=1e-8)
        assert bool(rti.converged)

    def test_options_rti_routes(self):
        ilqr, dyn, rc, fc, x0, us0 = self._lq()
        via_opts = ilqr.solve(dyn, rc, fc, None, x0, us0,
                              options=ilqr.IlqrOptions(rti=True, reg_init=1e-10))
        direct = ilqr.rti_solve(dyn, rc, fc, None, x0, us0, reg=1e-10)
        np.testing.assert_allclose(np.asarray(via_opts.us),
                                   np.asarray(direct.us), atol=1e-12)

    def test_control_limits_respected(self):
        ilqr, dyn, rc, fc, x0, us0 = self._lq()
        lim = jnp.array([0.5])
        rti = ilqr.rti_solve(dyn, rc, fc, None, x0, us0,
                             u_lower=-lim, u_upper=lim)
        assert float(jnp.max(jnp.abs(rti.us))) <= 0.5 + 1e-7
        # and it still improves on the (clamped) warm start
        def cost_of(us):
            x, c = x0, 0.0
            for k in range(us.shape[0]):
                c += float(rc(None, x, us[k], 0.0))
                x = dyn(None, x, us[k], 0.0)
            return c + float(fc(None, x))
        assert cost_of(np.asarray(rti.us)) < cost_of(
            np.clip(np.asarray(us0), -0.5, 0.5))

    def test_nan_guard_returns_warm_start(self):
        ilqr, _, rc, fc, x0, us0 = self._lq()

        def bad_dyn(params, x, u, t):
            return x + jnp.sqrt(-jnp.sum(u**2)) * jnp.ones_like(x)

        rti = ilqr.rti_solve(bad_dyn, rc, fc, None, x0, us0)
        assert not bool(rti.converged)
        np.testing.assert_allclose(np.asarray(rti.us), np.asarray(us0))

    def test_vmap_jit(self):
        ilqr, dyn, rc, fc, x0, us0 = self._lq()
        x0s = jnp.stack([x0, 2.0 * x0, -x0])
        f = jax.jit(jax.vmap(
            lambda x: ilqr.rti_solve(dyn, rc, fc, None, x, us0).us))
        out = f(x0s)
        assert out.shape == (3, 8, 1)
        assert bool(jnp.all(jnp.isfinite(out)))
