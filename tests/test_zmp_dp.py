"""ZMP planner + fitted value iteration tests (reference
planning/locomotion/test/zmp_planner_test.cc and
systems/controllers/test/dynamic_programming_test.cc patterns)."""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.control.dynamic_programming import (
    fitted_value_iteration,
    policy_at,
)
from drake_tpu.control.zmp import plan_zmp

F64 = jnp.float64


class TestZmpPlanner:
    def test_stationary_reference(self):
        """Constant desired ZMP at the CoM start: everything stays put."""
        target = jnp.asarray([0.2, -0.1], F64)
        x0 = jnp.asarray([0.2, -0.1, 0.0, 0.0], F64)
        plan = plan_zmp(lambda t: target, x0, height=0.9, t_final=2.0)
        np.testing.assert_allclose(
            np.asarray(plan.com[-1]), np.asarray(target), atol=1e-6
        )
        assert float(jnp.max(jnp.abs(plan.u))) < 1e-6

    def test_step_reference_tracks(self):
        """Step in desired ZMP: CoM converges to the new point; realized
        CoP tracks the reference away from the transient."""
        step_t = 0.5

        def zmp_d(t):
            return jnp.where(
                t < step_t,
                jnp.asarray([0.0, 0.0], F64),
                jnp.asarray([0.15, 0.1], F64),
            )

        x0 = jnp.zeros(4, F64)
        plan = plan_zmp(zmp_d, x0, height=0.9, t_final=3.0, dt=0.005)
        np.testing.assert_allclose(
            np.asarray(plan.com[-1]), [0.15, 0.1], atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(plan.comd[-1]), 0.0, atol=2e-2
        )
        # Late-time CoP on the reference.
        cop_late = np.asarray(plan.cop[-50:])
        np.testing.assert_allclose(
            cop_late, np.tile([0.15, 0.1], (50, 1)), atol=2e-3
        )
        # CoM ANTICIPATES the step (moves before t=0.5) — the signature
        # preview behavior of ZMP planning.
        k_before = int(0.45 / 0.005)
        assert float(jnp.abs(plan.com[k_before]).max()) > 1e-4

    def test_policy_stabilizes_perturbation(self):
        """The linear policy recovers a perturbed CoM onto the plan."""
        target = jnp.asarray([0.0, 0.0], F64)
        x0 = jnp.zeros(4, F64)
        plan = plan_zmp(lambda t: target, x0, height=0.9, t_final=2.0,
                        dt=0.01)
        # Roll the CLOSED LOOP from a perturbed start using plan.policy.
        x = jnp.asarray([0.05, -0.03, 0.0, 0.0], F64)
        dt = 0.01
        I2 = np.eye(2)
        Ad = np.block([[I2, dt * I2], [0 * I2, I2]])
        Bd = np.concatenate([0.5 * dt * dt * I2, dt * I2], axis=0)
        for k in range(plan.K.shape[0]):
            u = plan.policy(k, x)
            x = jnp.asarray(Ad) @ x + jnp.asarray(Bd) @ u
        assert float(jnp.linalg.norm(x[:2] - target)) < 5e-3


def _double_integrator_step(dt=0.1):
    def f(x, u):
        return jnp.stack([x[0] + dt * x[1] + 0.5 * dt * dt * u[0],
                          x[1] + dt * u[0]])

    return f


class TestValueIteration:
    def test_double_integrator_quadratic(self):
        """Discounted LQR cost: the fitted value function is convex,
        minimized at the origin, and the greedy policy drives to zero."""
        dt = 0.1
        f = _double_integrator_step(dt)
        cost = lambda x, u: dt * (x @ x + 0.1 * u @ u)
        gx = jnp.linspace(-2, 2, 21)
        gv = jnp.linspace(-2, 2, 21)
        gu = jnp.linspace(-4, 4, 15)
        res = fitted_value_iteration(
            f, cost, (gx, gv), (gu,), num_iterations=400, gamma=0.98
        )
        J = np.asarray(res.J).reshape(21, 21)
        assert J[10, 10] == J.min()  # minimum at the origin
        # Closed-loop rollout reaches the origin.
        x = jnp.asarray([1.5, 0.0])
        for _ in range(120):
            u = policy_at(res, x)
            x = f(x, u)
        assert float(jnp.linalg.norm(x)) < 0.2

    def test_pendulum_swingup_periodic(self):
        """Torque-limited pendulum swing-up with a periodic angle dim —
        the classic dynamic_programming.h demo: the policy pumps energy and
        reaches the upright from the downward state."""
        dt = 0.05
        g_over_l, b = 9.81, 0.1

        def f(x, u):
            th, thd = x[0], x[1]
            thdd = u[0] - g_over_l * jnp.sin(th) - b * thd
            return jnp.stack([th + dt * thd, thd + dt * thdd])

        def cost(x, u):
            # Upright at th = pi (mod 2 pi).
            return dt * (
                (1 + jnp.cos(x[0])) * 2.0 + 0.05 * x[1] ** 2
                + 0.01 * u[0] ** 2
            )

        gth = jnp.linspace(0, 2 * np.pi, 41)[:-1]  # periodic grid
        gthd = jnp.linspace(-6, 6, 41)
        gu = jnp.linspace(-2.5, 2.5, 9)  # torque-limited: must pump
        res = fitted_value_iteration(
            f, cost, (gth, gthd), (gu,), num_iterations=800, gamma=0.995,
            periodic_dims=(0,),
        )
        x = jnp.asarray([0.0, 0.0])  # hanging down
        best = 2.0
        for _ in range(400):
            u = policy_at(res, x)
            x = f(x, u)
            x = x.at[0].set(jnp.mod(x[0], 2 * np.pi))
            best = min(best, float(1 + jnp.cos(x[0])))
        assert best < 0.05  # got within ~18 deg of upright
