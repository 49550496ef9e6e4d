"""Direct collocation tests — the baseline config-1 acceptance.

Mirrors examples/pendulum/trajectory_optimization_simulation.cc (21 knots,
equal intervals in [0.2, 0.5], |u|<=3, running cost 10u^2, swing 0 -> pi,
closed-loop tracking must reach the target within 1e-3) and
planning/trajectory_optimization/test/direct_collocation_test.cc idioms
(defect correctness on known dynamics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.models import pendulum
from drake_tpu.solvers.sqp import SqpOptions
from drake_tpu.systems import simulator
from drake_tpu.trajopt import dircol

F64 = jnp.float64


@pytest.fixture(scope="module")
def pendulum_problem():
    system = pendulum.make_system(pendulum.default_params(F64))
    x0 = jnp.array([0.0, 0.0], dtype=F64)
    xf = jnp.array([jnp.pi, 0.0], dtype=F64)
    problem = dircol.DircolProblem(
        system=system,
        num_time_samples=21,
        minimum_time_step=0.2,
        maximum_time_step=0.5,
        running_cost=lambda x, u: 10.0 * u[0] ** 2,
        x0=x0,
        xf=xf,
        u_lower=jnp.array([-3.0], dtype=F64),
        u_upper=jnp.array([3.0], dtype=F64),
    )
    return system, problem, x0, xf


@pytest.fixture(scope="module")
def swingup_solution(pendulum_problem):
    system, problem, x0, xf = pendulum_problem
    z0 = problem.initial_guess(x0, xf, timespan=4.0, dtype=F64)
    sol = jax.jit(
        lambda z: dircol.solve(problem, system.default_params, z, SqpOptions())
    )(z0)
    return sol


def test_defects_zero_on_exact_linear_system():
    """For xdot = -x (exact solution known), a trajectory sampled from the
    true solution has near-zero Hermite-Simpson defects at small h."""
    from drake_tpu.systems.base import ContinuousSystem

    system = ContinuousSystem(
        f=lambda p, x, u, t: -x, num_states=1, num_inputs=1
    )
    problem = dircol.DircolProblem(
        system=system, num_time_samples=11, minimum_time_step=0.01, maximum_time_step=0.01
    )
    h = jnp.asarray(0.01, F64)
    ts = h * jnp.arange(11, dtype=F64)
    xs = jnp.exp(-ts)[:, None]
    us = jnp.zeros((11, 1), dtype=F64)
    z = problem.pack(h, xs, us)
    defects = problem.collocation_defects(None, z)
    # Hermite-Simpson is 4th-order accurate: defects ~ O(h^4)
    assert float(jnp.abs(defects).max()) < 1e-8


def test_swingup_solves(swingup_solution):
    sol = swingup_solution
    assert bool(sol.success)
    assert float(sol.constraint_violation) < 1e-5
    assert float(jnp.abs(sol.us).max()) <= 3.0 + 1e-6
    assert 0.2 - 1e-9 <= float(sol.h) <= 0.5 + 1e-9
    np.testing.assert_allclose(sol.xs[-1], [np.pi, 0.0], atol=1e-6)
    np.testing.assert_allclose(sol.xs[0], [0.0, 0.0], atol=1e-6)


def test_swingup_closed_loop(pendulum_problem, swingup_solution):
    """Track the optimized trajectory with trajectory-source + PD, reference
    acceptance: final state within 1e-3 of [pi, 0]."""
    system, problem, x0, xf = pendulum_problem
    params = system.default_params
    sol = swingup_solution
    Kp, Kd = 10.0, 1.0
    dt = 1e-3
    t_final = float(sol.h) * 20

    def policy(_, x, t):
        u_ff = dircol.reconstruct_input(sol, t)
        x_des = dircol.reconstruct_state(sol, params, system, t)
        return u_ff + jnp.array([Kp * (x_des[0] - x[0]) + Kd * (x_des[1] - x[1])])

    n = int(t_final / dt)
    xs, _, _ = simulator.simulate_controlled(system, params, x0, policy, n, dt)
    assert float(jnp.linalg.norm(xs[-1] - xf)) < 1e-3


def test_reconstruct_consistency(pendulum_problem, swingup_solution):
    """Interpolants hit the knot values exactly."""
    system, problem, x0, xf = pendulum_problem
    sol = swingup_solution
    for k in (0, 7, 20):
        t = float(sol.h) * k
        np.testing.assert_allclose(
            dircol.reconstruct_input(sol, jnp.asarray(t, F64)), sol.us[k], atol=1e-9
        )
        np.testing.assert_allclose(
            dircol.reconstruct_state(sol, system.default_params, system, jnp.asarray(t, F64)),
            sol.xs[k],
            atol=1e-9,
        )
