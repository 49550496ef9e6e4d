"""Direct transcription tests.

Mirrors planning/trajectory_optimization/test/direct_transcription_test.cc
idioms: defect correctness against the known discrete update, a
discrete-LTI reach problem whose solution is checkable against the dynamics,
and a discretized-pendulum swing-up exercising the nonlinear path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.models import pendulum
from drake_tpu.solvers.sqp import SqpOptions
from drake_tpu.systems import base as systems_base
from drake_tpu.systems.primitives import discrete_linear_system
from drake_tpu.trajopt import dirtran

F64 = jnp.float64


def _double_integrator(h=0.1):
    A = jnp.array([[1.0, h], [0.0, 1.0]], dtype=F64)
    B = jnp.array([[0.5 * h * h], [h]], dtype=F64)
    return discrete_linear_system(A, B, h), A, B


def test_defects_match_discrete_update():
    system, A, B = _double_integrator()
    problem = dirtran.DirtranProblem(system=system, num_time_samples=4)
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (4, 2), dtype=F64)
    us = jax.random.normal(jax.random.PRNGKey(1), (3, 1), dtype=F64)
    z = problem.pack(xs, us)
    d = problem.defects(None, z).reshape(3, 2)
    expected = xs[1:] - (xs[:-1] @ A.T + us @ B.T)
    np.testing.assert_allclose(np.asarray(d), np.asarray(expected), atol=1e-12)


def test_lti_reach_is_dynamically_feasible():
    """min sum u^2 driving a double integrator 0 -> [1, 0] in N steps."""
    system, A, B = _double_integrator()
    N = 11
    x0 = jnp.zeros(2, dtype=F64)
    xf = jnp.array([1.0, 0.0], dtype=F64)
    problem = dirtran.DirtranProblem(
        system=system,
        num_time_samples=N,
        running_cost=lambda x, u: jnp.sum(u**2),
        x0=x0,
        xf=xf,
    )
    z0 = problem.initial_guess(x0, xf, dtype=F64)
    sol = dirtran.solve(problem, None, z0, SqpOptions(max_iters=30))
    assert float(sol.constraint_violation) < 1e-6
    # Re-simulate the optimized inputs: must land on the target exactly.
    x = x0
    for k in range(N - 1):
        x = A @ x + B @ sol.us[k]
    np.testing.assert_allclose(np.asarray(x), np.asarray(xf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol.xs[-1]), np.asarray(xf), atol=1e-6)
    # Minimum-effort LTI reach is symmetric in time: u reversed ~ -u.
    u = np.asarray(sol.us)[:, 0]
    np.testing.assert_allclose(u, -u[::-1], atol=1e-4)


def test_pendulum_swingup_discretized():
    cont = pendulum.make_system(pendulum.default_params(F64))
    system = systems_base.discretize(cont, 0.1, method="rk4")
    x0 = jnp.array([0.0, 0.0], dtype=F64)
    xf = jnp.array([jnp.pi, 0.0], dtype=F64)
    problem = dirtran.DirtranProblem(
        system=system,
        num_time_samples=31,
        running_cost=lambda x, u: 10.0 * u[0] ** 2,
        x0=x0,
        xf=xf,
        u_lower=jnp.array([-4.0], dtype=F64),
        u_upper=jnp.array([4.0], dtype=F64),
    )
    z0 = problem.initial_guess(x0, xf, dtype=F64)
    sol = dirtran.solve(problem, cont.default_params, z0, SqpOptions(max_iters=60))
    assert float(sol.constraint_violation) < 1e-5
    np.testing.assert_allclose(np.asarray(sol.xs[-1]), np.asarray(xf), atol=1e-4)
    assert np.all(np.abs(np.asarray(sol.us)) <= 4.0 + 1e-6)
