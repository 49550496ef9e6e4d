"""Integrator accuracy/order tests.

Mirrors systems/analysis/test_utilities/ (closed-form ODE zoo run against
every integrator): exponential decay and harmonic oscillator convergence
orders, stiff-problem stability for the implicit methods, and the adaptive
driver's error control.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.systems import integrators, simulator
from drake_tpu.systems.base import ContinuousSystem

F64 = jnp.float64


def decay(params, x, u, t):
    return -x


def oscillator(params, x, u, t):
    # x = [q, v], qdot = v, vdot = -q
    return jnp.stack([x[..., 1], -x[..., 0]], axis=-1)


EXPECTED_ORDER = {
    "explicit_euler": 1,
    "rk2": 2,
    "rk3": 3,
    "rk4": 4,
    "bogacki_shampine3": 3,
    "rk5": 5,
    "implicit_euler": 1,
    "implicit_trapezoid": 2,
    "radau3": 3,
    "radau1": 1,
}


@pytest.mark.parametrize("name,order", sorted(EXPECTED_ORDER.items()))
def test_convergence_order(name, order):
    """Error on exp decay scales as dt^order."""
    step = integrators.get(name)
    x0 = jnp.array([1.0], dtype=F64)
    u = jnp.zeros(1, dtype=F64)
    T = 1.0
    errs = []
    for n in (40, 80):
        dt = T / n

        def body(i, x):
            return step(decay, None, x, u, i * dt, dt)

        x = jax.jit(lambda x0: jax.lax.fori_loop(0, n, body, x0))(x0)
        errs.append(abs(float(x[0]) - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.5, f"{name}: rate {rate} < {order}"


def test_semi_explicit_euler_energy():
    """Symplectic Euler approximately conserves oscillator energy (no drift)."""
    x0 = jnp.array([1.0, 0.0], dtype=F64)
    u = jnp.zeros(1, dtype=F64)
    dt = 0.01

    def body(i, x):
        return integrators.semi_explicit_euler(oscillator, None, x, u, 0.0, dt, num_q=1)

    x = jax.jit(lambda x: jax.lax.fori_loop(0, 5000, body, x))(x0)
    E = 0.5 * (x[0] ** 2 + x[1] ** 2)
    assert abs(float(E) - 0.5) < 0.01  # bounded, no exponential drift


def test_implicit_euler_stiff_stability():
    """Stiff lambda=-1000: explicit euler at dt=0.01 diverges, implicit doesn't.
    (Mirror of the Robertson-stiff-system intent in the reference suite.)"""

    def stiff(params, x, u, t):
        return -1000.0 * x

    x0 = jnp.array([1.0], dtype=F64)
    u = jnp.zeros(1, dtype=F64)
    x_exp = integrators.explicit_euler(stiff, None, x0, u, 0.0, 0.01)
    x_imp = integrators.implicit_euler(stiff, None, x0, u, 0.0, 0.01)
    assert abs(float(x_exp[0])) > 1.0  # diverging oscillation
    assert 0.0 < float(x_imp[0]) < 0.2  # 1/(1+10) ~ 0.0909


def test_radau3_l_stable():
    """L-stability: |R(inf)| = 0 — a very stiff step lands near zero, with
    no oscillation (unlike the trapezoid rule whose R(inf) = -1)."""

    def stiff(params, x, u, t):
        return -1e6 * x

    x0 = jnp.array([1.0], dtype=F64)
    u = jnp.zeros(1, dtype=F64)
    x_r = integrators.radau3(stiff, None, x0, u, 0.0, 1.0)
    assert abs(float(x_r[0])) < 1e-4
    x_tr = integrators.implicit_trapezoid(stiff, None, x0, u, 0.0, 1.0)
    assert abs(float(x_tr[0])) > 0.5  # trapezoid rings at stiffness


def test_velocity_implicit_euler_matches_implicit_euler():
    """For a system with qdot = v, the velocity-implicit update
    (q+ = q + dt v+, v+ = v + dt a(q+, v+)) IS backward Euler — the two
    integrators must agree to Newton tolerance."""
    x0 = jnp.array([1.0, 0.0], dtype=F64)
    u = jnp.zeros(1, dtype=F64)
    dt = 0.05
    x_ie = integrators.implicit_euler(oscillator, None, x0, u, 0.0, dt)
    x_vie = integrators.velocity_implicit_euler(
        oscillator, None, x0, u, 0.0, dt, num_q=1
    )
    np.testing.assert_allclose(np.asarray(x_vie), np.asarray(x_ie), atol=1e-10)


def test_adaptive_matches_closed_form():
    system = ContinuousSystem(f=oscillator, num_states=2, num_inputs=1)
    x0 = jnp.array([1.0, 0.0], dtype=F64)
    u_fn = lambda t, x: jnp.zeros(1, dtype=F64)
    xf, stats = simulator.simulate_adaptive(
        system, None, x0, u_fn, t_final=2 * jnp.pi, accuracy=1e-8
    )
    np.testing.assert_allclose(xf, x0, atol=1e-6)
    assert int(stats["num_steps"]) < 500


def test_adaptive_jits():
    system = ContinuousSystem(f=oscillator, num_states=2, num_inputs=1)
    x0 = jnp.array([1.0, 0.0], dtype=F64)
    u_fn = lambda t, x: jnp.zeros(1, dtype=F64)
    fn = jax.jit(
        lambda x: simulator.simulate_adaptive(system, None, x, u_fn, t_final=1.0)[0]
    )
    out = fn(x0)
    np.testing.assert_allclose(out, fn(x0), atol=0)


class TestDenseOutput:
    """HermitianDenseOutput role (systems/analysis/hermitian_dense_output.h):
    a C1 interpolant of the simulation trace queried at arbitrary times."""

    def test_matches_analytic_oscillator(self):
        from drake_tpu.systems import simulator
        from drake_tpu.systems.base import ContinuousSystem

        sys_ = ContinuousSystem(
            f=lambda p, x, u, t: jnp.array([x[1], -x[0]]),
            num_states=2, num_inputs=0,
        )
        x0 = jnp.array([1.0, 0.0], jnp.float64)
        us = jnp.zeros((50, 0), jnp.float64)
        xs, ts = simulator.simulate(sys_, None, x0, us, 0.1, method="rk4")
        traj = simulator.dense_output(sys_, None, xs, ts, us)
        tq = jnp.linspace(0.0, 5.0, 77)
        vals = jax.vmap(traj.value)(tq)
        np.testing.assert_allclose(
            np.asarray(vals[:, 0]), np.cos(np.asarray(tq)), atol=2e-5)
        # C1: derivative matches -sin between knots too
        dv = jax.vmap(lambda t: traj.derivative_value(t))(tq[3:-3])
        np.testing.assert_allclose(
            np.asarray(dv[:, 0]), -np.sin(np.asarray(tq[3:-3])), atol=5e-4)
