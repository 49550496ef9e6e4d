"""Fixed- and adaptive-step integrators as pure step functions.

Re-derivation of Drake's integrator zoo (reference: systems/analysis/
integrator_base.h and the explicit_euler/runge_kutta{2,3,5}/
bogacki_shampine3/implicit_euler integrators).  Each fixed-step integrator is

    step(f, params, x, u, t, dt) -> x_next

pure and vmappable; the error-controlled drivers run embedded pairs under
``lax.while_loop`` so they stay inside jit.  Butcher tableaus are standard
(Hairer-Norsett-Wanner), independently written — only the *set* of methods
mirrors Drake.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def explicit_euler(f, params, x, u, t, dt):
    return x + dt * f(params, x, u, t)


def midpoint(f, params, x, u, t, dt):
    """Explicit midpoint = Drake's RungeKutta2Integrator."""
    k1 = f(params, x, u, t)
    return x + dt * f(params, x + 0.5 * dt * k1, u, t + 0.5 * dt)


# Drake's rk2 is actually the explicit trapezoid? RungeKutta2 uses midpoint per
# runge_kutta2_integrator.h; keep midpoint as rk2.
rk2 = midpoint


def rk3(f, params, x, u, t, dt):
    """Kutta's third-order method (Drake RungeKutta3Integrator tableau)."""
    k1 = f(params, x, u, t)
    k2 = f(params, x + 0.5 * dt * k1, u, t + 0.5 * dt)
    k3 = f(params, x + dt * (-k1 + 2.0 * k2), u, t + dt)
    return x + dt * (k1 + 4.0 * k2 + k3) / 6.0


def rk4(f, params, x, u, t, dt):
    """Classic RK4 — the workhorse for scan-based rollouts."""
    k1 = f(params, x, u, t)
    k2 = f(params, x + 0.5 * dt * k1, u, t + 0.5 * dt)
    k3 = f(params, x + 0.5 * dt * k2, u, t + 0.5 * dt)
    k4 = f(params, x + dt * k3, u, t + dt)
    return x + dt * (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0


def bogacki_shampine3(f, params, x, u, t, dt):
    """Bogacki-Shampine 3(2); returns the 3rd-order solution."""
    k1 = f(params, x, u, t)
    k2 = f(params, x + 0.5 * dt * k1, u, t + 0.5 * dt)
    k3 = f(params, x + 0.75 * dt * k2, u, t + 0.75 * dt)
    return x + dt * (2.0 * k1 + 3.0 * k2 + 4.0 * k3) / 9.0


# Dormand-Prince 5(4) coefficients.
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (
    5179 / 57600,
    0.0,
    7571 / 16695,
    393 / 640,
    -92097 / 339200,
    187 / 2100,
    1 / 40,
)


def _dopri_stages(f, params, x, u, t, dt):
    ks = []
    for i in range(7):
        xi = x
        for j, a in enumerate(_DP_A[i]):
            xi = xi + dt * a * ks[j]
        ks.append(f(params, xi, u, t + _DP_C[i] * dt))
    return ks


def rk5(f, params, x, u, t, dt):
    """Dormand-Prince 5th order (Drake RungeKutta5Integrator family)."""
    ks = _dopri_stages(f, params, x, u, t, dt)
    dx = sum(b * k for b, k in zip(_DP_B5, ks) if b != 0.0)
    return x + dt * dx


def semi_explicit_euler(f, params, x, u, t, dt, num_q=None):
    """Symplectic Euler for x=[q; v]: v first, then q with the new v.

    Matches Drake's SemiExplicitEulerIntegrator for systems where qdot = v.
    Falls back to explicit Euler when the q/v split is unknown.
    """
    if num_q is None:
        return explicit_euler(f, params, x, u, t, dt)
    xdot = f(params, x, u, t)
    v_next = x[..., num_q:] + dt * xdot[..., num_q:]
    x_mid = jnp.concatenate([x[..., :num_q], v_next], axis=-1)
    qdot = f(params, x_mid, u, t)[..., :num_q]
    q_next = x[..., :num_q] + dt * qdot
    return jnp.concatenate([q_next, v_next], axis=-1)


def implicit_euler(f, params, x, u, t, dt, newton_iters: int = 8):
    """Implicit Euler via full-Newton on r(y) = y - x - dt f(y).

    Drake's ImplicitEulerIntegrator (implicit_euler_integrator.h) does the
    same Newton solve with a reused Jacobian; here jacfwd gives the exact
    Jacobian each iteration and a fixed iteration count keeps it jittable.
    """

    def residual(y):
        return y - x - dt * f(params, y, u, t + dt)

    def body(_, y):
        r = residual(y)
        J = jax.jacfwd(residual)(y)
        return y - jnp.linalg.solve(J, r)

    y0 = x + dt * f(params, x, u, t)  # explicit Euler predictor
    return jax.lax.fori_loop(0, newton_iters, body, y0)


def implicit_trapezoid(f, params, x, u, t, dt, newton_iters: int = 8):
    """Implicit trapezoid rule (2nd order A-stable), Newton-solved."""
    f0 = f(params, x, u, t)

    def residual(y):
        return y - x - 0.5 * dt * (f0 + f(params, y, u, t + dt))

    def body(_, y):
        r = residual(y)
        J = jax.jacfwd(residual)(y)
        return y - jnp.linalg.solve(J, r)

    y0 = x + dt * f0
    return jax.lax.fori_loop(0, newton_iters, body, y0)


# Radau IIA 2-stage (order 3, L-stable) tableau.
_RADAU_A = ((5.0 / 12.0, -1.0 / 12.0), (3.0 / 4.0, 1.0 / 4.0))
_RADAU_B = (3.0 / 4.0, 1.0 / 4.0)
_RADAU_C = (1.0 / 3.0, 1.0)


def radau3(f, params, x, u, t, dt, newton_iters: int = 8):
    """2-stage Radau IIA (order 3, L-stable) — Drake's RadauIntegrator
    default (systems/analysis/radau_integrator.h, num_stages=2).

    Newton on the stacked stage derivatives K = (k1, k2): the residual is
    k_i - f(x + dt sum_j a_ij k_j).  Fixed iteration count keeps it inside
    jit; the Jacobian is exact via jacfwd (2n x 2n dense — fine at ODE
    sizes; the win over implicit Euler is order + stiff accuracy)."""
    n = x.shape[0]

    def residual(K):
        k1, k2 = K[:n], K[n:]
        x1 = x + dt * (_RADAU_A[0][0] * k1 + _RADAU_A[0][1] * k2)
        x2 = x + dt * (_RADAU_A[1][0] * k1 + _RADAU_A[1][1] * k2)
        r1 = k1 - f(params, x1, u, t + _RADAU_C[0] * dt)
        r2 = k2 - f(params, x2, u, t + _RADAU_C[1] * dt)
        return jnp.concatenate([r1, r2])

    def body(_, K):
        r = residual(K)
        J = jax.jacfwd(residual)(K)
        return K - jnp.linalg.solve(J, r)

    k0 = f(params, x, u, t)
    K = jax.lax.fori_loop(0, newton_iters, body, jnp.concatenate([k0, k0]))
    k1, k2 = K[:n], K[n:]
    return x + dt * (_RADAU_B[0] * k1 + _RADAU_B[1] * k2)


def radau1(f, params, x, u, t, dt, newton_iters: int = 8):
    """1-stage Radau IIA == implicit Euler (Drake RadauIntegrator<T,1>)."""
    return implicit_euler(f, params, x, u, t, dt, newton_iters)


def velocity_implicit_euler(
    f, params, x, u, t, dt, num_q: int, newton_iters: int = 8
):
    """Implicit Euler implicit in the *velocities only* — Drake's
    VelocityImplicitEulerIntegrator (velocity_implicit_euler_integrator.h).

    For x = [q; v] with qdot = v:  q+ = q + dt v+,  v+ = v + dt a(q+, v+).
    Newton runs on the nv-dim v-residual instead of the full state — the
    Jacobian solve is 8x smaller in flops at nq == nv."""
    q, v = x[:num_q], x[num_q:]

    def residual(v_next):
        q_next = q + dt * v_next
        x_next = jnp.concatenate([q_next, v_next])
        a = f(params, x_next, u, t + dt)[num_q:]
        return v_next - v - dt * a

    def body(_, v_next):
        r = residual(v_next)
        J = jax.jacfwd(residual)(v_next)
        return v_next - jnp.linalg.solve(J, r)

    v0 = v + dt * f(params, x, u, t)[num_q:]
    v_next = jax.lax.fori_loop(0, newton_iters, body, v0)
    return jnp.concatenate([q + dt * v_next, v_next])


_REGISTRY = {
    "explicit_euler": explicit_euler,
    "euler": explicit_euler,
    "rk2": rk2,
    "midpoint": midpoint,
    "rk3": rk3,
    "rk4": rk4,
    "rk5": rk5,
    "bogacki_shampine3": bogacki_shampine3,
    "semi_explicit_euler": semi_explicit_euler,
    "implicit_euler": implicit_euler,
    "implicit_trapezoid": implicit_trapezoid,
    "radau3": radau3,
    "radau1": radau1,
    "velocity_implicit_euler": velocity_implicit_euler,
}


def get(name: str):
    """Look up an integrator step function by name (SimulatorConfig-style).

    Mirrors ApplySimulatorConfig's integration_scheme string selection
    (systems/analysis/simulator_config_functions.h).
    """
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown integrator '{name}'; available: {sorted(_REGISTRY)}"
        ) from None


def step_error_controlled(f, params, x, u, t, dt):
    """One Dormand-Prince 5(4) attempt: returns (x5, error_estimate)."""
    ks = _dopri_stages(f, params, x, u, t, dt)
    dx5 = sum(b * k for b, k in zip(_DP_B5, ks) if b != 0.0)
    dx4 = sum(b * k for b, k in zip(_DP_B4, ks) if b != 0.0)
    x5 = x + dt * dx5
    err = dt * (dx5 - dx4)
    return x5, err
