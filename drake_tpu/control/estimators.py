"""State estimators: steady-state Kalman filter and Luenberger observer.

Re-derivation of systems/estimators/ (reference: kalman_filter.h:38
SteadyStateKalmanFilter via CARE/DARE, luenberger_observer.h).  Filters are
returned as pure scan-able update functions.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from drake_tpu.math.riccati import solve_care, solve_dare


class KalmanGains(NamedTuple):
    L: jnp.ndarray  # observer gain
    P: jnp.ndarray  # steady-state covariance


def steady_state_kalman_filter(A, C, W, V) -> KalmanGains:
    """Continuous-time steady-state KF: L = P C' V^{-1} with P solving the
    filter CARE  A P + P A' - P C' V^{-1} C P + W = 0.

    (The dual of LQR — solved with the same matrix-sign CARE.)
    """
    A = jnp.asarray(A)
    C = jnp.asarray(C)
    P = solve_care(A.T, C.T, jnp.asarray(W), jnp.asarray(V))
    L = P @ C.T @ jnp.linalg.inv(jnp.asarray(V))
    return KalmanGains(L=L, P=P)


def discrete_kalman_filter(A, C, W, V) -> KalmanGains:
    """Discrete steady-state KF: P = DARE(A', C', W, V), L = A P C'(CPC'+V)^-1."""
    A = jnp.asarray(A)
    C = jnp.asarray(C)
    P = solve_dare(A.T, C.T, jnp.asarray(W), jnp.asarray(V))
    L = A @ P @ C.T @ jnp.linalg.inv(C @ P @ C.T + jnp.asarray(V))
    return KalmanGains(L=L, P=P)


def luenberger_observer(system, params, L, C, dt: float, method="rk4"):
    """Continuous observer xhat' = f(xhat, u) + L (y - C xhat), discretized.

    Returns update(xhat, u, y, t) -> xhat_next.  Mirrors LuenbergerObserver.
    """
    from drake_tpu.systems import integrators

    step = integrators.get(method)
    L = jnp.asarray(L)
    C = jnp.asarray(C)

    def f_obs(p, xhat, uy, t):
        u, y = uy
        innovation = y - C @ xhat
        return system.f(p, xhat, u, t) + L @ innovation

    def update(xhat, u, y, t=0.0):
        return step(f_obs, params, xhat, (u, y), t, dt)

    return update
