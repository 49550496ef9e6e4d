"""ZMP planner: CoM trajectory from a desired ZMP via LIPM output-tracking
LQR.

Re-derivation of the reference's ZmpPlanner (planning/locomotion/
zmp_planner.h): linear inverted pendulum x = [c; cdot], u = cddot, output
y = c - (z/g) u (the CoP), cost |y - y_d|_Qy^2 + |u|_R^2.  The reference
solves the continuous problem analytically against piecewise-polynomial
references (exponential + polynomial closed forms); the TPU shape is a
discrete-time affine tracking LQR — one backward lax.scan for the value
function (S, s) and gains (K, k), one forward scan for the nominal
trajectory — which accepts ANY sampled reference and jits/vmaps/grads.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class ZmpPlan(NamedTuple):
    ts: jnp.ndarray  # (N+1,)
    com: jnp.ndarray  # (N+1, 2)
    comd: jnp.ndarray  # (N+1, 2)
    u: jnp.ndarray  # (N, 2) CoM accelerations
    cop: jnp.ndarray  # (N, 2) realized ZMP
    K: jnp.ndarray  # (N, 2, 4) feedback gains
    k: jnp.ndarray  # (N, 2) feedforward
    S: jnp.ndarray  # (4, 4) value Hessian at t0
    x0: jnp.ndarray

    def policy(self, step: int, x):
        """u(x) at grid step: the time-varying linear policy."""
        return -self.K[step] @ x - self.k[step]


def plan_zmp(
    zmp_d: Callable,  # t -> (2,) desired ZMP
    x0,  # (4,) [cx, cy, cxdot, cydot]
    height: float,
    t_final: float,
    dt: float = 0.01,
    gravity: float = 9.81,
    Qy=None,
    R=None,
) -> ZmpPlan:
    dtype = jnp.asarray(x0).dtype
    x0 = jnp.asarray(x0, dtype)
    Qy = jnp.eye(2, dtype=dtype) if Qy is None else jnp.asarray(Qy, dtype)
    R = 0.1 * jnp.eye(2, dtype=dtype) if R is None else jnp.asarray(R, dtype)
    n = int(round(t_final / dt))
    ts = dt * jnp.arange(n + 1, dtype=dtype)

    # Planar LIPM, both axes stacked: x = [c (2); cdot (2)], u = cddot (2).
    I2 = jnp.eye(2, dtype=dtype)
    Z2 = jnp.zeros((2, 2), dtype)
    Ad = jnp.block([[I2, dt * I2], [Z2, I2]])
    Bd = jnp.concatenate([0.5 * dt * dt * I2, dt * I2], axis=0)
    C = jnp.concatenate([I2, Z2], axis=1)
    D = -(height / gravity) * I2

    # Stage cost: |C x + D u - yd|_Qy^2 + |u|_R^2, scaled by dt.
    Q = dt * C.T @ Qy @ C
    N = dt * C.T @ Qy @ D
    Rt = dt * (R + D.T @ Qy @ D)

    yds = jax.vmap(zmp_d)(ts[:-1])  # (N, 2)

    def backward(carry, yd):
        S, s = carry
        q = -dt * (C.T @ Qy @ yd)
        r = -dt * (D.T @ Qy @ yd)
        G = Rt + Bd.T @ S @ Bd
        Ginv = jnp.linalg.inv(G)
        K = Ginv @ (N.T + Bd.T @ S @ Ad)
        kff = Ginv @ (r + Bd.T @ s)
        M = N + Ad.T @ S @ Bd
        S_new = Q + Ad.T @ S @ Ad - M @ Ginv @ M.T
        S_new = 0.5 * (S_new + S_new.T)
        s_new = q + Ad.T @ s - M @ kff
        return (S_new, s_new), (K, kff)

    # Terminal value: weight the final CoM toward the final desired ZMP
    # (the reference anchors the tail with the stationary CARE solution;
    # a stiff terminal cost plays that role on a finite grid).
    yd_f = zmp_d(ts[-1])
    w_f = 1e3
    S_f = w_f * C.T @ Qy @ C
    s_f = -w_f * C.T @ Qy @ yd_f
    (S0, s0), (Ks, ks) = jax.lax.scan(
        backward, (S_f, s_f), yds, reverse=True
    )

    def forward(x, Kk):
        K, kff = Kk
        u = -K @ x - kff
        x_next = Ad @ x + Bd @ u
        return x_next, (x_next, u)

    _, (xs_tail, us) = jax.lax.scan(forward, x0, (Ks, ks))
    xs = jnp.concatenate([x0[None], xs_tail], axis=0)
    cops = jnp.einsum("ij,nj->ni", C, xs[:-1]) + jnp.einsum(
        "ij,nj->ni", D, us
    )
    return ZmpPlan(
        ts=ts, com=xs[:, :2], comd=xs[:, 2:], u=us, cop=cops,
        K=Ks, k=ks, S=S0, x0=x0,
    )
