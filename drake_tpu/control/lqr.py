"""LQR family: infinite-horizon (CARE/DARE) and finite-horizon (Riccati scan).

Re-derivation of Drake's systems/controllers/linear_quadratic_regulator.h:43,72
(and the system-linearizing overloads :103,148) plus
finite_horizon_linear_quadratic_regulator.h:154.  Drake integrates the Riccati
ODE backward by running a Simulator on negated time
(finite_horizon_linear_quadratic_regulator.cc:331-335); here it is a
``lax.scan`` over RK4 steps — fully jittable and differentiable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from drake_tpu.math.riccati import solve_care, solve_dare
from drake_tpu.systems.base import ContinuousSystem


@dataclasses.dataclass(frozen=True)
class LqrResult:
    K: jnp.ndarray  # feedback gain
    S: jnp.ndarray  # cost-to-go / Riccati solution


def lqr(A, B, Q, R, N=None) -> LqrResult:
    """Continuous-time infinite-horizon LQR.

    With cross term N: substitute u = -R^{-1}N'x + v, matching
    LinearQuadraticRegulator (linear_quadratic_regulator.cc:89).
    """
    if N is not None:
        Rinv_Nt = jnp.linalg.solve(R, N.T)
        A_eff = A - B @ Rinv_Nt
        Q_eff = Q - N @ Rinv_Nt
        S = solve_care(A_eff, B, Q_eff, R)
        K = jnp.linalg.solve(R, B.T @ S + N.T)
    else:
        S = solve_care(A, B, Q, R)
        K = jnp.linalg.solve(R, B.T @ S)
    return LqrResult(K=K, S=S)


def discrete_lqr(A, B, Q, R) -> LqrResult:
    """Discrete-time infinite-horizon LQR (DiscreteTimeLinearQuadraticRegulator)."""
    S = solve_dare(A, B, Q, R)
    K = jnp.linalg.solve(R + B.T @ S @ B, B.T @ S @ A)
    return LqrResult(K=K, S=S)


def lqr_for_system(
    system: ContinuousSystem, params, x0, u0, Q, R, N=None
) -> LqrResult:
    """Linearize a nonlinear system about a fixed point, then LQR.

    Mirror of the System overload of LinearQuadraticRegulator
    (linear_quadratic_regulator.h:103): the closed-loop input is
    u = u0 - K (x - x0).
    """
    A, B = system.linearize(params, x0, u0)
    return lqr(A, B, Q, R, N)


@dataclasses.dataclass(frozen=True)
class FiniteHorizonLqrResult:
    """Time-indexed gains on a uniform grid ts (index 0 = t0)."""

    ts: jnp.ndarray  # (N+1,)
    K: jnp.ndarray  # (N+1, nu, nx)
    S: jnp.ndarray  # (N+1, nx, nx)
    k0: jnp.ndarray  # (N+1, nu)  affine feedforward term
    sx: jnp.ndarray  # (N+1, nx)  linear cost-to-go term
    x0: jnp.ndarray  # (N+1, nx)  nominal state trajectory
    u0: jnp.ndarray  # (N+1, nu)  nominal input trajectory


def finite_horizon_lqr(
    system: ContinuousSystem,
    params,
    Q,
    R,
    t0: float,
    tf: float,
    num_steps: int,
    x0_traj=None,
    u0_traj=None,
    Qf=None,
    xd_traj=None,
) -> FiniteHorizonLqrResult:
    """Time-varying LQR about a (possibly time-varying) nominal trajectory.

    Args:
      x0_traj, u0_traj: (N+1, nx)/(N+1, nu) nominal trajectory samples on the
        uniform grid; if 1-D they are broadcast as a fixed point.
      Qf: terminal cost on state error (defaults to S(tf)=Qf or zeros).
      xd_traj: desired state (defaults to the nominal x0_traj), producing the
        affine terms exactly as FiniteHorizonLinearQuadraticRegulatorOptions'
        xd does (finite_horizon_linear_quadratic_regulator.cc RiccatiSystem).

    Returns gains such that  u*(t) = u0(t) - K(t)(x - x0(t)) - k0(t).

    The Riccati ODE  -Sdot = Q + A'S + SA - (SB)R^{-1}(B'S)  and the linear
    term  -sxdot = (A - B K)' sx - Q xd_err  are integrated backward with RK4
    on the uniform grid via lax.scan.
    """
    nx = system.num_states
    nu = system.num_inputs
    dtype = jnp.asarray(Q).dtype
    ts = jnp.linspace(t0, tf, num_steps + 1, dtype=dtype)
    dt = (tf - t0) / num_steps

    def _expand(traj, n, default=0.0):
        if traj is None:
            return jnp.full((num_steps + 1, n), default, dtype=dtype)
        traj = jnp.asarray(traj, dtype)
        if traj.ndim == 1:
            return jnp.broadcast_to(traj, (num_steps + 1, n))
        return traj

    x0s = _expand(x0_traj, nx)
    u0s = _expand(u0_traj, nu)
    xds = x0s if xd_traj is None else _expand(xd_traj, nx)

    if Qf is None:
        Qf = jnp.zeros((nx, nx), dtype)

    # Linearize along the nominal trajectory (vmapped jacobians).
    def lin(x, u, t):
        A = jax.jacfwd(lambda xx: system.f(params, xx, u, t))(x)
        B = jax.jacfwd(lambda uu: system.f(params, x, uu, t))(u)
        return A, B

    As, Bs = jax.vmap(lin)(x0s, u0s, ts)

    Rinv = jnp.linalg.inv(R)

    # Backward propagation of the Riccati flow via the Hamiltonian matrix
    # exponential (Mobius transform): with H = [[A, -G], [-Q, -A']] and
    # [X; Y] solving the linear ODE, S = Y X^{-1} solves the Riccati ODE.
    # One exact frozen-coefficient step backward is
    #     [Xp; Yp] = expm(-dt H) [I; S],   S_prev = Yp Xp^{-1}.
    # Unconditionally stable (plain RK on the Riccati ODE blows up when
    # ||S B R^{-1} B' || dt is large), and the expm batch is precomputed with
    # vmap — dense matmuls on the MXU.  Drake instead integrates the Riccati
    # ODE with an error-controlled integrator on negated time
    # (finite_horizon_linear_quadratic_regulator.cc:331-335).
    def hamiltonian(A, B):
        G = B @ Rinv @ B.T
        return jnp.block([[A, -G], [-Q, -jnp.swapaxes(A, -1, -2)]])

    Hs = jax.vmap(hamiltonian)(As, Bs)
    Phis = jax.vmap(jax.scipy.linalg.expm)(-dt * Hs)  # (N+1, 2nx, 2nx)

    def body(carry, inp):
        S, sx = carry
        Phi, A, B, xd_err = inp
        XY = jnp.concatenate([jnp.eye(nx, dtype=dtype), S], axis=0)
        XYp = Phi @ XY
        Xp, Yp = XYp[:nx], XYp[nx:]
        S_prev = jnp.linalg.solve(Xp.T, Yp.T).T  # Yp Xp^{-1}
        S_prev = 0.5 * (S_prev + S_prev.T)
        # Linear term: in backward time tau = tf - t the ODE is
        # dsx/dtau = (A - B K)' sx - Q xd_err; implicit Euler:
        # (I - dt Acl') sx_prev = sx - dt Q xd_err.
        K = Rinv @ B.T @ S_prev
        Acl = A - B @ K
        sx_prev = jnp.linalg.solve(
            jnp.eye(nx, dtype=dtype) - dt * Acl.T, sx - dt * (Q @ xd_err)
        )
        return (S_prev, sx_prev), (S_prev, sx_prev)

    xd_errs = x0s - xds
    S_T = jnp.asarray(Qf, dtype)
    sx_T = Qf @ xd_errs[-1]
    inputs = (Phis[1:][::-1], As[1:][::-1], Bs[1:][::-1], xd_errs[1:][::-1])
    (_, _), (Ss_rev, sxs_rev) = jax.lax.scan(body, (S_T, sx_T), inputs)
    Ss = jnp.concatenate([Ss_rev[::-1], S_T[None]], axis=0)
    sxs = jnp.concatenate([sxs_rev[::-1], sx_T[None]], axis=0)

    Ks = jax.vmap(lambda B, S: Rinv @ B.T @ S)(Bs, Ss)
    k0s = jax.vmap(lambda B, sx: Rinv @ B.T @ sx)(Bs, sxs)
    return FiniteHorizonLqrResult(ts=ts, K=Ks, S=Ss, k0=k0s, sx=sxs, x0=x0s, u0=u0s)


def tvlqr_policy(res: FiniteHorizonLqrResult):
    """Closed-loop policy u(t, x) with zero-order interpolation of the gains."""
    t0 = res.ts[0]
    dt = res.ts[1] - res.ts[0]
    n = res.ts.shape[0] - 1

    def policy(_, x, t):
        idx = jnp.clip(((t - t0) / dt).astype(jnp.int32), 0, n)
        K = res.K[idx]
        k0 = res.k0[idx]
        x0 = res.x0[idx]
        u0 = res.u0[idx]
        return u0 - K @ (x - x0) - k0

    return policy
