"""TAMSI: transition-aware modified semi-implicit contact solver.

Re-derivation of the reference's TamsiSolver (multibody/plant/
tamsi_solver.h, Castro et al. 2019) — the pre-SAP default: Newton on the
two-way-coupled velocity residual

    R(v) = A (v - v*) - h [Jn' fn(v) + Jt' ft(v)] = 0,
    fn = k (1 - d vn)+ (x0 - h vn)+              (compliant normal, Eq. 5-8)
    ft = -mu_reg(|vt|/vs) fn t_hat               (regularized Stribeck)

with the quadratic friction regularizer mu_reg(s) = mu s (2 - s) for s<1,
mu otherwise (tamsi_solver.h:32).  The reference hand-codes the residual
Jacobian and guards Newton with an angle-limited line search; here the
Jacobian is jax.jacfwd of the (smooth) residual and the guard is plain
backtracking on |R| — at dense robot scale that is both simpler and the
right TPU shape (small dense ops, fixed-shape loops, vmappable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drake_tpu.contact.sap import SapData, SapSolution


def solve_tamsi(
    data: SapData,
    contact,
    h: float,
    v_guess=None,
    v_stiction: float = 1e-4,
    max_iterations: int = 40,
    rel_tolerance: float = 1e-8,
) -> SapSolution:
    """Solve the TAMSI velocity update for the assembled problem.

    Uses SapData's A/v_star/J plus the raw contact (phi, stiffness,
    dissipation, friction).  Returns SapSolution for API parity (gamma =
    h * contact forces in the contact frame).
    """
    nc = data.J.shape[0]
    dtype = data.v_star.dtype
    v0 = data.v_star if v_guess is None else v_guess
    if nc == 0:
        return SapSolution(
            v=data.v_star, gamma=jnp.zeros((0, 3), dtype),
            iterations=jnp.array(0),
            momentum_residual=jnp.asarray(0.0, dtype),
        )

    Jn = data.J[:, 2, :]  # (nc, nv)
    Jt = data.J[:, :2, :]  # (nc, 2, nv)
    x0 = -contact.phi  # penetration, positive when overlapping
    k = contact.stiffness
    d = contact.dissipation
    mu = contact.friction
    vs = v_stiction

    def forces(v):
        vn = Jn @ v  # (nc,) separation velocities
        vt = jnp.einsum("cij,j->ci", Jt, v)  # (nc, 2)
        x = x0 - h * vn  # first-order penetration update (Eq. 7)
        fn = k * jnp.maximum(1.0 - d * vn, 0.0) * jnp.maximum(x, 0.0)
        speed = jnp.sqrt(jnp.sum(vt * vt, axis=1) + 1e-28)
        s = speed / vs
        mu_reg = mu * jnp.where(s < 1.0, s * (2.0 - s), 1.0)
        t_hat = vt / speed[:, None]
        ft = -mu_reg[:, None] * fn[:, None] * t_hat
        return fn, ft

    def residual(v):
        fn, ft = forces(v)
        return (
            data.A @ (v - data.v_star)
            - h * (Jn.T @ fn)
            - h * jnp.einsum("cij,ci->j", Jt, ft)
        )

    scale = jnp.linalg.norm(data.A @ data.v_star) + 1e-12

    def body(state):
        v, it, res = state
        r = residual(v)
        Jr = jax.jacfwd(residual)(v)
        dv = -jnp.linalg.solve(Jr, r)
        # Transition-aware step limiting (the TalsLimiter role,
        # tamsi_solver.h:128-156): cap the step so no contact's tangential
        # velocity crosses the stiction circle in one jump — Newton
        # otherwise oscillates across the nonsmooth mu(s) transition.
        vt = jnp.einsum("cij,j->ci", Jt, v)
        dvt = jnp.einsum("cij,j->ci", Jt, dv)
        speed = jnp.sqrt(jnp.sum(vt * vt, axis=1) + 1e-28)
        dspeed = jnp.sqrt(jnp.sum(dvt * dvt, axis=1) + 1e-28)
        cap = jnp.maximum(0.5 * speed, vs)
        a_lim = jnp.min(jnp.minimum(cap / dspeed, 1.0))
        alphas = a_lim * jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.03], dtype)
        cands = v[None] + alphas[:, None] * dv[None]
        norms = jax.vmap(lambda vv: jnp.linalg.norm(residual(vv)))(cands)
        norms = jnp.where(jnp.isfinite(norms), norms, jnp.inf)
        best = jnp.argmin(norms)
        v_new = cands[best]
        ok = jnp.all(jnp.isfinite(v_new))
        v_new = jnp.where(ok, v_new, v)
        return (v_new, it + 1, norms[best] / scale)

    def cond(state):
        _, it, res = state
        return jnp.logical_and(res > rel_tolerance, it < max_iterations)

    r0 = jnp.linalg.norm(residual(v0)) / scale
    v, it, res = jax.lax.while_loop(cond, body, (v0, jnp.array(0), r0))
    fn, ft = forces(v)
    gamma = h * jnp.concatenate([ft, fn[:, None]], axis=1)
    return SapSolution(
        v=v, gamma=gamma, iterations=it, momentum_residual=res
    )
