"""Dense ADMM QP solver (OSQP-style) — jittable, vmappable.

The reference dispatches QPs to OSQP (reference: solvers/osqp_solver.cc) via
MathematicalProgram.  This is a from-scratch dense implementation of the same
operator-splitting algorithm (Stellato et al., OSQP) shaped for TPU: a
Cholesky factorization of (P + sigma I + A' diag(rho) A) per rho update, then
fixed-size ``lax.while_loop`` chunks of triangular solves and clips — all
dense linear algebra that batches under vmap, so thousands of MPC QPs solve
in parallel per chip.  Includes OSQP's key practical features: per-row rho
with equality boosting, residual-balancing rho adaptation (with
refactorization), over-relaxation, warm starting, and active-set polishing.

    minimize    0.5 x'Px + q'x
    subject to  l <= Ax <= u
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


@dataclasses.dataclass(frozen=True)
class QpOptions:
    sigma: float = 1e-6
    rho: float = 0.1
    rho_eq_scale: float = 1e3
    alpha: float = 1.6  # over-relaxation
    max_iters: int = 400
    rho_update_interval: int = 50
    eps_abs: float = 1e-8
    eps_rel: float = 1e-8
    polish: bool = True


class QpSolution(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray  # dual for Ax in [l, u]
    iterations: jnp.ndarray
    primal_residual: jnp.ndarray
    dual_residual: jnp.ndarray
    converged: jnp.ndarray


def solve_qp(P, q, A, l, u, options: QpOptions = QpOptions(), x0=None, y0=None):
    """Solve the QP.  All dense; jit/vmap friendly.  Warm-startable via x0/y0."""
    opts = options
    dtype = q.dtype
    n = q.shape[0]
    m = l.shape[0]

    is_eq = jnp.isclose(l, u)
    eq_scale = jnp.where(is_eq, opts.rho_eq_scale, 1.0).astype(dtype)

    x = jnp.zeros(n, dtype) if x0 is None else x0
    y = jnp.zeros(m, dtype) if y0 is None else y0
    z = jnp.clip(A @ x, l, u)

    n_chunks = max(1, opts.max_iters // opts.rho_update_interval)

    def run_chunk(carry):
        x, z, y, rho_base, it, rp, rd, done = carry
        rho_vec = rho_base * eq_scale
        K = P + opts.sigma * jnp.eye(n, dtype=dtype) + (A.T * rho_vec) @ A
        chol = cho_factor(K)

        def step(state):
            x, z, y, it, rp, rd, done = state
            rhs = opts.sigma * x - q + A.T @ (rho_vec * z - y)
            x_t = cho_solve(chol, rhs)
            z_t = A @ x_t
            x_new = opts.alpha * x_t + (1 - opts.alpha) * x
            z_relax = opts.alpha * z_t + (1 - opts.alpha) * z
            z_new = jnp.clip(z_relax + y / rho_vec, l, u)
            y_new = y + rho_vec * (z_relax - z_new)

            Ax = A @ x_new
            rp_new = jnp.linalg.norm(Ax - z_new, ord=jnp.inf)
            rd_new = jnp.linalg.norm(P @ x_new + q + A.T @ y_new, ord=jnp.inf)
            eps_p = opts.eps_abs + opts.eps_rel * jnp.maximum(
                jnp.linalg.norm(Ax, ord=jnp.inf), jnp.linalg.norm(z_new, ord=jnp.inf)
            )
            eps_d = opts.eps_abs + opts.eps_rel * jnp.maximum(
                jnp.linalg.norm(P @ x_new, ord=jnp.inf),
                jnp.maximum(
                    jnp.linalg.norm(A.T @ y_new, ord=jnp.inf),
                    jnp.linalg.norm(q, ord=jnp.inf),
                ),
            )
            done = jnp.logical_and(rp_new <= eps_p, rd_new <= eps_d)
            return (x_new, z_new, y_new, it + 1, rp_new, rd_new, done)

        def step_cond(state):
            _, _, _, it_inner, _, _, done = state
            return jnp.logical_and(~done, it_inner < opts.rho_update_interval)

        x, z, y, it_inner, rp, rd, done = jax.lax.while_loop(
            step_cond, step, (x, z, y, jnp.array(0), rp, rd, done)
        )

        # Residual-balancing rho adaptation (OSQP sec. 5.2).
        Ax_n = jnp.linalg.norm(A @ x, ord=jnp.inf)
        z_n = jnp.linalg.norm(z, ord=jnp.inf)
        Px_n = jnp.linalg.norm(P @ x, ord=jnp.inf)
        Aty_n = jnp.linalg.norm(A.T @ y, ord=jnp.inf)
        q_n = jnp.linalg.norm(q, ord=jnp.inf)
        rp_rel = rp / jnp.maximum(jnp.maximum(Ax_n, z_n), 1e-12)
        rd_rel = rd / jnp.maximum(jnp.maximum(Px_n, jnp.maximum(Aty_n, q_n)), 1e-12)
        scale = jnp.sqrt(rp_rel / jnp.maximum(rd_rel, 1e-18))
        scale = jnp.clip(scale, 0.1, 10.0)
        rho_new = jnp.where(done, rho_base, jnp.clip(rho_base * scale, 1e-6, 1e6))
        return (x, z, y, rho_new, it + it_inner, rp, rd, done)

    def chunk_cond(carry):
        _, _, _, _, it, _, _, done = carry
        return jnp.logical_and(~done, it < opts.max_iters)

    inf = jnp.asarray(jnp.inf, dtype)
    carry = (x, z, y, jnp.asarray(opts.rho, dtype), jnp.array(0), inf, inf, jnp.array(False))
    x, z, y, rho_base, it, rp, rd, done = jax.lax.while_loop(
        chunk_cond, run_chunk, carry
    )

    if opts.polish:
        x, y = _polish(P, q, A, l, u, x, y, opts)
        rp = jnp.linalg.norm(jnp.clip(A @ x, l, u) - A @ x, ord=jnp.inf)
        rd = jnp.linalg.norm(P @ x + q + A.T @ y, ord=jnp.inf)
        done = jnp.logical_or(
            done, jnp.logical_and(rp <= 10 * opts.eps_abs, rd <= 10 * opts.eps_abs)
        )

    return QpSolution(
        x=x, y=y, iterations=it, primal_residual=rp, dual_residual=rd, converged=done
    )


def _polish(P, q, A, l, u, x, y, opts):
    """Active-set polish: solve the equality-constrained QP on the active set.

    Same role as OSQP's `polish: 1` — removes ADMM's O(eps) bias.  Active
    rows are detected from the dual; the KKT system is solved with masked
    rows so shapes stay static.
    """
    dtype = q.dtype
    n = q.shape[0]
    m = l.shape[0]
    tol = 1e-7
    lower_active = y < -tol
    upper_active = y > tol
    is_eq = jnp.isclose(l, u)
    active = jnp.logical_or(jnp.logical_or(lower_active, upper_active), is_eq)
    b = jnp.where(upper_active, u, l)
    b = jnp.where(is_eq, l, b)

    # KKT with inactive rows zeroed-out (unit diagonal placeholder).
    act = active.astype(dtype)
    A_act = A * act[:, None]
    reg = 1e-10
    K = jnp.block(
        [
            [P + reg * jnp.eye(n, dtype=dtype), A_act.T],
            [A_act, -reg * jnp.eye(m, dtype=dtype) - jnp.diag(1.0 - act)],
        ]
    )
    rhs = jnp.concatenate([-q, jnp.where(active, b, 0.0)])
    sol = jnp.linalg.solve(K, rhs)
    x_p, y_p = sol[:n], sol[n:] * act

    # Keep the polish only if it reduces the KKT residual.
    def kkt_res(x, y):
        r1 = jnp.linalg.norm(P @ x + q + A.T @ y, ord=jnp.inf)
        Ax = A @ x
        r2 = jnp.linalg.norm(Ax - jnp.clip(Ax, l, u), ord=jnp.inf)
        return jnp.maximum(r1, r2)

    better = kkt_res(x_p, y_p) < kkt_res(x, y)
    x = jnp.where(better, x_p, x)
    y = jnp.where(better, y_p, y)
    return x, y
