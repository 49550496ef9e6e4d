"""Sl1QP NLP solver: elastic SQP with l1 exact penalty — the SNOPT role.

Drake solves its trajopt NLPs with SNOPT's sparse elastic SQP (reference:
solvers/snopt_solver.cc, chosen by ChooseBestSolver for dircol,
solvers/choose_best_solver.cc).  This is a from-scratch dense Sl1QP —
Fletcher's sequential l1-QP, the same family as SNOPT's elastic mode —
shaped for TPU:

    minimize f(z)   s.t.  c(z) = 0,   lb <= z <= ub

Each iteration minimizes the l1-penalty model with elastic slacks s = s+ - s-
inside a static step bound:

    min_{d,s+,s-}  0.5 d'H d + g'd + nu * 1'(s+ + s-)
    s.t.           C d - s+ + s- = -c
                   max(lb - z, -B) <= d <= min(ub - z, B)
                   s+, s- >= 0

solved by the dense interior-point QP solver (drake_tpu.solvers.ipm), which
is insensitive to Hessian conditioning, and globalized by a backtracking
Armijo search on  phi(z) = f(z) + nu ||c(z)||_1.  Design points found on the
pendulum swing-up (torque-limited — the hardest small instance):

  - H is the exact Lagrangian Hessian with eigenvalues clamped to
    >= hessian_reg; the static bound B caps steps in the clamped
    near-singular directions, so no giant isotropic shift is needed —
    a shift of size |lambda_min| destroys QP conditioning and stalls.
    (An adaptive trust region was tried and fights the l1 merit: typical
    accept ratios of 0.6-0.75 never trigger growth and progress crawls.)
  - Elastic multipliers are bounded by nu in exact arithmetic; duals are
    clamped accordingly before entering the next Hessian.
  - nu escalates only when the elastic slacks are materially active AND
    feasibility progress stalled (steering rule).  Escalating on every
    active-slack iteration sends nu to penalty_max and breaks the QP scaling.

The whole solve is one jittable ``lax.while_loop`` — vmap it over initial
guesses / parameters for batched trajopt (thousands of NLPs per chip).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_tpu.solvers.ipm import IpmOptions, solve_qp_ipm


@dataclasses.dataclass(frozen=True)
class SqpOptions:
    max_iters: int = 120
    qp: IpmOptions = IpmOptions(max_iters=50, tol=1e-11)
    constraint_tol: float = 1e-6
    opt_tol: float = 1e-4  # accepted-step-size stationarity tolerance
    penalty0: float = 10.0
    penalty_factor: float = 10.0
    penalty_max: float = 1e6
    armijo: float = 1e-4
    line_search_steps: int = 25
    hessian_reg: float = 1e-6
    slack_reg: float = 1e-8
    # Static per-iteration step bound |d|_inf <= step_bound: prevents the
    # clamped near-singular Hessian directions from emitting 1e8-size steps
    # (an adaptive trust region fights the l1 merit here; a fixed moderate
    # bound + backtracking line search is both simpler and faster).
    step_bound: float = 100.0
    exact_lagrangian_hessian: bool = True


class SqpResult(NamedTuple):
    z: jnp.ndarray
    lam: jnp.ndarray
    cost: jnp.ndarray
    constraint_violation: jnp.ndarray
    iterations: jnp.ndarray
    success: jnp.ndarray


def _psd_eig_clamp(H, delta):
    """Clamp eigenvalues to >= delta (keeps well-conditioned directions)."""
    w, V = jnp.linalg.eigh(H)
    w = jnp.maximum(w, delta)
    return (V * w) @ V.T


def solve(
    cost_fn: Callable,
    constraint_fn: Callable,
    z0: jnp.ndarray,
    lb: Optional[jnp.ndarray] = None,
    ub: Optional[jnp.ndarray] = None,
    options: SqpOptions = SqpOptions(),
    args: Any = (),
) -> SqpResult:
    """Solve min f(z, *args) s.t. c(z, *args) = 0, lb <= z <= ub.

    Traced under full-f32 matmul precision (see solve_qp_ipm): the QP
    subproblem data (Lagrangian Hessians, Jacobian products) must be exact
    f32 or TPU's reduced-precision matmuls stall the f32 SQP.
    """
    with jax.default_matmul_precision("highest"):
        return _solve_impl(cost_fn, constraint_fn, z0, lb, ub, options, args)


def _solve_impl(
    cost_fn: Callable,
    constraint_fn: Callable,
    z0: jnp.ndarray,
    lb: Optional[jnp.ndarray] = None,
    ub: Optional[jnp.ndarray] = None,
    options: SqpOptions = SqpOptions(),
    args: Any = (),
) -> SqpResult:
    opts = options
    dtype = z0.dtype
    n = z0.shape[0]
    if lb is None:
        lb = jnp.full((n,), -jnp.inf, dtype)
    if ub is None:
        ub = jnp.full((n,), jnp.inf, dtype)

    f = lambda z: cost_fn(z, *args)
    c = lambda z: constraint_fn(z, *args)
    grad_f = jax.grad(f)
    m = jax.eval_shape(c, z0).shape[0]

    def lag_hess(z, lam):
        return jax.hessian(lambda zz: f(zz) + lam @ c(zz))(z)

    def phi(z, nu):
        return f(z) + nu * jnp.sum(jnp.abs(c(z)))

    nw = n + 2 * m  # [d, s+, s-]
    Imm = jnp.eye(m, dtype=dtype)
    inf_m = jnp.full((m,), jnp.inf, dtype)
    zero_m = jnp.zeros((m,), dtype)

    def body(state):
        z, lam, nu, viol_prev, it, _, _ = state
        cz = c(z)
        C = jax.jacfwd(c)(z)
        g = grad_f(z)
        if opts.exact_lagrangian_hessian:
            H = lag_hess(z, lam)
        else:
            H = jax.hessian(f)(z)
        H = _psd_eig_clamp(H, opts.hessian_reg)

        # Elastic QP over w = [d, s+, s-] with the static step bound.
        P = jnp.zeros((nw, nw), dtype)
        P = P.at[:n, :n].set(H)
        P = P.at[jnp.arange(n, nw), jnp.arange(n, nw)].set(opts.slack_reg)
        q = jnp.concatenate([g, jnp.full((2 * m,), nu, dtype)])
        G = jnp.concatenate([C, -Imm, Imm], axis=1)
        lb_w = jnp.concatenate(
            [jnp.maximum(lb - z, -opts.step_bound), zero_m, zero_m]
        )
        ub_w = jnp.concatenate(
            [jnp.minimum(ub - z, opts.step_bound), inf_m, inf_m]
        )
        qp = solve_qp_ipm(P, q, G, -cz, lb_w, ub_w, opts.qp)
        d = qp.w[:n]
        s_total = jnp.sum(jnp.abs(qp.w[n:]))
        lam_qp = jnp.clip(qp.y, -nu, nu)

        # Predicted decrease of the l1 model (>= 0 in exact arithmetic).
        viol1 = jnp.sum(jnp.abs(cz))
        pred = -(g @ d + 0.5 * d @ (H @ d)) + nu * (viol1 - s_total)
        pred = jnp.maximum(pred, 0.0)

        phi0 = phi(z, nu)

        def ls_cond(carry):
            alpha, it_ls = carry
            ok = phi(z + alpha * d, nu) <= phi0 - opts.armijo * alpha * pred
            return jnp.logical_and(~ok, it_ls < opts.line_search_steps)

        def ls_body(carry):
            alpha, it_ls = carry
            return (alpha * 0.5, it_ls + 1)

        alpha, _ = jax.lax.while_loop(ls_cond, ls_body, (jnp.asarray(1.0, dtype), 0))
        improved = phi(z + alpha * d, nu) <= phi0
        alpha = jnp.where(improved, alpha, 0.0)
        z_new = jnp.clip(z + alpha * d, lb, ub)

        viol = jnp.linalg.norm(c(z_new), ord=jnp.inf)
        # Steering rule: raise nu only when slacks are materially active AND
        # feasibility stalled.
        slacks_active = s_total > 1e-6 * jnp.maximum(1.0, viol1)
        stalled = viol > 0.9 * viol_prev
        nu_new = jnp.where(
            jnp.logical_and(slacks_active, stalled),
            jnp.minimum(nu * opts.penalty_factor, opts.penalty_max),
            nu,
        )

        step = alpha * jnp.linalg.norm(d, ord=jnp.inf)
        done = jnp.logical_and(
            viol <= opts.constraint_tol,
            jnp.logical_and(alpha >= 1.0, step <= opts.opt_tol),
        )
        return (z_new, lam_qp, nu_new, viol, it + 1, viol, done)

    def cond(state):
        _, _, _, _, it, _, done = state
        return jnp.logical_and(~done, it < opts.max_iters)

    inf = jnp.asarray(jnp.inf, dtype)
    state = (
        jnp.clip(z0, lb, ub),
        jnp.zeros((m,), dtype),
        jnp.asarray(opts.penalty0, dtype),
        inf,
        jnp.array(0),
        inf,
        jnp.array(False),
    )
    z, lam, nu, _, it, viol, done = jax.lax.while_loop(cond, body, state)
    return SqpResult(
        z=z,
        lam=lam,
        cost=f(z),
        constraint_violation=viol,
        iterations=it,
        success=viol <= opts.constraint_tol * 10,
    )
