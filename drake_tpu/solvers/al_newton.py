"""Augmented-Lagrangian Newton NLP solver — the on-device SNOPT role.

Drake funnels trajectory optimization through MathematicalProgram + SNOPT
(reference: solvers/solve.h:32, snopt_solver.cc; also its in-house
AugmentedLagrangian, solvers/augmented_lagrangian.h).  SNOPT is host-only,
serial, and unbatchable; the TPU-native replacement is a dense
augmented-Lagrangian method with damped-Newton inner solves:

    minimize f(z)  s.t.  c(z) = 0,  lb <= z <= ub

    L_mu(z; lam) = f(z) + lam'c(z) + mu/2 ||c(z)||^2

Inner: projected damped-Newton steps with backtracking line search (Hessian =
exact cost Hessian + Gauss-Newton constraint term mu*C'C, plus adaptive
Levenberg-Marquardt damping).  Outer: first-order multiplier updates with mu
escalation.  Everything runs under ``lax.while_loop``/``fori_loop``, so the
whole solve jits and vmaps — thousands of NLPs solve in parallel per chip.

Problems of dircol scale (tens to hundreds of variables) are solved densely:
on TPU a dense (n x n) factorization batched over scenarios beats any sparse
host solver by orders of magnitude.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AlNewtonOptions:
    outer_iters: int = 12
    inner_iters: int = 25
    mu0: float = 10.0
    mu_factor: float = 10.0
    mu_max: float = 1e8
    constraint_tol: float = 1e-6
    grad_tol: float = 1e-6
    lm_damping0: float = 1e-6
    line_search_steps: int = 20
    armijo: float = 1e-4


class AlNewtonResult(NamedTuple):
    z: jnp.ndarray
    lam: jnp.ndarray
    constraint_violation: jnp.ndarray
    cost: jnp.ndarray
    success: jnp.ndarray


def solve(
    cost_fn: Callable,
    constraint_fn: Callable,
    z0: jnp.ndarray,
    lb: Optional[jnp.ndarray] = None,
    ub: Optional[jnp.ndarray] = None,
    options: AlNewtonOptions = AlNewtonOptions(),
    args: Any = (),
) -> AlNewtonResult:
    """Solve min f(z, *args) s.t. c(z, *args)=0, lb<=z<=ub.

    ``args`` is a pytree of extra (traced) parameters — vary it under vmap to
    batch families of problems (scenario perturbations, warm starts).
    """
    opts = options
    dtype = z0.dtype
    if lb is None:
        lb = jnp.full_like(z0, -jnp.inf)
    if ub is None:
        ub = jnp.full_like(z0, jnp.inf)

    f = lambda z: cost_fn(z, *args)
    c = lambda z: constraint_fn(z, *args)
    m = jax.eval_shape(c, z0).shape[0]

    def al_value(z, lam, mu):
        cz = c(z)
        return f(z) + lam @ cz + 0.5 * mu * (cz @ cz)

    grad_f = jax.grad(f)
    hess_f = jax.hessian(f)

    def project(z):
        return jnp.clip(z, lb, ub)

    def inner_step(z, lam, mu, damping):
        cz = c(z)
        C = jax.jacfwd(c)(z)
        g = grad_f(z) + C.T @ (lam + mu * cz)
        H = hess_f(z) + mu * (C.T @ C)
        n = z.shape[0]

        def try_solve(nu):
            dz = -jnp.linalg.solve(H + nu * jnp.eye(n, dtype=dtype), g)
            return dz

        dz = try_solve(damping)
        # Fall back to steeper damping if the step is not a descent direction.
        descent = dz @ g
        dz = jnp.where(descent < 0, dz, try_solve(damping * 1e4 + 1e-2))

        # Backtracking projected line search on the AL merit.
        L0 = al_value(z, lam, mu)
        g_dz = g @ dz

        def ls_body(carry):
            alpha, _, it = carry
            return (alpha * 0.5, False, it + 1)

        def ls_cond(carry):
            alpha, done, it = carry
            z_try = project(z + alpha * dz)
            L_try = al_value(z_try, lam, mu)
            ok = L_try <= L0 + opts.armijo * alpha * g_dz
            return jnp.logical_and(~ok, it < opts.line_search_steps)

        alpha, _, _ = jax.lax.while_loop(ls_cond, ls_body, (jnp.asarray(1.0, dtype), False, 0))
        z_new = project(z + alpha * dz)
        improved = al_value(z_new, lam, mu) < L0
        z_new = jnp.where(improved, z_new, z)
        damping_new = jnp.where(improved, jnp.maximum(damping * 0.5, opts.lm_damping0), damping * 10.0)
        # Projected-gradient stationarity measure.
        pg = z - project(z - g)
        return z_new, damping_new, jnp.linalg.norm(pg, ord=jnp.inf)

    def inner_solve(z, lam, mu):
        def body(carry):
            z, damping, pg, it = carry
            z, damping, pg = inner_step(z, lam, mu, damping)
            return (z, damping, pg, it + 1)

        def cond(carry):
            _, _, pg, it = carry
            return jnp.logical_and(pg > opts.grad_tol, it < opts.inner_iters)

        z, _, pg, _ = jax.lax.while_loop(
            cond, body, (z, jnp.asarray(opts.lm_damping0, dtype), jnp.asarray(jnp.inf, dtype), 0)
        )
        return z

    def outer_body(carry):
        z, lam, mu, viol_prev, it = carry
        z = inner_solve(z, lam, mu)
        cz = c(z)
        viol = jnp.linalg.norm(cz, ord=jnp.inf)
        lam = lam + mu * cz
        # Escalate mu unless the violation shrank enough.
        mu = jnp.where(viol > 0.25 * viol_prev, jnp.minimum(mu * opts.mu_factor, opts.mu_max), mu)
        return (z, lam, mu, viol, it + 1)

    def outer_cond(carry):
        _, _, _, viol, it = carry
        return jnp.logical_and(viol > opts.constraint_tol, it < opts.outer_iters)

    lam0 = jnp.zeros((m,), dtype)
    state = (project(z0), lam0, jnp.asarray(opts.mu0, dtype), jnp.asarray(jnp.inf, dtype), 0)
    z, lam, mu, viol, _ = jax.lax.while_loop(outer_cond, outer_body, state)
    return AlNewtonResult(
        z=z,
        lam=lam,
        constraint_violation=viol,
        cost=f(z),
        success=viol <= opts.constraint_tol * 10,
    )
