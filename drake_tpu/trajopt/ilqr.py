"""iLQR / DDP: the TPU-native receding-horizon MPC engine.

The reference's MPC is LinearModelPredictiveController — re-linearize, build a
DirectTranscription QP, call OSQP each period (reference:
systems/controllers/linear_model_predictive_controller.h:41).  That design is
host-solver-bound.  The TPU-first equivalent is iLQR with box control limits:
a backward Riccati sweep (lax.scan of small dense ops — well-conditioned in
f32, unlike a monolithic KKT factorization) plus a rolled-out forward line
search.  One solve is two scans; thousands of scenarios vmap into one XLA
program, which is what makes >=1 kHz-equivalent MPC per chip reachable.

Algorithm: Tassa-style iLQR with
  - Levenberg regularization on Quu with adaptive schedule,
  - control limits by clamping the feedforward and zeroing feedback rows on
    clamped coordinates (projected variant of boxed-DDP),
  - parallel-alpha forward pass: all line-search candidates roll out at once
    (a batched scan), and the best acceptable one is selected — cheaper on
    TPU than sequential backtracking.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class IlqrOptions:
    max_iters: int = 50
    tol: float = 1e-6  # expected-improvement convergence threshold
    reg_init: float = 1e-6
    reg_min: float = 1e-9
    reg_max: float = 1e8
    reg_up: float = 10.0
    reg_down: float = 0.5
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)
    accept_ratio: float = 1e-4  # actual/expected reduction acceptance
    # Use reverse-mode for dynamics jacobians.  Required when the dynamics
    # contain custom_vjp primitives (e.g. the SAP contact solve, which
    # differentiates via the implicit-function theorem and has no jvp rule).
    use_jacrev: bool = False
    # Real-time-iteration mode: solve() delegates to rti_solve() — one
    # fused always-accept Newton step (2 dynamics passes per knot instead
    # of 3; see rti_solve).  max_iters/alphas are ignored.
    rti: bool = False


class IlqrResult(NamedTuple):
    xs: jnp.ndarray  # (N+1, nx)
    us: jnp.ndarray  # (N, nu)
    K: jnp.ndarray  # (N, nu, nx) feedback gains (for closed-loop warm use)
    k: jnp.ndarray  # (N, nu) feedforward (residual at convergence)
    cost: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


def solve(
    dynamics: Callable,  # (params, x, u, t) -> x_next  (discrete step)
    running_cost: Callable,  # (params, x, u, t) -> scalar
    final_cost: Callable,  # (params, x) -> scalar
    params: Any,
    x0: jnp.ndarray,
    us_init: jnp.ndarray,
    dt: float = 1.0,
    u_lower: Optional[jnp.ndarray] = None,
    u_upper: Optional[jnp.ndarray] = None,
    options: IlqrOptions = IlqrOptions(),
) -> IlqrResult:
    """Solve the finite-horizon optimal control problem.  jit/vmap friendly.

    Times passed to dynamics/cost are k*dt.
    """
    opts = options
    if opts.rti:
        return rti_solve(
            dynamics, running_cost, final_cost, params, x0, us_init,
            dt=dt, u_lower=u_lower, u_upper=u_upper, reg=opts.reg_init,
        )
    N, nu = us_init.shape
    nx = x0.shape[0]
    dtype = x0.dtype
    ts = dt * jnp.arange(N, dtype=dtype)
    has_limits = u_lower is not None or u_upper is not None
    lo = jnp.full((nu,), -jnp.inf, dtype) if u_lower is None else u_lower
    hi = jnp.full((nu,), jnp.inf, dtype) if u_upper is None else u_upper

    def clamp(u):
        return jnp.clip(u, lo, hi) if has_limits else u

    def rollout(us):
        def step(x, uk_tk):
            u, t = uk_tk
            x_next = dynamics(params, x, u, t)
            return x_next, x_next

        _, xs_tail = jax.lax.scan(step, x0, (us, ts))
        return jnp.concatenate([x0[None], xs_tail], axis=0)

    def total_cost(xs, us):
        run = jnp.sum(jax.vmap(lambda x, u, t: running_cost(params, x, u, t))(
            xs[:-1], us, ts
        ))
        return run + final_cost(params, xs[-1])

    jac = jax.jacrev if opts.use_jacrev else jax.jacfwd

    def derivs(x, u, t):
        # One combined jacobian over [x; u] halves the vjp pulls through the
        # dynamics (each jacrev re-runs the SAP forward solve).
        nx_ = x.shape[0]

        def dyn_xu(xu):
            return dynamics(params, xu[:nx_], xu[nx_:], t)

        J = jac(dyn_xu)(jnp.concatenate([x, u]))
        fx, fu = J[:, :nx_], J[:, nx_:]

        def cost_xu(xu):
            return running_cost(params, xu[:nx_], xu[nx_:], t)

        xu = jnp.concatenate([x, u])
        g = jax.grad(cost_xu)(xu)
        H = jax.hessian(cost_xu)(xu)
        lx, lu = g[:nx_], g[nx_:]
        lxx = H[:nx_, :nx_]
        luu = H[nx_:, nx_:]
        lux = H[nx_:, :nx_]
        return fx, fu, lx, lu, lxx, luu, lux

    def backward(xs, us, reg):
        fxs, fus, lxs, lus, lxxs, luus, luxs = jax.vmap(derivs)(xs[:-1], us, ts)
        Vx = jax.grad(lambda xx: final_cost(params, xx))(xs[-1])
        Vxx = jax.hessian(lambda xx: final_cost(params, xx))(xs[-1])

        def step(carry, inp):
            Vx, Vxx, dV1, dV2, ok = carry
            fx, fu, lx, lu, lxx, luu, lux, u = inp
            Qx = lx + fx.T @ Vx
            Qu = lu + fu.T @ Vx
            Qxx = lxx + fx.T @ Vxx @ fx
            Quu = luu + fu.T @ Vxx @ fu + reg * jnp.eye(nu, dtype=dtype)
            Qux = lux + fu.T @ Vxx @ fx

            # PD check via Cholesky: diagonal of the factor must be finite+positive.
            L = jnp.linalg.cholesky(Quu)
            pd = jnp.all(jnp.isfinite(jnp.diagonal(L)))
            Quu_inv = jnp.linalg.inv(
                jnp.where(pd, Quu, jnp.eye(nu, dtype=dtype))
            )
            kff = -Quu_inv @ Qu
            K = -Quu_inv @ Qux
            if has_limits:
                # Clamp feedforward into the box; zero feedback on clamped dims.
                u_new = clamp(u + kff)
                kff_c = u_new - u
                free = jnp.logical_and(u_new > lo + 1e-9, u_new < hi - 1e-9)
                kff = kff_c
                K = K * free[:, None].astype(dtype)

            dV1 = dV1 + kff @ Qu
            dV2 = dV2 + 0.5 * kff @ (Quu @ kff)
            Vx_new = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
            Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            return (Vx_new, Vxx_new, dV1, dV2, jnp.logical_and(ok, pd)), (kff, K)

        init = (
            Vx,
            Vxx,
            jnp.asarray(0.0, dtype),
            jnp.asarray(0.0, dtype),
            jnp.array(True),
        )
        inputs = (fxs, fus, lxs, lus, lxxs, luus, luxs, us)
        (Vx, Vxx, dV1, dV2, ok), (ks, Ks) = jax.lax.scan(
            step, init, inputs, reverse=True
        )
        return ks, Ks, dV1, dV2, ok

    def forward(xs, us, ks, Ks, alpha):
        def step(x, inp):
            x_ref, u_ref, kff, K, t = inp
            u = clamp(u_ref + alpha * kff + K @ (x - x_ref))
            x_next = dynamics(params, x, u, t)
            return x_next, (x_next, u)

        _, (xs_tail, us_new) = jax.lax.scan(
            step, x0, (xs[:-1], us, ks, Ks, ts)
        )
        xs_new = jnp.concatenate([x0[None], xs_tail], axis=0)
        return xs_new, us_new

    def ilqr_iter(state):
        xs, us, cost, reg, it, _, K_last, k_last = state
        ks, Ks, dV1, dV2, bp_ok = backward(xs, us, reg)

        # Parallel forward passes over the alpha schedule.
        alphas = jnp.asarray(opts.alphas, dtype)
        xs_c, us_c = jax.vmap(lambda a: forward(xs, us, ks, Ks, a))(alphas)
        costs_c = jax.vmap(total_cost)(xs_c, us_c)
        expected = -(alphas * dV1 + alphas**2 * dV2)
        improve = cost - costs_c
        # Acceptable: improvement positive and a reasonable fraction of model.
        acceptable = jnp.logical_and(
            improve > 0.0,
            improve > opts.accept_ratio * jnp.maximum(expected, 1e-16),
        )
        acceptable = jnp.logical_and(acceptable, bp_ok)
        any_ok = jnp.any(acceptable)
        best = jnp.argmax(jnp.where(acceptable, improve, -jnp.inf))

        xs_new = jnp.where(any_ok, xs_c[best], xs)
        us_new = jnp.where(any_ok, us_c[best], us)
        cost_new = jnp.where(any_ok, costs_c[best], cost)
        reg_new = jnp.where(
            any_ok,
            jnp.maximum(reg * opts.reg_down, opts.reg_min),
            jnp.minimum(jnp.maximum(reg, 1e-6) * opts.reg_up, opts.reg_max),
        )
        # Converged when the (full-step) expected improvement is tiny.
        converged = jnp.logical_and(any_ok, expected[0] <= opts.tol * (1.0 + cost))
        diverged = reg_new >= opts.reg_max
        done = jnp.logical_or(converged, diverged)
        return (xs_new, us_new, cost_new, reg_new, it + 1, done, Ks, ks)

    def cond(state):
        _, _, _, _, it, done, _, _ = state
        return jnp.logical_and(~done, it < opts.max_iters)

    us0 = jax.vmap(clamp)(us_init)
    xs0 = rollout(us0)
    cost0 = total_cost(xs0, us0)
    state = (
        xs0,
        us0,
        cost0,
        jnp.asarray(opts.reg_init, dtype),
        jnp.array(0),
        jnp.array(False),
        jnp.zeros((N, nu, nx), dtype),
        jnp.zeros((N, nu), dtype),
    )
    xs, us, cost, reg, it, done, Ks, ks = jax.lax.while_loop(cond, ilqr_iter, state)
    return IlqrResult(
        xs=xs, us=us, K=Ks, k=ks, cost=cost, iterations=it, converged=done
    )


def rti_solve(
    dynamics: Callable,
    running_cost: Callable,
    final_cost: Callable,
    params: Any,
    x0: jnp.ndarray,
    us_init: jnp.ndarray,
    dt: float = 1.0,
    u_lower: Optional[jnp.ndarray] = None,
    u_upper: Optional[jnp.ndarray] = None,
    reg: float = 1e-6,
) -> IlqrResult:
    """One fused real-time-iteration iLQR step (always-accept, alpha = 1).

    The tracking workhorse of the RTI MPC schedule: after a heavy planning
    solve, each period needs exactly one backward/forward pass from the
    shifted warm start.  Two structural savings over solve(max_iters=1):

      1. The linearization rollout and the dynamics Jacobians come from ONE
         dynamics pass per knot: jax.vjp gives the primal x_next and the
         pullback, and 26 basis pulls through the SAP custom_vjp reuse the
         implicit-function system at the optimum (no second forward solve —
         solve(max_iters=1) pays separate rollout and jacrev passes).
      2. No line search and no acceptance test: the full Newton step is
         applied (standard RTI), so the solve is rollout + backward +
         one forward = 2 dynamics passes per knot instead of 3.

    A branch-free NaN guard returns the warm start unchanged if the step
    produced non-finite numbers (one bad f32 lane cannot poison its
    scenario).
    """
    N, nu = us_init.shape
    nx = x0.shape[0]
    dtype = x0.dtype
    ts = dt * jnp.arange(N, dtype=dtype)
    has_limits = u_lower is not None or u_upper is not None
    lo = jnp.full((nu,), -jnp.inf, dtype) if u_lower is None else u_lower
    hi = jnp.full((nu,), jnp.inf, dtype) if u_upper is None else u_upper

    def clamp(u):
        return jnp.clip(u, lo, hi) if has_limits else u

    us0 = jax.vmap(clamp)(us_init)
    eye_out = jnp.eye(nx, dtype=dtype)

    def fused_step(x, inp):
        """One dynamics pass -> (x_next, J, cost grad/hessian)."""
        u, t = inp
        xu = jnp.concatenate([x, u])

        def dyn_xu(z):
            return dynamics(params, z[:nx], z[nx:], t)

        x_next, pullback = jax.vjp(dyn_xu, xu)
        J = jax.vmap(lambda ct: pullback(ct)[0])(eye_out)  # (nx, nx+nu)

        def cost_xu(z):
            return running_cost(params, z[:nx], z[nx:], t)

        c = cost_xu(xu)
        g = jax.grad(cost_xu)(xu)
        H = jax.hessian(cost_xu)(xu)
        return x_next, (x_next, J, g, H, c)

    _, (xs_tail, Js, gs, Hs, cs) = jax.lax.scan(fused_step, x0, (us0, ts))
    xs = jnp.concatenate([x0[None], xs_tail], axis=0)
    cost_warm = jnp.sum(cs) + final_cost(params, xs[-1])

    Vx = jax.grad(lambda xx: final_cost(params, xx))(xs[-1])
    Vxx = jax.hessian(lambda xx: final_cost(params, xx))(xs[-1])

    def bstep(carry, inp):
        Vx, Vxx = carry
        J, g, H, u = inp
        fx, fu = J[:, :nx], J[:, nx:]
        lx, lu = g[:nx], g[nx:]
        lxx, luu, lux = H[:nx, :nx], H[nx:, nx:], H[nx:, :nx]
        Qx = lx + fx.T @ Vx
        Qu = lu + fu.T @ Vx
        Qxx = lxx + fx.T @ Vxx @ fx
        Quu = luu + fu.T @ Vxx @ fu + reg * jnp.eye(nu, dtype=dtype)
        Qux = lux + fu.T @ Vxx @ fx
        L = jnp.linalg.cholesky(Quu)
        pd = jnp.all(jnp.isfinite(jnp.diagonal(L)))
        Quu_inv = jnp.linalg.inv(jnp.where(pd, Quu, jnp.eye(nu, dtype=dtype)))
        kff = -Quu_inv @ Qu
        K = -Quu_inv @ Qux
        if has_limits:
            u_new = clamp(u + kff)
            kff_c = u_new - u
            free = jnp.logical_and(u_new > lo + 1e-9, u_new < hi - 1e-9)
            kff = kff_c
            K = K * free[:, None].astype(dtype)
        Vx_new = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
        Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        return (Vx_new, Vxx_new), (kff, K)

    (_, _), (ks, Ks) = jax.lax.scan(
        bstep, (Vx, Vxx), (Js, gs, Hs, us0), reverse=True
    )

    def fstep(carry, inp):
        x, cost = carry
        x_ref, u_ref, kff, K, t = inp
        u = clamp(u_ref + kff + K @ (x - x_ref))
        cost = cost + running_cost(params, x, u, t)
        x_next = dynamics(params, x, u, t)
        return (x_next, cost), (x_next, u)

    (x_last, run_cost), (xs_new_tail, us_new) = jax.lax.scan(
        fstep, (x0, jnp.asarray(0.0, dtype)), (xs[:-1], us0, ks, Ks, ts)
    )
    cost_new = run_cost + final_cost(params, x_last)
    xs_new = jnp.concatenate([x0[None], xs_new_tail], axis=0)

    # Branch-free guards: reject the step wholesale if it produced
    # non-finite numbers OR increased the cost (the linearization rollout
    # already priced the warm start, so this monotonicity test is free —
    # it is what keeps always-accept RTI from degrading hard contact lanes
    # the full solver's line search would have protected).
    ok = jnp.logical_and(
        jnp.logical_and(
            jnp.all(jnp.isfinite(us_new)), jnp.all(jnp.isfinite(xs_new))
        ),
        cost_new <= cost_warm,
    )
    xs_out = jnp.where(ok, xs_new, xs)
    us_out = jnp.where(ok, us_new, us0)
    return IlqrResult(
        xs=xs_out,
        us=us_out,
        K=Ks,
        k=ks,
        cost=jnp.where(ok, cost_new, cost_warm),
        iterations=jnp.array(1),
        converged=jnp.all(jnp.isfinite(xs)) & jnp.all(jnp.isfinite(us0)),
    )
