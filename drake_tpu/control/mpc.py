"""Model-predictive control harnesses.

Two tiers, mirroring and exceeding the reference:

1. ``LinearMpc`` — functional equivalent of Drake's
   LinearModelPredictiveController (reference:
   systems/controllers/linear_model_predictive_controller.h:41): linearize
   about an equilibrium, solve a finite-horizon QP each period.  Here the QP
   is condensed (states eliminated) and solved by the dense IPM — so a batch
   of controllers runs in one vmap.

2. ``ilqr_mpc_rollout`` — the TPU-native nonlinear MPC: receding-horizon
   iLQR with warm-start shifting, the whole closed-loop rollout compiled as
   one ``lax.scan`` (solver-in-the-loop).  vmap over scenarios for the
   batched-MPC benchmark configs (quadrotor 4k scenarios, iiwa contact MPC).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_tpu.solvers.ipm import IpmOptions, solve_qp_ipm
from drake_tpu.trajopt import ilqr


# ---------------------------------------------------------------------------
# Linear MPC (reference parity).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LinearMpc:
    """Receding-horizon QP MPC about an equilibrium (x0, u0).

    Discrete dynamics x[k+1] = A x[k] + B u[k] (deviations from x0/u0), cost
    sum x'Qx + u'Ru over `horizon` steps, optional input box.  Condensed:
    with X = Sx x_init + Su U, the QP over U = [u_0..u_{N-1}] is

        min_U 0.5 U'(Su' Qbar Su + Rbar)U + (Sx x_init)' Qbar Su U
    """

    A: jnp.ndarray
    B: jnp.ndarray
    Q: jnp.ndarray
    R: jnp.ndarray
    horizon: int
    u_min: Optional[jnp.ndarray] = None
    u_max: Optional[jnp.ndarray] = None
    qp_options: IpmOptions = IpmOptions(max_iters=25, tol=1e-8)

    def _condense(self):
        A, B, N = self.A, self.B, self.horizon
        nx, nu = B.shape
        # Sx: (N*nx, nx) with rows A, A^2, ...; Su: (N*nx, N*nu) lower block toeplitz.
        Sx_blocks = []
        Ak = A
        for _ in range(N):
            Sx_blocks.append(Ak)
            Ak = A @ Ak
        Sx = jnp.concatenate(Sx_blocks, axis=0)
        Su = jnp.zeros((N * nx, N * nu), A.dtype)
        # Block (i, j) = A^{i-j} B for i >= j.
        power = [jnp.eye(nx, dtype=A.dtype)]
        for _ in range(N - 1):
            power.append(A @ power[-1])
        for i in range(N):
            for j in range(i + 1):
                Su = Su.at[
                    i * nx : (i + 1) * nx, j * nu : (j + 1) * nu
                ].set(power[i - j] @ B)
        return Sx, Su

    def solve(self, x_init):
        """Return the optimal input sequence (N, nu) for deviation state x_init."""
        N = self.horizon
        nx, nu = self.B.shape
        Sx, Su = self._condense()
        Qbar = jnp.kron(jnp.eye(N, dtype=self.A.dtype), self.Q)
        Rbar = jnp.kron(jnp.eye(N, dtype=self.A.dtype), self.R)
        P = Su.T @ Qbar @ Su + Rbar
        P = 0.5 * (P + P.T)
        q = Su.T @ Qbar @ (Sx @ x_init)
        lo = (
            jnp.tile(self.u_min, N)
            if self.u_min is not None
            else jnp.full((N * nu,), -jnp.inf, self.A.dtype)
        )
        hi = (
            jnp.tile(self.u_max, N)
            if self.u_max is not None
            else jnp.full((N * nu,), jnp.inf, self.A.dtype)
        )
        G = jnp.zeros((1, N * nu), self.A.dtype)  # no equalities
        b = jnp.zeros((1,), self.A.dtype)
        sol = solve_qp_ipm(P, q, G, b, lo, hi, self.qp_options)
        return sol.w.reshape(N, nu)

    def policy(self, x0_nominal, u0_nominal):
        """u(x) applying the first input of the horizon (like the reference's
        periodic discrete update)."""

        def control(_, x, t):
            U = self.solve(x - x0_nominal)
            return u0_nominal + U[0]

        return control


# ---------------------------------------------------------------------------
# Nonlinear receding-horizon iLQR MPC.
# ---------------------------------------------------------------------------


class MpcRolloutResult(NamedTuple):
    xs: jnp.ndarray  # (T+1, nx) closed-loop states
    us: jnp.ndarray  # (T, nu) applied inputs
    costs: jnp.ndarray  # (T,) per-step iLQR solution cost
    solve_iters: jnp.ndarray  # (T,) iLQR iterations per solve


def ilqr_mpc_rollout(
    dynamics: Callable,  # discrete step (params, x, u, t) -> x_next
    running_cost: Callable,
    final_cost: Callable,
    params: Any,
    x0: jnp.ndarray,
    u_init: jnp.ndarray,  # (N, nu) initial horizon guess
    num_steps: int,
    dt: float = 1.0,
    u_lower=None,
    u_upper=None,
    options: ilqr.IlqrOptions = ilqr.IlqrOptions(max_iters=5),
    sim_dynamics: Optional[Callable] = None,
    first_options: Optional[ilqr.IlqrOptions] = None,
    refresh_every: int = 0,
    x_bound: float = float("inf"),
    u_rate_limit: Optional[float] = None,
    plan_guard: Optional[Callable] = None,
) -> MpcRolloutResult:
    """Closed-loop MPC: at every sim step re-solve the horizon (warm-started
    by shifting the previous plan) and apply the first input.

    ``sim_dynamics`` (defaults to ``dynamics``) advances the real plant —
    pass a different function to model plant/model mismatch.
    The entire loop is one lax.scan: jit once, vmap over scenarios.

    ``first_options``: optional heavier solver settings for the FIRST solve
    only (the real-time-iteration pattern: the cold-start solve does the
    planning work, the warm-started re-solves each period only track it —
    far cheaper than giving every solve the cold-start budget).

    ``refresh_every``: with first_options set, repeat the heavy solve every
    k-th step (periodic re-planning).  Pure 1-iter tracking goes stale after
    ~10 steps on contact tasks; a periodic refresh restores plan quality at
    a fraction of the every-step cost.  0 = heavy solve only at step 0.

    ``x_bound``: physical divergence bound for the lane-freeze guard.  An
    f32 plant blow-up can race through astronomically large but still
    FINITE states (|x| ~ 1e16) without ever producing a NaN, so the
    isfinite guard alone misses it; any step whose |x| exceeds this bound
    is rejected and the lane holds its previous state.  Pick a bound well
    outside the task's reachable set (e.g. 1e3 for a meter-scale
    manipulation scene).

    ``plan_guard``: optional EVENT-TRIGGERED plan filter
    ``(xs_plan, us_plan) -> us_plan'`` applied after every solve.  The
    guard sees the solver's own predicted rollout, so it can react to
    predicted outcomes (e.g. damp a plan whose rollout launches the
    manipulated object past the goal) BEFORE the plan touches the plant —
    per-lane, fully vectorized, no lax.cond, so under vmap only the lanes
    that trigger are modified and the untriggered lanes pay nothing.
    """
    if sim_dynamics is None:
        sim_dynamics = dynamics

    def solve_step(x, us_warm, t, opts):
        res = ilqr.solve(
            dynamics,
            running_cost,
            final_cost,
            params,
            x,
            us_warm,
            dt=dt,
            u_lower=u_lower,
            u_upper=u_upper,
            options=opts,
        )
        if plan_guard is not None:
            res = res._replace(us=plan_guard(res.xs, res.us))
        # Solve-divergence guard: a lane whose SOLVE blew up (f32 NaN plan)
        # must not poison its own future — apply the previous warm start's
        # first input instead and keep the old plan, so the NEXT re-solve
        # gets a finite starting point and the lane self-heals (round-2 fix:
        # the earlier freeze held x but shifted the NaN plan into the warm
        # start, permanently killing the lane).
        ok_plan = jnp.all(jnp.isfinite(res.us))
        u_apply = jnp.where(ok_plan, res.us[0], us_warm[0])
        if u_rate_limit is not None:
            # Plan-jump damping: each re-solve may move the current-step
            # input only u_rate_limit away from what the PREVIOUS plan
            # intended for this step (us_warm[0]) — an applied-action trust
            # region that suppresses the chattering plan flips RTI
            # always-accept steps can produce around contact engagement.
            u_apply = jnp.clip(
                u_apply,
                us_warm[0] - u_rate_limit,
                us_warm[0] + u_rate_limit,
            )
        x_next = sim_dynamics(params, x, u_apply, t)
        # Lane freeze: if this scenario's plant diverged (f32 blow-up on an
        # extreme rollout), hold its state instead of propagating NaN — one
        # bad vmapped lane must not poison batch statistics (the
        # SapSolverStats failure-containment role).  The x_bound test also
        # catches finite-but-diverged states (|x| ~ 1e16 without a NaN).
        ok = jnp.all(jnp.isfinite(x_next)) & (
            jnp.max(jnp.abs(x_next)) < x_bound
        )
        x_next = jnp.where(ok, x_next, x)
        # Warm start: shift the plan one step, repeat the last input.
        us_shift = jnp.concatenate([res.us[1:], res.us[-1:]], axis=0)
        us_next = jnp.where(ok_plan, us_shift, us_warm)
        return x_next, us_next, u_apply, res

    def step(carry, k):
        x, us_warm = carry
        x_next, us_next, u_apply, res = solve_step(x, us_warm, k * dt, options)
        return (x_next, us_next), (x_next, u_apply, res.cost, res.iterations)

    if first_options is not None and refresh_every > 0 and num_steps > 0:
        # Clamp so at least one full block (and hence the heavy step-0
        # solve) always runs.
        refresh_every = min(refresh_every, num_steps)
        n_blocks = num_steps // refresh_every
        rem = num_steps - n_blocks * refresh_every
        n_light = refresh_every - 1

        def light(carry, t):
            x, us_warm = carry
            x_next, us_next, u_apply, res = solve_step(x, us_warm, t, options)
            return (x_next, us_next), (
                x_next, u_apply, res.cost, res.iterations)

        def block(carry, b):
            x, us_warm = carry
            t0b = b * (refresh_every * dt)
            xh, ush, uh, resh = solve_step(x, us_warm, t0b, first_options)
            ts = t0b + dt * (1.0 + jnp.arange(n_light, dtype=x0.dtype))
            (xf, usf), (xs_l, us_l, c_l, i_l) = jax.lax.scan(
                light, (xh, ush), ts)
            xs_b = jnp.concatenate([xh[None], xs_l], axis=0)
            us_b = jnp.concatenate([uh[None], us_l], axis=0)
            c_b = jnp.concatenate([resh.cost[None], c_l], axis=0)
            i_b = jnp.concatenate([resh.iterations[None], i_l], axis=0)
            return (xf, usf), (xs_b, us_b, c_b, i_b)

        (xc, usc), (xs_blk, us_blk, c_blk, i_blk) = jax.lax.scan(
            block, (x0, u_init), jnp.arange(n_blocks, dtype=x0.dtype))
        xs_tail = xs_blk.reshape(-1, *xs_blk.shape[2:])
        us = us_blk.reshape(-1, *us_blk.shape[2:])
        costs = c_blk.reshape(-1)
        iters = i_blk.reshape(-1)
        if rem:
            ts = dt * (n_blocks * refresh_every + jnp.arange(
                rem, dtype=x0.dtype))
            _, (xs_r, us_r, c_r, i_r) = jax.lax.scan(light, (xc, usc), ts)
            xs_tail = jnp.concatenate([xs_tail, xs_r], axis=0)
            us = jnp.concatenate([us, us_r], axis=0)
            costs = jnp.concatenate([costs, c_r], axis=0)
            iters = jnp.concatenate([iters, i_r], axis=0)
        xs = jnp.concatenate([x0[None], xs_tail], axis=0)
        return MpcRolloutResult(xs=xs, us=us, costs=costs, solve_iters=iters)

    x_start, us_start = x0, u_init
    head = None
    if first_options is not None and num_steps > 0:
        x1, us1, u0_applied, res0 = solve_step(
            x0, u_init, jnp.asarray(0.0, x0.dtype), first_options
        )
        head = (x1, u0_applied, res0.cost, res0.iterations)
        x_start, us_start = x1, us1

    n_scan = num_steps - (1 if head is not None else 0)
    k0 = 1 if head is not None else 0
    (xf, _), (xs_tail, us, costs, iters) = jax.lax.scan(
        step, (x_start, us_start), k0 + jnp.arange(n_scan)
    )
    if head is not None:
        x1, u0_applied, c0, it0 = head
        xs_tail = jnp.concatenate([x1[None], xs_tail], axis=0)
        us = jnp.concatenate([u0_applied[None], us], axis=0)
        costs = jnp.concatenate([c0[None], costs], axis=0)
        iters = jnp.concatenate([it0[None], iters], axis=0)
    xs = jnp.concatenate([x0[None], xs_tail], axis=0)
    return MpcRolloutResult(xs=xs, us=us, costs=costs, solve_iters=iters)
