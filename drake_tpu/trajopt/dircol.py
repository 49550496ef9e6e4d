"""Direct collocation (Hermite-Simpson) as a pure residual + on-device solve.

Re-derivation of Drake's DirectCollocation
(reference: planning/trajectory_optimization/direct_collocation.h:30).  Drake
builds a MathematicalProgram whose DirectCollocationConstraint evaluates the
system with AutoDiffXd clones (direct_collocation.cc:45-96) and hands it to
SNOPT.  Here the whole transcription is a pair of pure functions
(cost, constraints) over a flat decision vector, differentiated by JAX and
solved with the on-device AL-Newton solver — so a *batch* of swing-up
problems (different targets / initial guesses / model params) solves in one
vmap.

Transcription (matches Drake's):
  - decision vars: h (one shared step, i.e. equal time intervals),
    x_0..x_{N-1}, u_0..u_{N-1}
  - collocation defect per interval k (3rd-order Hermite interpolation,
    first-order-hold input):
        x_c    = (x_k + x_{k+1})/2 + h (f_k - f_{k+1})/8
        xdot_c = -3 (x_k - x_{k+1}) / (2h) - (f_k + f_{k+1})/4
        u_c    = (u_k + u_{k+1})/2
        defect = f(x_c, u_c) - xdot_c
  - running cost: trapezoidal (direct_collocation.cc:291-303)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_tpu.solvers import sqp
from drake_tpu.systems.base import ContinuousSystem


@dataclasses.dataclass(frozen=True)
class DircolProblem:
    """Static description of a direct-collocation NLP."""

    system: ContinuousSystem
    num_time_samples: int
    minimum_time_step: float
    maximum_time_step: float
    running_cost: Optional[Callable] = None  # (x, u) -> scalar
    final_cost: Optional[Callable] = None  # (x,) -> scalar
    x0: Optional[jnp.ndarray] = None  # initial-state equality constraint
    xf: Optional[jnp.ndarray] = None  # final-state equality constraint
    u_lower: Optional[jnp.ndarray] = None
    u_upper: Optional[jnp.ndarray] = None
    x_lower: Optional[jnp.ndarray] = None
    x_upper: Optional[jnp.ndarray] = None

    @property
    def nx(self):
        return self.system.num_states

    @property
    def nu(self):
        return self.system.num_inputs

    @property
    def num_vars(self):
        N = self.num_time_samples
        return 1 + N * (self.nx + self.nu)

    # ---- packing ---------------------------------------------------------
    def pack(self, h, xs, us):
        return jnp.concatenate([jnp.atleast_1d(h), xs.ravel(), us.ravel()])

    def unpack(self, z):
        N, nx, nu = self.num_time_samples, self.nx, self.nu
        h = z[0]
        xs = z[1 : 1 + N * nx].reshape(N, nx)
        us = z[1 + N * nx :].reshape(N, nu)
        return h, xs, us

    # ---- NLP pieces ------------------------------------------------------
    def collocation_defects(self, params, z):
        h, xs, us = self.unpack(z)
        f = self.system.f
        fs = jax.vmap(lambda x, u: f(params, x, u, 0.0))(xs, us)
        x_k, x_k1 = xs[:-1], xs[1:]
        f_k, f_k1 = fs[:-1], fs[1:]
        u_c = 0.5 * (us[:-1] + us[1:])
        x_c = 0.5 * (x_k + x_k1) + h * (f_k - f_k1) / 8.0
        xdot_c = -1.5 * (x_k - x_k1) / h - 0.25 * (f_k + f_k1)
        f_c = jax.vmap(lambda x, u: f(params, x, u, 0.0))(x_c, u_c)
        return (f_c - xdot_c).ravel()

    def constraints(self, z, params):
        parts = [self.collocation_defects(params, z)]
        _, xs, _ = self.unpack(z)
        if self.x0 is not None:
            parts.append(xs[0] - self.x0)
        if self.xf is not None:
            parts.append(xs[-1] - self.xf)
        return jnp.concatenate(parts)

    def cost(self, z, params):
        h, xs, us = self.unpack(z)
        total = jnp.asarray(0.0, z.dtype)
        if self.running_cost is not None:
            g = jax.vmap(self.running_cost)(xs, us)
            # Trapezoidal integration over equal steps h.
            total = total + h * (0.5 * g[0] + jnp.sum(g[1:-1]) + 0.5 * g[-1])
        if self.final_cost is not None:
            total = total + self.final_cost(xs[-1])
        return total

    def bounds(self, dtype=jnp.float32):
        N, nx, nu = self.num_time_samples, self.nx, self.nu
        lb = jnp.full((self.num_vars,), -jnp.inf, dtype)
        ub = jnp.full((self.num_vars,), jnp.inf, dtype)
        lb = lb.at[0].set(self.minimum_time_step)
        ub = ub.at[0].set(self.maximum_time_step)
        if self.x_lower is not None:
            lb = lb.at[1 : 1 + N * nx].set(jnp.tile(self.x_lower, N))
        if self.x_upper is not None:
            ub = ub.at[1 : 1 + N * nx].set(jnp.tile(self.x_upper, N))
        if self.u_lower is not None:
            lb = lb.at[1 + N * nx :].set(jnp.tile(self.u_lower, N))
        if self.u_upper is not None:
            ub = ub.at[1 + N * nx :].set(jnp.tile(self.u_upper, N))
        return lb, ub

    def initial_guess(self, x_init, x_final, timespan, dtype=jnp.float32):
        """Straight-line state interpolation, zero input (the reference
        example's FirstOrderHold warm start, trajectory_optimization_simulation.cc:71-73)."""
        N = self.num_time_samples
        alpha = jnp.linspace(0.0, 1.0, N, dtype=dtype)[:, None]
        xs = (1 - alpha) * jnp.asarray(x_init, dtype) + alpha * jnp.asarray(
            x_final, dtype
        )
        us = jnp.zeros((N, self.nu), dtype)
        h = jnp.asarray(timespan / (N - 1), dtype)
        h = jnp.clip(h, self.minimum_time_step, self.maximum_time_step)
        return self.pack(h, xs, us)


class DircolSolution(NamedTuple):
    h: jnp.ndarray
    xs: jnp.ndarray  # (N, nx)
    us: jnp.ndarray  # (N, nu)
    cost: jnp.ndarray
    constraint_violation: jnp.ndarray
    success: jnp.ndarray

    @property
    def times(self):
        N = self.xs.shape[0]
        return self.h * jnp.arange(N, dtype=self.xs.dtype)


def solve(
    problem: DircolProblem,
    params,
    z0,
    options: sqp.SqpOptions = sqp.SqpOptions(),
) -> DircolSolution:
    """Solve the dircol NLP on device.  jit/vmap-compatible."""
    lb, ub = problem.bounds(z0.dtype)
    res = sqp.solve(
        problem.cost, problem.constraints, z0, lb, ub, options, args=(params,)
    )
    h, xs, us = problem.unpack(res.z)
    return DircolSolution(
        h=h,
        xs=xs,
        us=us,
        cost=res.cost,
        constraint_violation=res.constraint_violation,
        success=res.success,
    )


def reconstruct_input(sol: DircolSolution, t):
    """First-order-hold input interpolation (ReconstructInputTrajectory)."""
    N = sol.us.shape[0]
    s = jnp.clip(t / sol.h, 0.0, N - 1.0)
    k = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, N - 2)
    frac = s - k
    return (1 - frac) * sol.us[k] + frac * sol.us[k + 1]


def reconstruct_state(sol: DircolSolution, params, system: ContinuousSystem, t):
    """Cubic Hermite state interpolation (ReconstructStateTrajectory)."""
    N = sol.xs.shape[0]
    s = jnp.clip(t / sol.h, 0.0, N - 1.0)
    k = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, N - 2)
    tau = (s - k) * sol.h
    x_k, x_k1 = sol.xs[k], sol.xs[k + 1]
    f_k = system.f(params, x_k, sol.us[k], 0.0)
    f_k1 = system.f(params, x_k1, sol.us[k + 1], 0.0)
    h = sol.h
    # Standard cubic Hermite basis on [0, h].
    tt = tau / h
    h00 = 2 * tt**3 - 3 * tt**2 + 1
    h10 = tt**3 - 2 * tt**2 + tt
    h01 = -2 * tt**3 + 3 * tt**2
    h11 = tt**3 - tt**2
    return h00 * x_k + h10 * h * f_k + h01 * x_k1 + h11 * h * f_k1
