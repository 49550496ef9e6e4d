"""Direct transcription: discrete-time knot-point trajectory optimization.

Re-derivation of Drake's DirectTranscription
(reference: planning/trajectory_optimization/direct_transcription.h) — the
Euler/discrete-update transcription used by LinearModelPredictiveController.
Drake builds a MathematicalProgram with one dynamics-defect constraint per
interval, evaluated via AutoDiffXd system clones, and hands it to SNOPT.

Here the transcription is a pure (cost, constraints) pair over a flat
decision vector — N states + N-1 inputs at a FIXED time step (the discrete
system's period, matching Drake's "fixed time step" transcription) — solved
by the on-device Sl1QP SQP, so a batch of problems (goals, initial states,
model parameters) solves in one vmap.  For linear/affine discrete systems
the defects are linear and the SQP converges in one QP, recovering Drake's
specialization that transcribes LinearSystems without AutoDiff
(direct_transcription.cc discrete-LTI path).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_tpu.solvers import sqp
from drake_tpu.systems.base import DiscreteSystem


@dataclasses.dataclass(frozen=True)
class DirtranProblem:
    """Static description of a direct-transcription NLP.

    Decision vector: z = [x_0 .. x_{N-1}, u_0 .. u_{N-2}] — N knot states
    and N-1 inputs (input at the final knot does not act, same convention
    as DirectTranscription's num_inputs * (N-1) input variables).
    """

    system: DiscreteSystem
    num_time_samples: int
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
        return N * self.nx + (N - 1) * self.nu

    # ---- packing ---------------------------------------------------------
    def pack(self, xs, us):
        return jnp.concatenate([xs.ravel(), us.ravel()])

    def unpack(self, z):
        N, nx, nu = self.num_time_samples, self.nx, self.nu
        xs = z[: N * nx].reshape(N, nx)
        us = z[N * nx :].reshape(N - 1, nu)
        return xs, us

    # ---- NLP pieces ------------------------------------------------------
    def defects(self, params, z):
        """x_{k+1} - g(x_k, u_k) for every interval."""
        xs, us = self.unpack(z)
        h = self.system.time_step
        ts = h * jnp.arange(self.num_time_samples - 1, dtype=z.dtype)
        g_next = jax.vmap(lambda x, u, t: self.system.g(params, x, u, t))(
            xs[:-1], us, ts
        )
        return (xs[1:] - g_next).ravel()

    def constraints(self, z, params):
        parts = [self.defects(params, z)]
        xs, _ = self.unpack(z)
        if self.x0 is not None:
            parts.append(xs[0] - self.x0)
        if self.xf is not None:
            parts.append(xs[-1] - self.xf)
        return jnp.concatenate(parts)

    def cost(self, z, params):
        xs, us = self.unpack(z)
        total = jnp.asarray(0.0, z.dtype)
        if self.running_cost is not None:
            # Sum over intervals, scaled by the period (AddRunningCost's
            # "integral approximated by sample * h" convention).
            g = jax.vmap(self.running_cost)(xs[:-1], us)
            total = total + self.system.time_step * jnp.sum(g)
        if self.final_cost is not None:
            total = total + self.final_cost(xs[-1])
        return total

    def bounds(self, dtype=jnp.float32):
        N, nx, nu = self.num_time_samples, self.nx, self.nu
        lb = jnp.full((self.num_vars,), -jnp.inf, dtype)
        ub = jnp.full((self.num_vars,), jnp.inf, dtype)
        if self.x_lower is not None:
            lb = lb.at[: N * nx].set(jnp.tile(self.x_lower, N))
        if self.x_upper is not None:
            ub = ub.at[: N * nx].set(jnp.tile(self.x_upper, N))
        if self.u_lower is not None:
            lb = lb.at[N * nx :].set(jnp.tile(self.u_lower, N - 1))
        if self.u_upper is not None:
            ub = ub.at[N * nx :].set(jnp.tile(self.u_upper, N - 1))
        return lb, ub

    def initial_guess(self, x_init, x_final=None, dtype=jnp.float32):
        """Straight-line state interpolation, zero input."""
        N = self.num_time_samples
        x_init = jnp.asarray(x_init, dtype)
        if x_final is None:
            xs = jnp.tile(x_init, (N, 1))
        else:
            alpha = jnp.linspace(0.0, 1.0, N, dtype=dtype)[:, None]
            xs = (1 - alpha) * x_init + alpha * jnp.asarray(x_final, dtype)
        us = jnp.zeros((N - 1, self.nu), dtype)
        return self.pack(xs, us)


class DirtranSolution(NamedTuple):
    xs: jnp.ndarray  # (N, nx)
    us: jnp.ndarray  # (N-1, nu)
    cost: jnp.ndarray
    constraint_violation: jnp.ndarray
    success: jnp.ndarray

    def times(self, time_step):
        N = self.xs.shape[0]
        return time_step * jnp.arange(N, dtype=self.xs.dtype)


def solve(
    problem: DirtranProblem,
    params,
    z0,
    options: sqp.SqpOptions = sqp.SqpOptions(),
) -> DirtranSolution:
    """Solve the direct-transcription NLP on device.  jit/vmap-compatible."""
    lb, ub = problem.bounds(z0.dtype)
    res = sqp.solve(
        problem.cost, problem.constraints, z0, lb, ub, options, args=(params,)
    )
    xs, us = problem.unpack(res.z)
    return DirtranSolution(
        xs=xs,
        us=us,
        cost=res.cost,
        constraint_violation=res.constraint_violation,
        success=res.success,
    )
