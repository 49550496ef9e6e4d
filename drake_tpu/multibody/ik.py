"""Inverse kinematics: differential IK and NLP-based pose IK.

Re-derivation of the reference's IK layer (reference:
multibody/inverse_kinematics/inverse_kinematics.h:24 — an NLP over q with
kinematic constraints solved by SNOPT; differential_inverse_kinematics.h —
velocity-level QP).  Here:

  - ``solve_ik``: pose/position IK as a Sl1QP solve over q (the
    MathematicalProgram + AddPositionConstraint path) — vmap for batches of
    targets.
  - ``differential_ik_step``: damped-least-squares velocity IK with joint
    limits (the DifferentialInverseKinematicsIntegrator core).

Frame Jacobians come from jacfwd of forward kinematics — AutoDiffXd's role.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.model import MultibodyModel, MultibodyParams
from drake_tpu.solvers import sqp


def frame_position(model, params, q, body_index: int, p_BQ=None):
    """World position of a point Q fixed on a body."""
    R_WB, p_WB = kin.forward_kinematics(model, params, q)
    p = p_WB[body_index]
    if p_BQ is not None:
        p = p + R_WB[body_index] @ jnp.asarray(p_BQ, q.dtype)
    return p


def position_jacobian(model, params, q, body_index: int, p_BQ=None):
    """3 x nq translational Jacobian of the point (jacfwd; exact)."""
    return jax.jacfwd(
        lambda qq: frame_position(model, params, qq, body_index, p_BQ)
    )(q)


class DiffIkResult(NamedTuple):
    v: jnp.ndarray
    position_error: jnp.ndarray


def differential_ik_step(
    model: MultibodyModel,
    params: MultibodyParams,
    q,
    p_target,
    body_index: int,
    p_BQ=None,
    gain: float = 1.0,
    damping: float = 1e-4,
    v_limits=None,
) -> DiffIkResult:
    """One damped-least-squares velocity step toward a position target.

    v = J^T (J J^T + damping I)^{-1} (gain * error); clipped to v_limits.
    """
    p_now = frame_position(model, params, q, body_index, p_BQ)
    err = jnp.asarray(p_target, q.dtype) - p_now
    J = position_jacobian(model, params, q, body_index, p_BQ)
    JJt = J @ J.T + damping * jnp.eye(3, dtype=q.dtype)
    v = J.T @ jnp.linalg.solve(JJt, gain * err)
    if v_limits is not None:
        v = jnp.clip(v, -v_limits, v_limits)
    return DiffIkResult(v=v, position_error=err)


def solve_ik(
    model: MultibodyModel,
    params: MultibodyParams,
    q0,
    body_index: int,
    p_target,
    p_BQ=None,
    q_lower=None,
    q_upper=None,
    posture_weight: float = 1e-3,
    tol: float = 1e-6,
    options: Optional[sqp.SqpOptions] = None,
):
    """Position IK as an NLP: min ||q - q0||^2 s.t. p(q) = p_target, bounds.

    Mirrors InverseKinematics + AddPositionConstraint + Solve.  Returns the
    SqpResult (z is the solution q).  jit/vmap-friendly.
    """
    p_target = jnp.asarray(p_target, q0.dtype)

    def cost(q):
        return posture_weight * jnp.sum((q - q0) ** 2)

    def constraint(q):
        return frame_position(model, params, q, body_index, p_BQ) - p_target

    opts = options or sqp.SqpOptions(max_iters=60, constraint_tol=tol)
    return sqp.solve(
        lambda q: cost(q),
        lambda q: constraint(q),
        q0,
        q_lower,
        q_upper,
        opts,
    )


class GlobalIkResult(NamedTuple):
    q: jnp.ndarray  # best configuration found
    cost: jnp.ndarray
    constraint_violation: jnp.ndarray
    success: jnp.ndarray
    n_feasible: jnp.ndarray  # how many starts reached feasibility


def solve_global_ik(
    model: MultibodyModel,
    params: MultibodyParams,
    key,
    num_starts: int,
    body_index: int,
    p_target,
    p_BQ=None,
    q_lower=None,
    q_upper=None,
    q_nominal=None,
    posture_weight: float = 1e-3,
    tol: float = 1e-6,
    options: Optional[sqp.SqpOptions] = None,
):
    """Global position IK by massively-parallel multi-start NLP.

    The reference's GlobalInverseKinematics (global_inverse_kinematics.h)
    escapes local minima with a mixed-integer relaxation of the rotation
    group solved on the host.  The TPU-idiomatic equivalent exploits what
    the chip is good at instead: vmap `num_starts` NLP solves from
    uniformly-sampled configurations in one XLA program and take the best
    feasible solution.  On a chip where one solve and 256 solves cost
    nearly the same wall time, dense multi-start IS the global method.

    Returns GlobalIkResult with the best (lowest-cost feasible, else
    lowest-violation) solution.  jit-friendly; vmap again over targets for
    batched global IK.
    """
    p_target = jnp.asarray(p_target)
    dtype = p_target.dtype
    nq = model.num_positions
    lo = (
        jnp.full((nq,), -jnp.pi, dtype) if q_lower is None
        else jnp.asarray(q_lower, dtype)
    )
    hi = (
        jnp.full((nq,), jnp.pi, dtype) if q_upper is None
        else jnp.asarray(q_upper, dtype)
    )
    q_nom = (
        0.5 * (lo + hi) if q_nominal is None else jnp.asarray(q_nominal, dtype)
    )
    starts = lo + (hi - lo) * jax.random.uniform(
        key, (num_starts, nq), dtype
    )
    # Always include the nominal posture as one start.
    starts = starts.at[0].set(q_nom)

    def one(q0):
        res = solve_ik(
            model, params, q0, body_index, p_target, p_BQ=p_BQ,
            q_lower=q_lower, q_upper=q_upper,
            posture_weight=posture_weight, tol=tol, options=options,
        )
        # Rank by posture cost from the NOMINAL (not the random start).
        cost = posture_weight * jnp.sum((res.z - q_nom) ** 2)
        return res.z, cost, res.constraint_violation, res.success

    qs, costs, viols, succ = jax.vmap(one)(starts)
    feasible = viols <= tol * 10.0
    n_feasible = jnp.sum(feasible)
    # Lowest cost among feasible; else lowest violation.
    score = jnp.where(feasible, costs, jnp.inf)
    best_feas = jnp.argmin(score)
    best_any = jnp.argmin(viols)
    best = jnp.where(n_feasible > 0, best_feas, best_any)
    return GlobalIkResult(
        q=qs[best],
        cost=costs[best],
        constraint_violation=viols[best],
        success=n_feasible > 0,
        n_feasible=n_feasible,
    )
