"""Kinematic constraint zoo for IK (multibody/inverse_kinematics/).

The reference ships 25+ constraint evaluators (position_constraint.h,
orientation_constraint.h, gaze_target_constraint.h,
angle_between_vectors_constraint.h, point_to_point_distance_constraint.h,
com_position_constraint.h, unit_quaternion_constraint.h, ...) that plug
into a MathematicalProgram via InverseKinematics (inverse_kinematics.h).

TPU-native shape: each constraint is a pure residual function
``value(model, params, q) -> (k,)`` with bounds, and the IK solve stacks
all constraints into ONE Sl1QP NLP.  Ranged (inequality) constraints are
converted to equalities with bound slack variables — z = [q; s],
f_i(q) - s_i = 0, lb_i <= s_i <= ub_i — so the whole zoo rides the same
f32-robust SQP used by dircol, and batches of IK problems vmap.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.model import MultibodyModel, MultibodyParams
from drake_tpu.solvers import sqp


class IkConstraint(NamedTuple):
    """A vector-valued kinematic constraint lb <= value(q) <= ub."""

    value: Callable  # (model, params, q) -> (k,)
    lb: jnp.ndarray  # (k,)
    ub: jnp.ndarray  # (k,)
    name: str = ""


def _frame_point(model, params, q, body: int, p_BQ):
    R_WB, p_WB = kin.forward_kinematics(model, params, q)
    p_BQ = jnp.asarray(p_BQ, q.dtype)
    if body < 0:
        return p_BQ
    return p_WB[body] + R_WB[body] @ p_BQ


def position_constraint(
    body_b: int, p_BQ, body_a: int, p_AQ_lower, p_AQ_upper
) -> IkConstraint:
    """Point Q of frame B inside a box in frame A (position_constraint.h)."""
    lo = jnp.asarray(p_AQ_lower, jnp.float64)
    hi = jnp.asarray(p_AQ_upper, jnp.float64)

    def value(model, params, q):
        p_WQ = _frame_point(model, params, q, body_b, p_BQ)
        if body_a < 0:
            return p_WQ
        R_WA, p_WA = kin.forward_kinematics(model, params, q)
        return R_WA[body_a].T @ (p_WQ - p_WA[body_a])

    return IkConstraint(value, lo, hi, "position")


def orientation_constraint(
    body_a: int, body_b: int, angle_bound: float, R_AbarA=None
) -> IkConstraint:
    """Angle between frames A and B <= angle_bound
    (orientation_constraint.h: trace(R_AB) >= 1 + 2 cos(bound))."""
    thresh = 1.0 + 2.0 * float(np.cos(angle_bound))

    def value(model, params, q):
        R_WB_all, _ = kin.forward_kinematics(model, params, q)
        R_A = R_WB_all[body_a] if body_a >= 0 else jnp.eye(3, dtype=q.dtype)
        if R_AbarA is not None:
            R_A = R_A @ jnp.asarray(R_AbarA, q.dtype)
        R_B = R_WB_all[body_b] if body_b >= 0 else jnp.eye(3, dtype=q.dtype)
        return jnp.trace(R_A.T @ R_B)[None]

    return IkConstraint(
        value, jnp.asarray([thresh]), jnp.asarray([3.0]), "orientation"
    )


def gaze_target_constraint(
    body_a: int, p_AS, n_A, body_b: int, p_BT, cone_half_angle: float
) -> IkConstraint:
    """Target T lies in the cone about gaze ray (S, n) of frame A
    (gaze_target_constraint.h): cos(angle(p_ST, n)) >= cos(half_angle)."""
    cos_half = float(np.cos(cone_half_angle))
    n_A = np.asarray(n_A, float)
    n_A = n_A / np.linalg.norm(n_A)

    def value(model, params, q):
        p_WS = _frame_point(model, params, q, body_a, p_AS)
        p_WT = _frame_point(model, params, q, body_b, p_BT)
        R_WB_all, _ = kin.forward_kinematics(model, params, q)
        n_W = (R_WB_all[body_a] @ jnp.asarray(n_A, q.dtype)
               if body_a >= 0 else jnp.asarray(n_A, q.dtype))
        d = p_WT - p_WS
        # cos angle - cos half >= 0, scaled by |d| to stay smooth at d=0
        return (d @ n_W - cos_half * jnp.linalg.norm(d))[None]

    return IkConstraint(
        value, jnp.asarray([0.0]), jnp.asarray([jnp.inf]), "gaze"
    )


def angle_between_vectors_constraint(
    body_a: int, n_A, body_b: int, n_B, angle_lower: float,
    angle_upper: float
) -> IkConstraint:
    """angle(a_W, b_W) in [lower, upper] (angle_between_vectors_constraint.h:
    bound cos of the angle)."""
    a = np.asarray(n_A, float); a = a / np.linalg.norm(a)
    b = np.asarray(n_B, float); b = b / np.linalg.norm(b)

    def value(model, params, q):
        R_WB_all, _ = kin.forward_kinematics(model, params, q)
        a_W = (R_WB_all[body_a] @ jnp.asarray(a, q.dtype)
               if body_a >= 0 else jnp.asarray(a, q.dtype))
        b_W = (R_WB_all[body_b] @ jnp.asarray(b, q.dtype)
               if body_b >= 0 else jnp.asarray(b, q.dtype))
        return (a_W @ b_W)[None]

    return IkConstraint(
        value,
        jnp.asarray([np.cos(angle_upper)]),
        jnp.asarray([np.cos(angle_lower)]),
        "angle_between_vectors",
    )


def point_to_point_distance_constraint(
    body_a: int, p_AP, body_b: int, p_BQ, distance_lower: float,
    distance_upper: float
) -> IkConstraint:
    """distance(P, Q) in [lower, upper] via the squared distance
    (point_to_point_distance_constraint.h)."""

    def value(model, params, q):
        p = _frame_point(model, params, q, body_a, p_AP)
        r = _frame_point(model, params, q, body_b, p_BQ)
        return jnp.sum((p - r) ** 2)[None]

    return IkConstraint(
        value,
        jnp.asarray([distance_lower**2]),
        jnp.asarray([distance_upper**2]),
        "point_to_point_distance",
    )


def com_position_constraint(lb, ub) -> IkConstraint:
    """Whole-model center of mass inside a world box
    (com_position_constraint.h)."""

    def value(model, params, q):
        R_WB, p_WB = kin.forward_kinematics(model, params, q)
        com_W = jax.vmap(lambda R, p, c: p + R @ c)(
            R_WB, p_WB, params.com
        )
        m = params.mass
        return (m @ com_W) / jnp.sum(m)

    return IkConstraint(
        value, jnp.asarray(lb, jnp.float64), jnp.asarray(ub, jnp.float64),
        "com_position",
    )


def unit_quaternion_constraint(q_offset: int) -> IkConstraint:
    """||q[q_offset:q_offset+4]|| = 1 (unit_quaternion_constraint.h) for
    floating/ball joints in the decision vector."""

    def value(model, params, q):
        quat = q[q_offset : q_offset + 4]
        return jnp.sum(quat**2)[None]

    return IkConstraint(
        value, jnp.asarray([1.0]), jnp.asarray([1.0]), "unit_quaternion"
    )


def solve_ik_constraints(
    model: MultibodyModel,
    params: MultibodyParams,
    q0: jnp.ndarray,
    constraints: Sequence[IkConstraint],
    q_lower=None,
    q_upper=None,
    posture_weight: float = 1e-3,
    options: Optional[sqp.SqpOptions] = None,
):
    """InverseKinematics + AddConstraint* + Solve over the constraint zoo.

    Ranged constraints become equalities with bound slacks:
    z = [q; s], f_i(q) - s_i = 0, lb <= s <= ub.  Returns (q, SqpResult).
    """
    dtype = q0.dtype
    nq = q0.shape[0]
    sizes = [int(c.lb.shape[0]) for c in constraints]
    ns = sum(sizes)

    lb_s = jnp.concatenate([jnp.asarray(c.lb, dtype) for c in constraints])
    ub_s = jnp.concatenate([jnp.asarray(c.ub, dtype) for c in constraints])
    z_lb = jnp.concatenate([
        jnp.full((nq,), -jnp.inf, dtype) if q_lower is None
        else jnp.asarray(q_lower, dtype),
        lb_s,
    ])
    z_ub = jnp.concatenate([
        jnp.full((nq,), jnp.inf, dtype) if q_upper is None
        else jnp.asarray(q_upper, dtype),
        ub_s,
    ])

    def cost(z):
        return posture_weight * jnp.sum((z[:nq] - q0) ** 2)

    def constraint(z):
        q, s = z[:nq], z[nq:]
        vals = jnp.concatenate(
            [c.value(model, params, q).reshape(-1) for c in constraints]
        )
        return vals - s

    # initialize slacks at the clipped constraint values so the start is
    # feasible in s
    v0 = jnp.concatenate(
        [c.value(model, params, q0).reshape(-1) for c in constraints]
    )
    s0 = jnp.clip(v0, lb_s, ub_s)
    z0 = jnp.concatenate([q0, s0.astype(dtype)])

    opts = options or sqp.SqpOptions(max_iters=80, constraint_tol=1e-8)
    res = sqp.solve(cost, constraint, z0, z_lb, z_ub, opts)
    return res.z[:nq], res


def point_to_line_distance_constraint(
    body_b: int, p_BQ, body_a: int, p_AP, n_A, d_lower: float, d_upper: float
) -> IkConstraint:
    """Distance from point Q (frame B) to the line through P with direction
    n (frame A) bounded in [d_lower, d_upper]
    (point_to_line_distance_constraint.h).  Constrained on the SQUARED
    distance for a smooth residual, as the reference does."""

    def value(model, params, q):
        p_WQ = _frame_point(model, params, q, body_b, p_BQ)
        p_WP = _frame_point(model, params, q, body_a, p_AP)
        n = jnp.asarray(n_A, q.dtype)
        if body_a >= 0:
            R_WA, _ = kin.forward_kinematics(model, params, q)
            n = R_WA[body_a] @ n
        n = n / jnp.linalg.norm(n)
        d = p_WQ - p_WP
        perp = d - jnp.dot(d, n) * n
        return jnp.dot(perp, perp)[None]

    if d_lower < 0:
        raise ValueError(
            "point_to_line_distance_constraint: distance_lower must be "
            ">= 0 (the reference requires this; a negative value would "
            "silently become a positive squared bound)"
        )
    return IkConstraint(
        value,
        jnp.asarray([d_lower**2], jnp.float64),
        jnp.asarray([d_upper**2], jnp.float64),
        "point_to_line_distance",
    )


def polyhedron_constraint(
    body_f: int, p_FQ, body_p: int, A, b
) -> IkConstraint:
    """Points Q (frame F) satisfy A x_P <= b in frame P
    (polyhedron_constraint.h); p_FQ is (m, 3), A is (k, 3), b (k,)."""
    A = jnp.asarray(A, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    p_FQ = jnp.asarray(p_FQ)
    m = p_FQ.shape[0]
    k = A.shape[0]

    def value(model, params, q):
        R_WB, p_WB = kin.forward_kinematics(model, params, q)
        rows = []
        for i in range(m):
            p_WQ = _frame_point(model, params, q, body_f, p_FQ[i])
            if body_p < 0:
                x_P = p_WQ
            else:
                x_P = R_WB[body_p].T @ (p_WQ - p_WB[body_p])
            rows.append(A.astype(q.dtype) @ x_P)
        return jnp.concatenate(rows)

    lb = jnp.full((k * m,), -jnp.inf, jnp.float64)
    ub = jnp.tile(b, m)
    return IkConstraint(value, lb, ub, "polyhedron")


def com_in_polyhedron_constraint(A, b) -> IkConstraint:
    """Whole-robot COM (world/expressed frame) inside {x : A x <= b}
    (com_in_polyhedron_constraint.h)."""
    A = jnp.asarray(A, jnp.float64)
    b = jnp.asarray(b, jnp.float64)

    def value(model, params, q):
        R_WB, p_WB = kin.forward_kinematics(model, params, q)
        masses = params.mass
        com_B = params.com
        p_com = (
            jnp.sum(
                masses[:, None]
                * (p_WB + jnp.einsum("bij,bj->bi", R_WB, com_B)),
                axis=0,
            )
            / jnp.sum(masses)
        )
        return A.astype(q.dtype) @ p_com

    return IkConstraint(
        value, jnp.full((A.shape[0],), -jnp.inf, jnp.float64), b,
        "com_in_polyhedron",
    )


def minimum_distance_lower_bound_constraint(
    scene, bound: float, influence_margin: float = 0.1
) -> IkConstraint:
    """All collision-pair signed distances >= bound
    (minimum_distance_lower_bound_constraint.h).  The reference penalizes
    distances inside an influence region with a smooth hinge and requires
    the aggregate to vanish; here the residual is the same smooth-min
    aggregate: softmin over pair distances within the influence region,
    constrained >= bound."""

    def value(model, params, q):
        contact = scene.query(model, params, q)
        phi = contact.phi
        # Smooth minimum (logsumexp) over the influence region; pairs far
        # beyond the margin contribute exponentially little.
        beta = 4.0 / max(influence_margin, 1e-6)
        return (-jax.nn.logsumexp(-beta * phi) / beta)[None]

    return IkConstraint(
        value, jnp.asarray([bound], jnp.float64),
        jnp.asarray([jnp.inf], jnp.float64), "minimum_distance_lower",
    )
