"""Forward kinematics over the static-topology tree.

Re-derivation of MultibodyTree::CalcPositionKinematicsCache /
CalcVelocityKinematicsCache (reference: multibody/tree/multibody_tree.h:1303,
1319) as pure unrolled functions: the topology loop runs at trace time, so
XLA sees a flat chain of small matrix ops (fusable, vmappable); no runtime
cache/invalidation is needed (XLA CSE plays that role).

Conventions: spatial vectors are [w; v] in the *body frame about the body
origin*.  X_WB is returned as (R_WB, p_WB) pairs stacked over bodies.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from drake_tpu.math import rotations as rot
from drake_tpu.multibody.model import (
    BALL,
    FLOATING,
    PLANAR,
    PRISMATIC,
    REVOLUTE,
    SCREW,
    WELD,
    MultibodyModel,
    MultibodyParams,
)


class JointKinematics(NamedTuple):
    R: jnp.ndarray  # (3,3) R_PB child orientation in parent
    p: jnp.ndarray  # (3,) child origin in parent
    S: jnp.ndarray  # (6, nv_i) motion subspace in child frame
    v_joint: jnp.ndarray  # (6,) S @ v_i  spatial velocity across the joint


def joint_transform(model: MultibodyModel, params: MultibodyParams, i: int, q):
    """X_PB(q_i) = X_PJ * X_J(q_i) and the motion subspace for joint i."""
    jt = model.joint_types[i]
    qo = model.q_offsets[i]
    R_PJ = params.X_PJ_R[i]
    p_PJ = params.X_PJ_p[i]
    axis = params.axis[i]
    dtype = R_PJ.dtype

    if jt == REVOLUTE:
        qi = q[qo]
        R_J = rot.axis_angle_to_rotation(axis, qi)
        R = R_PJ @ R_J
        p = p_PJ
        S = jnp.concatenate([axis, jnp.zeros(3, dtype)])[:, None]
    elif jt == PRISMATIC:
        qi = q[qo]
        R = R_PJ
        p = p_PJ + qi * (R_PJ @ axis)
        S = jnp.concatenate([jnp.zeros(3, dtype), axis])[:, None]
    elif jt == WELD:
        R = R_PJ
        p = p_PJ
        S = jnp.zeros((6, 0), dtype)
    elif jt == FLOATING:
        quat = rot.quat_normalize(q[qo : qo + 4])
        R_J = rot.quat_to_rotation(quat)
        R = R_PJ @ R_J
        p = p_PJ + R_PJ @ q[qo + 4 : qo + 7]
        # v = [w_B; v_B] body-frame angular + linear velocity.
        S = jnp.eye(6, dtype=dtype)
    elif jt == BALL:
        # Spherical joint (reference multibody/tree/ball_rpy_joint.h role,
        # with a quaternion chart instead of RPY — no gimbal singularity).
        quat = rot.quat_normalize(q[qo : qo + 4])
        R = R_PJ @ rot.quat_to_rotation(quat)
        p = p_PJ
        S = jnp.concatenate(
            [jnp.eye(3, dtype=dtype), jnp.zeros((3, 3), dtype)], axis=0
        )
    elif jt == PLANAR:
        # q = [x, y, theta] in the joint frame (translate in Jx-Jy, rotate
        # about Jz: reference multibody/tree/planar_joint.h).  v =
        # [vx_B, vy_B, wz] CHILD-frame rates, which keeps S constant in the
        # child frame (the RNEA/CRBA assumption); qdot_from_v applies R(th).
        x, y, th = q[qo], q[qo + 1], q[qo + 2]
        R_J = rot.axis_angle_to_rotation(jnp.asarray([0.0, 0.0, 1.0], dtype), th)
        R = R_PJ @ R_J
        p = p_PJ + R_PJ @ jnp.stack([x, y, jnp.zeros((), dtype)])
        S = jnp.asarray(
            [
                [0.0, 0.0, 0.0],
                [0.0, 0.0, 0.0],
                [0.0, 0.0, 1.0],
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 0.0],
            ],
            dtype,
        )
    elif jt == SCREW:
        # Rotation theta about `axis` coupled with translation
        # pitch*theta/(2 pi) along it (reference multibody/tree/screw_joint.h).
        qi = q[qo]
        lead = params.screw_pitch[i] / (2.0 * jnp.pi)
        R_J = rot.axis_angle_to_rotation(axis, qi)
        R = R_PJ @ R_J
        p = p_PJ + (lead * qi) * (R_PJ @ axis)
        S = jnp.concatenate([axis, lead * axis])[:, None]
    else:
        raise ValueError(f"unknown joint type {jt}")
    return R, p, S


def forward_kinematics(
    model: MultibodyModel, params: MultibodyParams, q
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World poses of all bodies: (R_WB (nb,3,3), p_WB (nb,3))."""
    nb = model.num_bodies
    Rs, ps = [], []
    for i in range(nb):
        R_PB, p_PB, _ = joint_transform(model, params, i, q)
        p_idx = model.parent[i]
        if p_idx < 0:
            Rs.append(R_PB)
            ps.append(p_PB)
        else:
            Rs.append(Rs[p_idx] @ R_PB)
            ps.append(ps[p_idx] + Rs[p_idx] @ p_PB)
    return jnp.stack(Rs), jnp.stack(ps)


def body_spatial_velocities(model: MultibodyModel, params: MultibodyParams, q, v):
    """Spatial velocity of each body in its own frame about its origin.

    Returns (nb, 6) array [w_B; v_Bo] expressed in B.  Also returns the
    per-joint kinematics used (for reuse in dynamics).
    """
    nb = model.num_bodies
    Vs = []
    joints = []
    for i in range(nb):
        R_PB, p_PB, S = joint_transform(model, params, i, q)
        vo = model.v_offsets[i]
        nvi = S.shape[1]
        v_i = v[vo : vo + nvi]
        vJ = S @ v_i if nvi > 0 else jnp.zeros(6, S.dtype)
        p_idx = model.parent[i]
        if p_idx < 0:
            V = vJ
        else:
            Vp = Vs[p_idx]
            # Transform parent spatial velocity into child frame:
            # w_B = R_BP w_P ; v_B = R_BP (v_P + w_P x p_PB)
            R_BP = R_PB.T
            w = R_BP @ Vp[:3]
            vv = R_BP @ (Vp[3:] + jnp.cross(Vp[:3], p_PB))
            V = jnp.concatenate([w, vv]) + vJ
        Vs.append(V)
        joints.append(JointKinematics(R=R_PB, p=p_PB, S=S, v_joint=vJ))
    return jnp.stack(Vs), joints


def world_velocities(model, params, q, v):
    """Spatial velocities in world frame about each body origin: (nb, 6)."""
    R_WB, p_WB = forward_kinematics(model, params, q)
    V_B, _ = body_spatial_velocities(model, params, q, v)
    w_W = jnp.einsum("bij,bj->bi", R_WB, V_B[:, :3])
    v_W = jnp.einsum("bij,bj->bi", R_WB, V_B[:, 3:])
    return jnp.concatenate([w_W, v_W], axis=1)


def world_velocity_jacobians(model, params, q):
    """Analytic world-frame spatial jacobians: (nb, 6, nv) with
    world_velocities(q, v)[i] == J[i] @ v for all v.

    The same tree recursion as body_spatial_velocities, carried on (6, nv)
    matrices instead of (6,) vectors (the map is linear in v).  Exists so
    contact-Jacobian construction does not need a jacfwd over a per-contact
    Python loop — under SECOND-order AD (jacrev of the SAP step inside MPC)
    that jacfwd graph materializes thousands of (..., 1, 3)-shaped HLO
    temps that pad 6.3x on TPU tiling and crash the worker at large batch
    (see benchmarks/crash_forensics.py, BASELINE.md round 4)."""
    nb = model.num_bodies
    nv = model.num_velocities
    dtype = q.dtype
    R_WB, p_WB = forward_kinematics(model, params, q)
    Js = []
    for i in range(nb):
        R_PB, p_PB, S = joint_transform(model, params, i, q)
        J = jnp.zeros((6, nv), dtype)
        nvi = S.shape[1]
        if nvi > 0:
            vo = model.v_offsets[i]
            J = J.at[:, vo : vo + nvi].set(S)
        p_idx = model.parent[i]
        if p_idx >= 0:
            Jp = Js[p_idx]
            R_BP = R_PB.T
            # Per column: w_B = R_BP w_P ; v_B = R_BP (v_P + w_P x p_PB),
            # with the cross as a skew matmul (w x p = -[p]x w) — matmul
            # shapes survive second-order AD without the (.., 1, 3)
            # padded temps a columnwise jnp.cross emits.
            z = jnp.zeros((), dtype)
            skew_p = jnp.stack([
                jnp.stack([z, -p_PB[2], p_PB[1]]),
                jnp.stack([p_PB[2], z, -p_PB[0]]),
                jnp.stack([-p_PB[1], p_PB[0], z]),
            ])
            w_cols = R_BP @ Jp[:3]
            v_cols = R_BP @ (Jp[3:] - skew_p @ Jp[:3])
            J = J + jnp.concatenate([w_cols, v_cols], axis=0)
        Js.append(J)
    J_B = jnp.stack(Js)  # (nb, 6, nv), body frame about body origin
    w_W = jnp.einsum("bij,bjv->biv", R_WB, J_B[:, :3])
    v_W = jnp.einsum("bij,bjv->biv", R_WB, J_B[:, 3:])
    return jnp.concatenate([w_W, v_W], axis=1)
