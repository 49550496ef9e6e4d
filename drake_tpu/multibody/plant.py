"""MultibodyPlant analog: the articulated model as a ContinuousSystem.

Re-derivation of MultibodyPlant's continuous dynamics path (reference:
multibody/plant/multibody_plant.h; continuous ABA via multibody_tree.h:1636)
as a pure function over x = [q; v]:

    qdot = N(q) v        (identity for 1-dof joints; quaternion kinematics
                          for floating bases — matching Drake's
                          quaternion_floating_joint MapVelocityToQDot)
    vdot = M(q)^{-1} (B u + tau_ext - C(q, v))

The discrete/contact path (SAP) lives in drake_tpu.contact.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from drake_tpu.math import rotations as rot
from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody.model import (
    FLOATING,
    MultibodyModel,
    MultibodyParams,
)
from drake_tpu.systems.base import ContinuousSystem


def qdot_from_v(model: MultibodyModel, params: MultibodyParams, q, v):
    """Map generalized velocities to position derivatives (N(q) v)."""
    dtype = q.dtype
    qdot = jnp.zeros(model.num_positions, dtype)
    for i, jt in enumerate(model.joint_types):
        qo = model.q_offsets[i]
        vo = model.v_offsets[i]
        if jt == FLOATING:
            quat = rot.quat_normalize(q[qo : qo + 4])
            w_B = v[vo : vo + 3]
            v_B = v[vo + 3 : vo + 6]
            quat_dot = rot.quat_derivative(quat, w_B)
            R_JB = rot.quat_to_rotation(quat)
            xyz_dot = R_JB @ v_B
            qdot = qdot.at[qo : qo + 4].set(quat_dot)
            qdot = qdot.at[qo + 4 : qo + 7].set(xyz_dot)
        elif jt == "ball":
            quat = rot.quat_normalize(q[qo : qo + 4])
            qdot = qdot.at[qo : qo + 4].set(
                rot.quat_derivative(quat, v[vo : vo + 3])
            )
        elif jt == "planar":
            # v = [vx_B, vy_B, wz] (child-frame rates); rotate the linear
            # part back into the joint frame for [xdot, ydot].
            th = q[qo + 2]
            c, s = jnp.cos(th), jnp.sin(th)
            vx, vy, wz = v[vo], v[vo + 1], v[vo + 2]
            qdot = qdot.at[qo].set(c * vx - s * vy)
            qdot = qdot.at[qo + 1].set(s * vx + c * vy)
            qdot = qdot.at[qo + 2].set(wz)
        else:
            nq = {"revolute": 1, "prismatic": 1, "weld": 0, "screw": 1}[jt]
            if nq:
                qdot = qdot.at[qo : qo + nq].set(v[vo : vo + nq])
    return qdot


def make_system(
    model: MultibodyModel,
    params: MultibodyParams,
    actuated_joints: Optional[Sequence[str]] = None,
    applied_forces=None,
) -> ContinuousSystem:
    """Build a ContinuousSystem with x = [q; v], u = actuated joint torques.

    ``actuated_joints``: joint names receiving direct torque input (default:
    every 1-dof joint, mirroring a fully-actuated plant).

    ``applied_forces``: optional callback ``(params, q, v, t) -> tau (nv,)``
    adding state-dependent generalized forces — the ForceElement hook
    (reference multibody/tree/force_element.h CalcAndAddForceContribution);
    pair with :func:`drake_tpu.multibody.force_elements.generalized_forces`.
    """
    nq = model.num_positions
    nv = model.num_velocities

    if actuated_joints is None:
        act = [
            i
            for i, jt in enumerate(model.joint_types)
            if jt in ("revolute", "prismatic")
        ]
    else:
        act = [model.joint_names.index(n) for n in actuated_joints]
    act_v_offsets = [model.v_offsets[i] for i in act]
    nu = len(act)

    def f(p: MultibodyParams, x, u, t=0.0):
        q, v = x[..., :nq], x[..., nq:]
        tau = jnp.zeros(nv, x.dtype)
        for k, vo in enumerate(act_v_offsets):
            tau = tau.at[vo].add(u[..., k])
        if applied_forces is not None:
            tau = tau + applied_forces(p, q, v, t)
        vdot = dyn.forward_dynamics(model, p, q, v, tau)
        qdot = qdot_from_v(model, p, q, v)
        return jnp.concatenate([qdot, vdot], axis=-1)

    return ContinuousSystem(
        f=f,
        num_states=nq + nv,
        num_inputs=nu,
        num_q=nq,
        num_v=nv,
        default_params=params,
    )
