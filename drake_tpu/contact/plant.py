"""Discrete contact plant: the MultibodyPlant(time_step>0) + SAP pipeline.

Re-derivation of the reference's discrete update path (multibody_plant.cc:2977
CalcDiscreteStep → DiscreteUpdateManager::CalcDiscreteValues →
CompliantContactManager → SapDriver, SURVEY.md §3.2) as one pure function:

    x_{t+1} = step(params, x_t, u_t)

assembling the SAP problem at (q, v) and solving it on device.  Symplectic
position update q_{t+1} = q + h N(q) v_{t+1} (quaternions advanced by the
exponential map), matching Drake's discrete scheme.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from drake_tpu.contact import sap
from drake_tpu.geometry.scene import CollisionScene
from drake_tpu.math import rotations as rot
from drake_tpu.multibody.model import FLOATING, MultibodyModel, MultibodyParams
from drake_tpu.systems.base import DiscreteSystem


def advance_positions(model: MultibodyModel, params, q, v, h):
    """q_next = q (+) h*v with quaternion exponential for floating joints."""
    dtype = q.dtype
    q_next = q
    for i, jt in enumerate(model.joint_types):
        qo = model.q_offsets[i]
        vo = model.v_offsets[i]
        if jt == FLOATING:
            quat = rot.quat_normalize(q[qo : qo + 4])
            w_B = v[vo : vo + 3]
            v_B = v[vo + 3 : vo + 6]
            quat_next = rot.quat_integrate(quat, w_B, h)
            R_JB = rot.quat_to_rotation(quat)
            xyz_next = q[qo + 4 : qo + 7] + h * (R_JB @ v_B)
            q_next = q_next.at[qo : qo + 4].set(quat_next)
            q_next = q_next.at[qo + 4 : qo + 7].set(xyz_next)
        elif jt == "ball":
            quat = rot.quat_normalize(q[qo : qo + 4])
            q_next = q_next.at[qo : qo + 4].set(
                rot.quat_integrate(quat, v[vo : vo + 3], h)
            )
        elif jt == "planar":
            th = q[qo + 2]
            c, s = jnp.cos(th), jnp.sin(th)
            vx, vy, wz = v[vo], v[vo + 1], v[vo + 2]
            q_next = q_next.at[qo].set(q[qo] + h * (c * vx - s * vy))
            q_next = q_next.at[qo + 1].set(q[qo + 1] + h * (s * vx + c * vy))
            q_next = q_next.at[qo + 2].set(th + h * wz)
        elif jt in ("revolute", "prismatic", "screw"):
            q_next = q_next.at[qo].set(q[qo] + h * v[vo])
    return q_next


def make_discrete_system(
    model: MultibodyModel,
    params: MultibodyParams,
    scene: CollisionScene,
    time_step: float,
    actuated_joints: Optional[Sequence[str]] = None,
    sap_params: sap.SapParameters = sap.SapParameters(),
    joint_limits=None,  # optional (q_lower (nv,), q_upper (nv,))
    couplers=None,  # optional [(joint_a, joint_b, ratio, offset), ...]
    ball_constraints=None,
    distance_constraints=None,
    weld_constraints=None,
    pd_joints=None,  # optional [(joint, Kp, Kd, effort_limit), ...]
) -> DiscreteSystem:
    """Discrete plant with SAP contact; x = [q; v].

    Input u: actuation torques for the directly-actuated joints, followed by
    desired positions for the `pd_joints` (implicit effort-limited PD servos
    solved inside SAP — the sap_pd_controller_constraint role)."""
    nq = model.num_positions
    nv = model.num_velocities
    h = time_step

    pd_joints = tuple(pd_joints or ())
    pd_names = {spec[0] for spec in pd_joints}
    if actuated_joints is None:
        act = [
            i
            for i, jt in enumerate(model.joint_types)
            if jt in ("revolute", "prismatic")
            and model.joint_names[i] not in pd_names
        ]
    else:
        act = [model.joint_names.index(n) for n in actuated_joints]
    act_v_offsets = [model.v_offsets[i] for i in act]
    nu = len(act)
    npd = len(pd_joints)

    def g(p: MultibodyParams, x, u, t=0.0):
        q, v = x[:nq], x[nq:]
        tau = jnp.zeros(nv, x.dtype)
        for k, vo in enumerate(act_v_offsets):
            tau = tau.at[vo].add(u[k])
        pd = None
        if npd:
            qd_des = u[nu : nu + npd]
            zero = jnp.zeros(npd, x.dtype)
            pd = (pd_joints, qd_des, zero, zero)
        data, _ = sap.assemble(
            model, p, scene, q, v, tau, h, sap_params,
            joint_limits=joint_limits, couplers=couplers,
            ball_constraints=ball_constraints,
            distance_constraints=distance_constraints,
            weld_constraints=weld_constraints,
            pd_controllers=pd,
        )
        sol = sap.solve_sap(data, data.v_star, sap_params)
        v_next = sol.v
        q_next = advance_positions(model, p, q, v_next, h)
        return jnp.concatenate([q_next, v_next])

    return DiscreteSystem(
        g=g,
        num_states=nq + nv,
        num_inputs=nu + npd,
        time_step=h,
        default_params=params,
    )


def step_with_forces(
    model, params, scene, q, v, tau, h, sap_params=sap.SapParameters()
):
    """One SAP step returning (q_next, v_next, contact solution) for
    inspection — the ContactResults-reporting analog."""
    data, contact = sap.assemble(model, params, scene, q, v, tau, h, sap_params)
    sol = sap.solve_sap(data, data.v_star, sap_params)
    q_next = advance_positions(model, params, q, sol.v, h)
    return q_next, sol.v, sol, contact


def contact_forces_continuous(
    model: MultibodyModel,
    params: MultibodyParams,
    scene: CollisionScene,
    q,
    v,
    dissipation_hc: float = 1.0,
    stiction_velocity: float = 1e-3,
):
    """Compliant point-contact generalized forces for the CONTINUOUS plant.

    The reference's continuous-time contact path (MultibodyPlant with
    time_step=0, ContactModel point: compliant penalty forces with
    Hunt-Crossley dissipation, multibody/plant/multibody_plant.h:134;
    hunt_crossley dissipation form f = k x (1 + d xdot)+ and regularized
    Coulomb friction per contact_model docs).  Discrete SAP replaces this
    for MPC; this path exists for error-controlled integration of smooth
    contact (bouncing, rolling) with the RK/Radau integrators.

    Returns tau_c (nv,) to add to the applied generalized forces.
    """
    contact = scene.query(model, params, q)
    nc = contact.phi.shape[0]
    nv = model.num_velocities
    if nc == 0:
        return jnp.zeros(nv, q.dtype)
    frames = sap.contact_frame(contact.n_W)  # (nc, 3, 3) cols [t1 t2 n]
    frames_list = [frames[c] for c in range(nc)]
    J = sap.make_contact_jacobian(model, params, q, contact, frames_list)
    vc = jnp.einsum("cij,j->ci", J, v)  # (nc, 3) [vt1, vt2, vn]

    x = jnp.maximum(-contact.phi, 0.0)  # penetration depth
    xdot = -vc[:, 2]  # penetration rate (vn separates)
    d = dissipation_hc * contact.dissipation
    fn = contact.stiffness * x * jnp.maximum(1.0 + d * xdot, 0.0)

    vt = vc[:, :2]
    slip = jnp.sqrt(jnp.sum(vt**2, axis=1) + stiction_velocity**2)
    ft = -contact.friction[:, None] * fn[:, None] * vt / slip[:, None]

    f_c = jnp.concatenate([ft, fn[:, None]], axis=1)  # (nc, 3) contact frame
    return jnp.einsum("cij,ci->j", J, f_c)


def make_continuous_contact_system(
    model: MultibodyModel,
    params: MultibodyParams,
    scene: CollisionScene,
    actuated_joints: Optional[Sequence[str]] = None,
    dissipation_hc: float = 1.0,
    stiction_velocity: float = 1e-3,
):
    """Continuous plant WITH compliant point contact: xdot = f(params, x, u).

    The ContactModel-point continuous MultibodyPlant role.  Integrate with
    drake_tpu.systems.integrators (error-controlled RK or implicit Radau for
    stiff stiffness/dissipation settings).
    """
    from drake_tpu.multibody.plant import make_system

    def contact_tau(p, q, v, t):
        return contact_forces_continuous(
            model, p, scene, q, v,
            dissipation_hc=dissipation_hc,
            stiction_velocity=stiction_velocity,
        )

    return make_system(
        model, params, actuated_joints=actuated_joints,
        applied_forces=lambda p, q, v, t: contact_tau(p, q, v, t),
    )
