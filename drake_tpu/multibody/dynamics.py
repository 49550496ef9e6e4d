"""Articulated rigid-body dynamics: RNEA, CRBA mass matrix, forward dynamics.

Re-derivation of MultibodyTree's dynamics algorithms (reference:
multibody/tree/multibody_tree.h — CalcInverseDynamics/RNEA :1436,
CalcMassMatrix/composite-body :1599, ABA forward dynamics :1636-1906) in
Featherstone body-frame form, unrolled over the static topology.

TPU design note (SURVEY.md §7 'hard parts'): the reference's O(n) ABA is a
tip-to-base/base-to-tip serial recursion — latency-bound and branch-heavy.
At Drake-robot scale (n <= ~20) the TPU-optimal forward dynamics is
CRBA mass matrix + dense Cholesky solve of M vdot = tau - C: the O(n^2)/O(n^3)
terms are tiny dense ops that batch beautifully, and XLA fuses the unrolled
kinematic chain.  RNEA supplies C (bias) and inverse dynamics.

All functions take (model, params, ...) with unbatched q/v and are vmappable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from drake_tpu.math.rotations import hat
from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.model import MultibodyModel, MultibodyParams


def _spatial_inertia_body(params: MultibodyParams, i: int):
    """6x6 spatial inertia of body i about its own origin, in body frame.

    I = [[I_o, m c^], [m c^T(ranspose), m 1]],  I_o = I_com + m c^ c^T.
    """
    m = params.mass[i]
    c = params.com[i]
    C = hat(c)
    I_o = params.inertia_com[i] + m * (C @ C.T)
    top = jnp.concatenate([I_o, m * C], axis=1)
    bot = jnp.concatenate([m * C.T, m * jnp.eye(3, dtype=c.dtype)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _xform_motion_to_child(R_PB, p_PB, V_P):
    """Spatial motion vector from parent frame/origin to child frame/origin."""
    R_BP = R_PB.T
    w = R_BP @ V_P[:3]
    v = R_BP @ (V_P[3:] + jnp.cross(V_P[:3], p_PB))
    return jnp.concatenate([w, v])


def _xform_force_to_parent(R_PB, p_PB, F_B):
    """Spatial force from child frame/origin to parent frame/origin."""
    f = R_PB @ F_B[3:]
    n = R_PB @ F_B[:3] + jnp.cross(p_PB, f)
    return jnp.concatenate([n, f])


def _cross_motion(V, M):
    w, v = V[:3], V[3:]
    return jnp.concatenate(
        [jnp.cross(w, M[:3]), jnp.cross(w, M[3:]) + jnp.cross(v, M[:3])]
    )


def _cross_force(V, F):
    w, v = V[:3], V[3:]
    return jnp.concatenate(
        [jnp.cross(w, F[:3]) + jnp.cross(v, F[3:]), jnp.cross(w, F[3:])]
    )


def inverse_dynamics(
    model: MultibodyModel,
    params: MultibodyParams,
    q,
    v,
    vdot,
    external_forces_W: Optional[jnp.ndarray] = None,
):
    """RNEA: generalized forces tau realizing vdot at (q, v).

    Gravity is handled by the classic -g base-acceleration trick.
    ``external_forces_W``: optional (nb, 6) applied spatial forces [n; f] on
    each body, expressed in WORLD frame about the body origin (matches
    MultibodyPlant's applied_spatial_force semantics).
    Includes viscous joint damping (like Drake's joint damping models).
    """
    nb = model.num_bodies
    dtype = q.dtype

    # Forward pass: velocities and accelerations in body frames.
    Vs, As, joints = [], [], []
    R_W, p_W = [], []  # world poses for external force mapping
    a_base = jnp.concatenate([jnp.zeros(3, dtype), -params.gravity])
    for i in range(nb):
        R_PB, p_PB, S = kin.joint_transform(model, params, i, q)
        joints.append((R_PB, p_PB, S))
        vo = model.v_offsets[i]
        nvi = S.shape[1]
        v_i = v[vo : vo + nvi]
        vd_i = vdot[vo : vo + nvi]
        vJ = S @ v_i if nvi else jnp.zeros(6, dtype)
        aJ = S @ vd_i if nvi else jnp.zeros(6, dtype)
        p_idx = model.parent[i]
        if p_idx < 0:
            V = vJ
            A = _xform_motion_to_child(R_PB, p_PB, a_base) + aJ + _cross_motion(V, vJ)
            R_wi, p_wi = R_PB, p_PB
        else:
            V = _xform_motion_to_child(R_PB, p_PB, Vs[p_idx]) + vJ
            A = (
                _xform_motion_to_child(R_PB, p_PB, As[p_idx])
                + aJ
                + _cross_motion(V, vJ)
            )
            R_wi = R_W[p_idx] @ R_PB
            p_wi = p_W[p_idx] + R_W[p_idx] @ p_PB
        Vs.append(V)
        As.append(A)
        R_W.append(R_wi)
        p_W.append(p_wi)

    # Body forces.
    Fs = []
    for i in range(nb):
        I = _spatial_inertia_body(params, i)
        F = I @ As[i] + _cross_force(Vs[i], I @ Vs[i])
        if external_forces_W is not None:
            # Map world-frame applied force to body frame (about body origin).
            n_W, f_W = external_forces_W[i, :3], external_forces_W[i, 3:]
            F = F - jnp.concatenate([R_W[i].T @ n_W, R_W[i].T @ f_W])
        Fs.append(F)

    # Backward pass: accumulate and project.
    tau = jnp.zeros(model.num_velocities, dtype)
    for i in reversed(range(nb)):
        R_PB, p_PB, S = joints[i]
        vo = model.v_offsets[i]
        nvi = S.shape[1]
        if nvi:
            v_i = v[vo : vo + nvi]
            tau_i = S.T @ Fs[i] + params.damping[i] * v_i
            tau = tau.at[vo : vo + nvi].set(tau_i)
        p_idx = model.parent[i]
        if p_idx >= 0:
            Fs[p_idx] = Fs[p_idx] + _xform_force_to_parent(R_PB, p_PB, Fs[i])
    return tau


def bias_forces(model, params, q, v, external_forces_W=None):
    """C(q, v) including gravity and damping: tau needed for vdot = 0."""
    return inverse_dynamics(
        model, params, q, v, jnp.zeros(model.num_velocities, q.dtype),
        external_forces_W,
    )


def mass_matrix(model: MultibodyModel, params: MultibodyParams, q):
    """Composite-rigid-body mass matrix M(q) (nv, nv).

    Matches CalcMassMatrix's composite-body algorithm
    (multibody_tree.cc:1307 CalcCompositeBodyInertiasInWorld).
    """
    nb = model.num_bodies
    nv = model.num_velocities
    dtype = q.dtype
    joints = [kin.joint_transform(model, params, i, q) for i in range(nb)]
    Ic = [_spatial_inertia_body(params, i) for i in range(nb)]

    # Composite inertias, tip to base.  Inertias and Ic*S columns are
    # force-like: they transform with the Plücker FORCE transform
    # X_F = [[R, p^ R], [0, R]] (= X_M^{-T}), giving I_P = X_F I_B X_F'.
    def force_xform_to_parent(R_PB, p_PB):
        P = hat(p_PB)
        top = jnp.concatenate([R_PB, P @ R_PB], axis=1)
        bot = jnp.concatenate([jnp.zeros((3, 3), dtype), R_PB], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    Xups = [force_xform_to_parent(j[0], j[1]) for j in joints]
    for i in reversed(range(nb)):
        p_idx = model.parent[i]
        if p_idx >= 0:
            X = Xups[i]
            Ic[p_idx] = Ic[p_idx] + X @ Ic[i] @ X.T

    M = jnp.zeros((nv, nv), dtype)
    for i in range(nb):
        _, _, S_i = joints[i]
        nvi = S_i.shape[1]
        if nvi == 0:
            continue
        vo_i = model.v_offsets[i]
        F = Ic[i] @ S_i  # (6, nvi) in frame i
        M = M.at[vo_i : vo_i + nvi, vo_i : vo_i + nvi].set(S_i.T @ F)
        # Walk up the ancestry projecting F into each ancestor's subspace.
        j = i
        while model.parent[j] >= 0:
            F = Xups[j] @ F  # now in parent frame
            j = model.parent[j]
            _, _, S_j = joints[j]
            nvj = S_j.shape[1]
            if nvj:
                vo_j = model.v_offsets[j]
                blk = S_j.T @ F  # (nvj, nvi)
                M = M.at[vo_j : vo_j + nvj, vo_i : vo_i + nvi].set(blk)
                M = M.at[vo_i : vo_i + nvi, vo_j : vo_j + nvj].set(blk.T)

    # Reflected rotor inertia: gear_ratio^2 * rotor_inertia added to the
    # mass-matrix diagonal of each 1-dof joint's velocity (reference
    # multibody/tree/joint_actuator.h @ref reflected_inertia; the rotor's
    # spin kinetic energy 1/2 (G qdot)^2 I_r seen in joint space).
    refl = getattr(params, "reflected_inertia", None)
    if refl is not None:
        for i in range(nb):
            _, _, S_i = joints[i]
            if S_i.shape[1] == 1:
                vo_i = model.v_offsets[i]
                M = M.at[vo_i, vo_i].add(refl[i])
    return M


def forward_dynamics(
    model, params, q, v, tau_applied, external_forces_W=None
):
    """vdot = M(q)^{-1} (tau_applied - C(q, v)).

    The reference uses O(n) ABA (multibody_tree.h:1636); on TPU the dense
    CRBA + Cholesky path is faster at robot scale and batches cleanly.
    """
    M = mass_matrix(model, params, q)
    C = bias_forces(model, params, q, v, external_forces_W)
    rhs = tau_applied - C
    L = jax.scipy.linalg.cho_factor(M)
    return jax.scipy.linalg.cho_solve(L, rhs)


def kinetic_energy(model, params, q, v):
    Vs, _ = kin.body_spatial_velocities(model, params, q, v)
    ke = 0.0
    for i in range(model.num_bodies):
        I = _spatial_inertia_body(params, i)
        ke = ke + 0.5 * Vs[i] @ (I @ Vs[i])
    return ke


def potential_energy(model, params, q):
    R_WB, p_WB = kin.forward_kinematics(model, params, q)
    p_com_W = p_WB + jnp.einsum("bij,bj->bi", R_WB, params.com)
    return -jnp.sum(params.mass * (p_com_W @ params.gravity))


def total_energy(model, params, q, v):
    return kinetic_energy(model, params, q, v) + potential_energy(model, params, q)
