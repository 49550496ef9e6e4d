"""Force elements: springs, dampers and bushings as generalized forces.

Re-derivation of Drake's ForceElement family (reference:
multibody/tree/force_element.h and subclasses linear_spring_damper.h,
revolute_spring.h, prismatic_spring.h, linear_bushing_roll_pitch_yaw.h).

TPU-native design: instead of virtual `CalcAndAddForceContribution`
dispatch accumulating spatial forces, every element is expressed
*variationally* — a (possibly vector) deflection coordinate x(q) plus a
conjugate force law f = K x + D xdot, mapped to generalized forces by the
principle of virtual power:

    tau_v  =  - d/dv  [ f . xdot(q, v) ]        (xdot linear in v)

which JAX evaluates exactly with one jvp (for xdot) and one reverse-mode
grad over v.  This is mathematically identical to assembling J^T f with
J = dx/dq N(q), needs no hand-written Jacobians for any element family,
and stays correct for quaternion/floating joints where qdot != v.

The element *topology* (which bodies/joints) is static Python metadata —
loops unroll at trace time like the rest of the model — while all numeric
parameters live in a pytree (`ForceElementParams`) so they batch and
differentiate like any other input (e.g. for system identification of
stiffness coefficients).

Element families:
  - linear spring-damper between two body points
    (reference multibody/tree/linear_spring_damper.h:23-60; the force law
    f = k (l - l0) + d ldot along the line PQ, with the same
    soft-length guard near l = 0).
  - joint spring on any 1-dof joint: tau = -k (q - q0)
    (reference multibody/tree/revolute_spring.h, prismatic_spring.h).
  - linear bushing between frame F on body A and frame M on body C with
    diagonal RPY/translation stiffness and damping (reference
    multibody/tree/linear_bushing_roll_pitch_yaw.h:204-260).  The
    deflection coordinate is x = [rpy(R_FM); p_FM_F]; like the
    reference, the model is valid away from the pitch = +-90 deg
    gimbal singularity.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.math import rotations as rot
from drake_tpu.multibody.kinematics import forward_kinematics
from drake_tpu.multibody.model import MultibodyModel, MultibodyParams
from drake_tpu.utils.struct import pytree_dataclass


@dataclasses.dataclass(frozen=True)
class ForceElementSet:
    """Static topology of all force elements (hashable trace constant)."""

    spring_bodies: Tuple[Tuple[int, int], ...]  # (body_a, body_b) pairs
    joint_spring_joints: Tuple[int, ...]  # joint (== body) indices, 1-dof
    bushing_bodies: Tuple[Tuple[int, int], ...]  # (body_a, body_c) pairs
    door_hinge_joints: Tuple[int, ...] = ()  # 1-dof revolute joints


@pytree_dataclass
class ForceElementParams:
    """Traced numeric parameters, one leading axis per element."""

    # linear spring-dampers
    sd_p_AP: jnp.ndarray  # (ns, 3) attachment point on A, in A
    sd_p_BQ: jnp.ndarray  # (ns, 3) attachment point on B, in B
    sd_free_length: jnp.ndarray  # (ns,)
    sd_stiffness: jnp.ndarray  # (ns,)
    sd_damping: jnp.ndarray  # (ns,)
    # joint springs
    js_stiffness: jnp.ndarray  # (nj,)
    js_nominal: jnp.ndarray  # (nj,) nominal angle/position
    # bushings
    bu_X_AF_R: jnp.ndarray  # (nbu, 3, 3) frame F rotation in A
    bu_X_AF_p: jnp.ndarray  # (nbu, 3)
    bu_X_CM_R: jnp.ndarray  # (nbu, 3, 3) frame M rotation in C
    bu_X_CM_p: jnp.ndarray  # (nbu, 3)
    bu_k: jnp.ndarray  # (nbu, 6) diagonal stiffness [k_rpy; k_xyz]
    bu_d: jnp.ndarray  # (nbu, 6) diagonal damping [d_rpy; d_xyz]
    # door hinges (reference multibody/tree/door_hinge.h DoorHingeConfig):
    # columns [spring_zero_angle, spring_constant, dynamic_friction,
    # static_friction, viscous_friction, catch_width, catch_torque,
    # motion_threshold]
    dh_cfg: jnp.ndarray = None  # (ndh, 8)


class ForceElementBuilder:
    """Imperative builder mirroring MultibodyPlant's AddForceElement
    (reference multibody/plant/multibody_plant.h AddForceElement<...>)."""

    def __init__(self, model: MultibodyModel):
        self._model = model
        self._sd: List[Tuple[int, int, np.ndarray, np.ndarray, float, float,
                             float]] = []
        self._js: List[Tuple[int, float, float]] = []
        self._dh: List[Tuple[int, np.ndarray]] = []
        self._bu: List[Tuple[int, int, np.ndarray, np.ndarray, np.ndarray,
                             np.ndarray, np.ndarray, np.ndarray]] = []

    def add_linear_spring_damper(
        self, body_a: str, p_AP, body_b: str, p_BQ,
        free_length: float, stiffness: float, damping: float = 0.0,
    ) -> "ForceElementBuilder":
        self._sd.append((
            self._model.body_index(body_a), self._model.body_index(body_b),
            np.asarray(p_AP, np.float64), np.asarray(p_BQ, np.float64),
            float(free_length), float(stiffness), float(damping),
        ))
        return self

    def add_joint_spring(
        self, joint: str, nominal: float, stiffness: float
    ) -> "ForceElementBuilder":
        """Revolute/prismatic/screw spring: tau = -k (q - q0)."""
        i = self._model.joint_names.index(joint)
        from drake_tpu.multibody.model import _NV

        if _NV[self._model.joint_types[i]] != 1:
            raise ValueError(
                f"joint springs need a 1-dof joint; {joint} is "
                f"{self._model.joint_types[i]}")
        self._js.append((i, float(nominal), float(stiffness)))
        return self

    def add_door_hinge(
        self, joint: str, *,
        spring_zero_angle: float = 0.0,
        spring_constant: float = 1.5,
        dynamic_friction_torque: float = 3.0,
        static_friction_torque: float = 2.0,
        viscous_friction: float = 1.0,
        catch_width: float = 0.02,
        catch_torque: float = 15.0,
        motion_threshold: float = 0.001,
    ) -> "ForceElementBuilder":
        """DoorHinge (reference multibody/tree/door_hinge.h; defaults are
        the reference's dishwasher-door DoorHingeConfig): a "christmas
        tree" of empirical hinge torques — torsional spring toward
        spring_zero_angle, a tanh-doublet catch of width/torque
        (catch_width, catch_torque) near closed, and
        dynamic/static/viscous friction smoothed by tanh curves at
        motion_threshold.  catch_width and motion_threshold must be
        positive (the smooth curves divide by them; the reference's
        zero-value special cases are covered by catch_torque=0 /
        plain joint damping instead)."""
        i = self._model.joint_names.index(joint)
        if self._model.joint_types[i] != "revolute":
            raise ValueError(f"door hinges need a revolute joint; {joint} "
                             f"is {self._model.joint_types[i]}")
        if catch_width <= 0 or motion_threshold <= 0:
            raise ValueError("catch_width and motion_threshold must be > 0")
        self._dh.append((i, np.asarray([
            spring_zero_angle, spring_constant, dynamic_friction_torque,
            static_friction_torque, viscous_friction, catch_width,
            catch_torque, motion_threshold,
        ], np.float64)))
        return self

    def add_bushing(
        self, body_a: str, body_c: str, *,
        X_AF_rpy=(0, 0, 0), X_AF_xyz=(0, 0, 0),
        X_CM_rpy=(0, 0, 0), X_CM_xyz=(0, 0, 0),
        torque_stiffness=(0, 0, 0), torque_damping=(0, 0, 0),
        force_stiffness=(0, 0, 0), force_damping=(0, 0, 0),
    ) -> "ForceElementBuilder":
        R_AF = np.asarray(
            rot.rpy_to_rotation(jnp.asarray(np.asarray(X_AF_rpy, np.float64))))
        R_CM = np.asarray(
            rot.rpy_to_rotation(jnp.asarray(np.asarray(X_CM_rpy, np.float64))))
        self._bu.append((
            self._model.body_index(body_a), self._model.body_index(body_c),
            R_AF, np.asarray(X_AF_xyz, np.float64),
            R_CM, np.asarray(X_CM_xyz, np.float64),
            np.concatenate([np.asarray(torque_stiffness, np.float64),
                            np.asarray(force_stiffness, np.float64)]),
            np.concatenate([np.asarray(torque_damping, np.float64),
                            np.asarray(force_damping, np.float64)]),
        ))
        return self

    def build(self, dtype=jnp.float32):
        ns, nj, nbu = len(self._sd), len(self._js), len(self._bu)
        fe = ForceElementSet(
            spring_bodies=tuple((a, b) for a, b, *_ in self._sd),
            joint_spring_joints=tuple(i for i, _, _ in self._js),
            bushing_bodies=tuple((a, c) for a, c, *_ in self._bu),
            door_hinge_joints=tuple(i for i, _ in self._dh),
        )

        def stack(rows, shape):
            return (jnp.asarray(np.stack(rows), dtype) if rows
                    else jnp.zeros((0,) + shape, dtype))

        params = ForceElementParams(
            sd_p_AP=stack([r[2] for r in self._sd], (3,)),
            sd_p_BQ=stack([r[3] for r in self._sd], (3,)),
            sd_free_length=stack([r[4] for r in self._sd], ()),
            sd_stiffness=stack([r[5] for r in self._sd], ()),
            sd_damping=stack([r[6] for r in self._sd], ()),
            js_stiffness=stack([r[2] for r in self._js], ()),
            js_nominal=stack([r[1] for r in self._js], ()),
            bu_X_AF_R=stack([r[2] for r in self._bu], (3, 3)),
            bu_X_AF_p=stack([r[3] for r in self._bu], (3,)),
            bu_X_CM_R=stack([r[4] for r in self._bu], (3, 3)),
            bu_X_CM_p=stack([r[5] for r in self._bu], (3,)),
            bu_k=stack([r[6] for r in self._bu], (6,)),
            bu_d=stack([r[7] for r in self._bu], (6,)),
            dh_cfg=stack([cfg for _, cfg in self._dh], (8,)),
        )
        return fe, params


def _soft_norm(d, eps):
    return jnp.sqrt(jnp.sum(d * d) + eps * eps)


def generalized_forces(
    model: MultibodyModel,
    params: MultibodyParams,
    fe: ForceElementSet,
    fp: ForceElementParams,
    q: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Total generalized force (nv,) of all force elements at (q, v).

    Each element contributes  tau = -grad_v [ f(x, xdot) . xdot(q, v) ]
    with x its deflection coordinate and f its conjugate force law —
    exact J^T f without hand-written Jacobians (see module docstring).
    """
    from drake_tpu.multibody.plant import qdot_from_v

    nv = model.num_velocities
    tau = jnp.zeros(nv, q.dtype)
    eps = jnp.asarray(1e-7 if q.dtype == jnp.float32 else 1e-12, q.dtype)

    def add_conjugate(tau, coords_fn, force_fn):
        """tau += -J_v^T f with J_v = d xdot / d v, via one jvp + one vjp.

        Passing f as the *cotangent* of the (linear-in-v) map v -> xdot
        gives exactly J_v^T f while keeping tau fully differentiable in
        (q, v) — no stop_gradient, so linearizations (iLQR, LQR) see the
        true damping contribution d tau / d v.
        """
        qdot = qdot_from_v(model, params, q, v)
        x, xdot = jax.jvp(coords_fn, (q,), (qdot,))
        f = force_fn(x, xdot)

        def xdot_of_v(vv):
            return jax.jvp(
                coords_fn, (q,), (qdot_from_v(model, params, q, vv),))[1]

        _, pullback = jax.vjp(xdot_of_v, v)
        return tau - pullback(f)[0]

    # --- linear spring-dampers ---------------------------------------
    for e, (a, b) in enumerate(fe.spring_bodies):

        def length(qq, e=e, a=a, b=b):
            R_WB, p_WB = forward_kinematics(model, params, qq)
            p_WP = p_WB[a] + R_WB[a] @ fp.sd_p_AP[e]
            p_WQ = p_WB[b] + R_WB[b] @ fp.sd_p_BQ[e]
            # soft norm: finite force and gradient at l -> 0 (reference
            # linear_spring_damper.cc uses the same epsilon-regularized
            # length to avoid the singularity).
            return _soft_norm(p_WQ - p_WP, eps)

        tau = add_conjugate(
            tau, length,
            lambda l, ldot, e=e: (fp.sd_stiffness[e] *
                                  (l - fp.sd_free_length[e]) +
                                  fp.sd_damping[e] * ldot))

    # --- joint springs (direct: coordinate IS a velocity coordinate) --
    for e, i in enumerate(fe.joint_spring_joints):
        qo, vo = model.q_offsets[i], model.v_offsets[i]
        tau = tau.at[vo].add(
            -fp.js_stiffness[e] * (q[qo] - fp.js_nominal[e]))

    # --- door hinges (reference door_hinge.cc CalcHingeTorque) ---------
    for e, i in enumerate(fe.door_hinge_joints):
        qo, vo = model.q_offsets[i], model.v_offsets[i]
        (q0, k_ts, k_df, k_sf, k_vf, w, k_c, vt) = [
            fp.dh_cfg[e, j] for j in range(8)
        ]
        angle, rate = q[qo], v[vo]
        # Friction: tanh curve s at the motion threshold, its doublet for
        # the static-friction bump (door_hinge.cc:93-103).
        s_v = jnp.tanh(rate / vt)
        tau_f = -(k_df * s_v + k_sf * 2.0 * s_v * (1.0 - s_v * s_v)
                  + k_vf * rate)
        # Spring + catch: doublet of width catch_width centered at w/2
        # (door_hinge.cc:107-118).
        c = w / 2.0
        s_q = jnp.tanh((angle - c) / c)
        tau_s = (k_c * 2.0 * s_q * (1.0 - s_q * s_q)
                 - k_ts * (angle - q0))
        tau = tau.at[vo].add(tau_f + tau_s)

    # --- bushings ------------------------------------------------------
    for e, (a, c) in enumerate(fe.bushing_bodies):

        def deflection(qq, e=e, a=a, c=c):
            R_WB, p_WB = forward_kinematics(model, params, qq)
            R_WF = R_WB[a] @ fp.bu_X_AF_R[e]
            p_WF = p_WB[a] + R_WB[a] @ fp.bu_X_AF_p[e]
            R_WM = R_WB[c] @ fp.bu_X_CM_R[e]
            p_WM = p_WB[c] + R_WB[c] @ fp.bu_X_CM_p[e]
            R_FM = R_WF.T @ R_WM
            p_FM_F = R_WF.T @ (p_WM - p_WF)
            return jnp.concatenate([rot.rotation_to_rpy(R_FM), p_FM_F])

        tau = add_conjugate(
            tau, deflection,
            lambda x, xdot, e=e: fp.bu_k[e] * x + fp.bu_d[e] * xdot)

    return tau


def spring_potential_energy(
    model: MultibodyModel,
    params: MultibodyParams,
    fe: ForceElementSet,
    fp: ForceElementParams,
    q: jnp.ndarray,
) -> jnp.ndarray:
    """Elastic energy of all force elements (damping stores none).

    Mirrors ForceElement::CalcPotentialEnergy (reference
    multibody/tree/force_element.h:76) so energy-balance tests can
    include force elements.
    """
    eps = jnp.asarray(1e-7 if q.dtype == jnp.float32 else 1e-12, q.dtype)
    U = jnp.zeros((), q.dtype)
    if fe.spring_bodies or fe.bushing_bodies:
        R_WB, p_WB = forward_kinematics(model, params, q)
    for e, (a, b) in enumerate(fe.spring_bodies):
        p_WP = p_WB[a] + R_WB[a] @ fp.sd_p_AP[e]
        p_WQ = p_WB[b] + R_WB[b] @ fp.sd_p_BQ[e]
        stretch = _soft_norm(p_WQ - p_WP, eps) - fp.sd_free_length[e]
        U = U + 0.5 * fp.sd_stiffness[e] * stretch**2
    for e, i in enumerate(fe.joint_spring_joints):
        dq = q[model.q_offsets[i]] - fp.js_nominal[e]
        U = U + 0.5 * fp.js_stiffness[e] * dq**2
    for e, i in enumerate(fe.door_hinge_joints):
        q0, k_ts = fp.dh_cfg[e, 0], fp.dh_cfg[e, 1]
        w, k_c = fp.dh_cfg[e, 5], fp.dh_cfg[e, 6]
        angle = q[model.q_offsets[i]]
        c = w / 2.0
        # integral of the catch doublet: U_c = -k_c * c * s((q-c)/c)^2
        # (d/dq [c s^2] = 2 s (1-s^2) = doublet); conservative parts only
        # (reference CalcHingeConservativePower uses the spring torque).
        U = U + 0.5 * k_ts * (angle - q0) ** 2
        U = U - k_c * c * jnp.tanh((angle - c) / c) ** 2
    for e, (a, c) in enumerate(fe.bushing_bodies):
        R_WF = R_WB[a] @ fp.bu_X_AF_R[e]
        p_WF = p_WB[a] + R_WB[a] @ fp.bu_X_AF_p[e]
        R_WM = R_WB[c] @ fp.bu_X_CM_R[e]
        p_WM = p_WB[c] + R_WB[c] @ fp.bu_X_CM_p[e]
        x = jnp.concatenate([
            rot.rotation_to_rpy(R_WF.T @ R_WM),
            R_WF.T @ (p_WM - p_WF),
        ])
        U = U + 0.5 * jnp.dot(fp.bu_k[e] * x, x)
    return U
