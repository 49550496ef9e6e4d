"""Multibody model: static topology + traced inertial/joint parameters.

Re-derivation of Drake's MultibodyTree data model (reference:
multibody/tree/multibody_tree.h, body.h, revolute_joint.h etc.) for JAX.
The topology (parent array, joint types, dof layout) is *static* Python
metadata — tree loops unroll at trace time, which is exactly what the TPU
wants for robots of Drake's scale (n <= ~20 dofs).  All numeric parameters
(inertias, joint frames, axes, damping, gravity) live in a params pytree so
they batch/differentiate like any other input.

Joint model (Featherstone convention):
    X_{P,B}(q) = X_PJ . X_J(q)
with X_PJ the fixed joint-parent frame and X_J the joint motion.  Supported
joint types: revolute, prismatic, weld (fixed), floating (quaternion).
The motion subspace S is expressed in the child body frame.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from drake_tpu.math import rotations as rot
from drake_tpu.utils.struct import pytree_dataclass

REVOLUTE = "revolute"
PRISMATIC = "prismatic"
WELD = "weld"
FLOATING = "floating"  # quaternion-floating: q = [qw,qx,qy,qz, x,y,z], v = [w_B; v_B]
BALL = "ball"  # ball/spherical: q = quaternion [w,x,y,z], v = w_B (3)
PLANAR = "planar"  # q = [x, y, theta] in joint frame; v = [vx_B, vy_B, wz]
SCREW = "screw"  # q = theta about/along axis; translation = pitch*theta/(2 pi)

_NQ = {REVOLUTE: 1, PRISMATIC: 1, WELD: 0, FLOATING: 7, BALL: 4, PLANAR: 3,
       SCREW: 1}
_NV = {REVOLUTE: 1, PRISMATIC: 1, WELD: 0, FLOATING: 6, BALL: 3, PLANAR: 3,
       SCREW: 1}


@pytree_dataclass
class MultibodyParams:
    """Traced numeric parameters, one leading axis per body."""

    mass: jnp.ndarray  # (nb,)
    com: jnp.ndarray  # (nb, 3) p_BoBcm_B
    inertia_com: jnp.ndarray  # (nb, 3, 3) rotational inertia about com, in B
    X_PJ_R: jnp.ndarray  # (nb, 3, 3) joint frame rotation in parent
    X_PJ_p: jnp.ndarray  # (nb, 3) joint frame origin in parent
    axis: jnp.ndarray  # (nb, 3) joint axis (child frame)
    damping: jnp.ndarray  # (nb,) viscous joint damping (0 for weld/floating)
    gravity: jnp.ndarray  # (3,) gravity vector in world (default [0,0,-9.81])
    # (nb,) screw pitch: axial translation per full revolution (reference
    # multibody/tree/screw_joint.h screw_pitch semantics); 0 for other joints.
    screw_pitch: jnp.ndarray
    # (nb,) REFLECTED rotor inertia per 1-dof joint: gear_ratio^2 *
    # rotor_inertia (reference multibody/tree/joint_actuator.h
    # @ref reflected_inertia) — added to the mass-matrix diagonal of the
    # joint's velocity.  None (pre-actuator models) reads as zeros.
    reflected_inertia: Optional[jnp.ndarray] = None


@dataclasses.dataclass(frozen=True)
class MultibodyModel:
    """Static topology.  Bodies are indexed 0..nb-1 in topological order
    (parent[i] < i); parent[i] == -1 means the joint connects to world."""

    parent: Tuple[int, ...]
    joint_types: Tuple[str, ...]
    body_names: Tuple[str, ...]
    joint_names: Tuple[str, ...]

    @property
    def num_bodies(self) -> int:
        return len(self.parent)

    @property
    def q_offsets(self) -> Tuple[int, ...]:
        off, acc = [], 0
        for jt in self.joint_types:
            off.append(acc)
            acc += _NQ[jt]
        return tuple(off)

    @property
    def v_offsets(self) -> Tuple[int, ...]:
        off, acc = [], 0
        for jt in self.joint_types:
            off.append(acc)
            acc += _NV[jt]
        return tuple(off)

    @property
    def num_positions(self) -> int:
        return sum(_NQ[jt] for jt in self.joint_types)

    @property
    def num_velocities(self) -> int:
        return sum(_NV[jt] for jt in self.joint_types)

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)

    def default_state(self, dtype=jnp.float32):
        q = np.zeros(self.num_positions)
        for i, jt in enumerate(self.joint_types):
            if jt in (FLOATING, BALL):
                q[self.q_offsets[i]] = 1.0  # identity quaternion w component
        return jnp.asarray(
            np.concatenate([q, np.zeros(self.num_velocities)]), dtype
        )


class ModelBuilder:
    """Imperative builder mirroring MultibodyPlant's AddRigidBody/AddJoint API
    (reference: multibody/plant/multibody_plant.h AddRigidBody, AddJoint)."""

    def __init__(self, gravity=(0.0, 0.0, -9.81)):
        self._parent: List[int] = []
        self._types: List[str] = []
        self._body_names: List[str] = []
        self._joint_names: List[str] = []
        self._mass: List[float] = []
        self._com: List[np.ndarray] = []
        self._inertia: List[np.ndarray] = []
        self._X_PJ_R: List[np.ndarray] = []
        self._X_PJ_p: List[np.ndarray] = []
        self._axis: List[np.ndarray] = []
        self._damping: List[float] = []
        self._reflected: List[float] = []
        self._screw_pitch: List[float] = []
        self._gravity = np.asarray(gravity, dtype=np.float64)

    def add_body(
        self,
        name: str,
        *,
        parent: Optional[str],
        joint_type: str,
        mass: float,
        com: Sequence[float] = (0, 0, 0),
        inertia_com: Optional[np.ndarray] = None,
        X_PJ_rpy: Sequence[float] = (0, 0, 0),
        X_PJ_xyz: Sequence[float] = (0, 0, 0),
        axis: Sequence[float] = (0, 0, 1),
        damping: float = 0.0,
        joint_name: Optional[str] = None,
        screw_pitch: float = 0.0,
        axis2: Sequence[float] = (0, 1, 0),
        rotor_inertia: float = 0.0,
        gear_ratio: float = 1.0,
    ) -> int:
        """Add a body connected to `parent` (None = world) by a joint.

        ``joint_type="universal"`` (reference multibody/tree/
        universal_joint.h): rotation about ``axis`` in the parent frame then
        ``axis2`` in the child — expanded here into TWO revolute joints with
        a massless intermediate body (``<name>__U``), which keeps every
        motion subspace constant in its child frame (the assumption of the
        body-frame RNEA/CRBA recursions); the composite inertia the first
        joint sees includes the real child, so the mass matrix stays SPD.
        q = [theta1, theta2], v = [theta1dot, theta2dot] — same layout as
        the reference.
        """
        if joint_type == "universal":
            inter = self.add_body(
                f"{name}__U",
                parent=parent,
                joint_type=REVOLUTE,
                mass=0.0,
                X_PJ_rpy=X_PJ_rpy,
                X_PJ_xyz=X_PJ_xyz,
                axis=axis,
                damping=damping,
                joint_name=(joint_name or f"{name}_joint") + "_1",
            )
            return self.add_body(
                name,
                parent=f"{name}__U",
                joint_type=REVOLUTE,
                mass=mass,
                com=com,
                inertia_com=inertia_com,
                axis=axis2,
                damping=damping,
                joint_name=(joint_name or f"{name}_joint") + "_2",
                rotor_inertia=rotor_inertia,
                gear_ratio=gear_ratio,
            )
        if parent is None:
            pidx = -1
        else:
            pidx = self._body_names.index(parent)
        idx = len(self._body_names)
        self._parent.append(pidx)
        self._types.append(joint_type)
        self._body_names.append(name)
        self._joint_names.append(joint_name or f"{name}_joint")
        self._mass.append(float(mass))
        self._com.append(np.asarray(com, dtype=np.float64))
        if inertia_com is None:
            inertia_com = np.zeros((3, 3))
        self._inertia.append(np.asarray(inertia_com, dtype=np.float64))
        rpy = np.asarray(X_PJ_rpy, dtype=np.float64)
        self._X_PJ_R.append(np.asarray(rot.rpy_to_rotation(jnp.asarray(rpy))))
        self._X_PJ_p.append(np.asarray(X_PJ_xyz, dtype=np.float64))
        a = np.asarray(axis, dtype=np.float64)
        n = np.linalg.norm(a)
        self._axis.append(a / n if n > 0 else a)
        self._damping.append(float(damping))
        self._screw_pitch.append(float(screw_pitch))
        self._reflected.append(float(gear_ratio) ** 2 * float(rotor_inertia))
        return idx

    def build(self, dtype=jnp.float32) -> Tuple[MultibodyModel, MultibodyParams]:
        model = MultibodyModel(
            parent=tuple(self._parent),
            joint_types=tuple(self._types),
            body_names=tuple(self._body_names),
            joint_names=tuple(self._joint_names),
        )
        params = MultibodyParams(
            mass=jnp.asarray(np.array(self._mass), dtype),
            com=jnp.asarray(np.stack(self._com), dtype),
            inertia_com=jnp.asarray(np.stack(self._inertia), dtype),
            X_PJ_R=jnp.asarray(np.stack(self._X_PJ_R), dtype),
            X_PJ_p=jnp.asarray(np.stack(self._X_PJ_p), dtype),
            axis=jnp.asarray(np.stack(self._axis), dtype),
            damping=jnp.asarray(np.array(self._damping), dtype),
            gravity=jnp.asarray(self._gravity, dtype),
            screw_pitch=jnp.asarray(np.array(self._screw_pitch), dtype),
            reflected_inertia=jnp.asarray(np.array(self._reflected), dtype),
        )
        return model, params
