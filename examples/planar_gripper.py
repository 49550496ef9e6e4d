"""Planar gripper: fingers reorient a brick through contact.

Reference parity: examples/planar_gripper/planar_gripper_simulation.cc —
2-dof planar fingers, position-controlled, squeeze and reorient a planar
brick purely through frictional contact (keyframe postures streamed to an
inverse-dynamics position controller).  Here the same mechanism is built
in the horizontal world x-y plane (so gravity is orthogonal to every
planar motion — the reference's zero-gravity brick tests), the fingers
are driven by SAP's effort-limited implicit PD servos (the
sap_pd_controller_constraint role, as the reference's position controller),
and the keyframes are planar 2-link IK solutions interpolated in joint
space.  Success = the brick rotates by the commanded couple while staying
grasped.

Mechanism: two 2-link fingers with spherical fingertips approach the
brick's +y/-y faces, press (PD targets a few mm inside the face), then
sweep tangentially in opposite directions — the friction couple rotates
the brick clockwise.

Run: python examples/planar_gripper.py [--cpu] [--f32]
"""

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--f32", action="store_true", help="TPU mode")
parser.add_argument("--steps", type=int, default=800)
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
if not args.f32:
    jax.config.update("jax_enable_x64", True)

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import ModelBuilder

L1, L2 = 0.16, 0.16          # finger link lengths
TIP_R = 0.015                # fingertip sphere radius
BRICK = (0.10, 0.10, 0.04)   # brick box extents (x, y, z)
BASE_Y = 0.28                # finger shoulder bases at (0, +-BASE_Y)
MU = 1.0
PRESS = 0.005                # commanded press depth into the face


def ik_2link(base_xy, target_xy, elbow_sign):
    """Planar 2-link IK (joints about world z, links along local +x)."""
    r = np.asarray(target_xy, float) - np.asarray(base_xy, float)
    d2 = float(r @ r)
    c2 = np.clip((d2 - L1**2 - L2**2) / (2 * L1 * L2), -1.0, 1.0)
    q2 = elbow_sign * np.arccos(c2)
    q1 = np.arctan2(r[1], r[0]) - np.arctan2(
        L2 * np.sin(q2), L1 + L2 * np.cos(q2)
    )
    return np.asarray([q1, q2])


def build(dtype):
    b = ModelBuilder()
    rod1 = np.diag([1e-5, 1e-4, 1e-4])
    for fi, by in ((0, BASE_Y), (1, -BASE_Y)):
        b.add_body(f"f{fi}_link1", parent=None, joint_type="revolute",
                   mass=0.05, com=(L1 / 2, 0, 0), inertia_com=rod1,
                   axis=(0, 0, 1), joint_name=f"f{fi}_shoulder",
                   X_PJ_xyz=(0.0, by, 0.0), damping=0.05)
        b.add_body(f"f{fi}_link2", parent=f"f{fi}_link1",
                   joint_type="revolute", mass=0.05, com=(L2 / 2, 0, 0),
                   inertia_com=rod1, axis=(0, 0, 1),
                   joint_name=f"f{fi}_elbow", X_PJ_xyz=(L1, 0.0, 0.0),
                   damping=0.05)
    b.add_body("brick", parent=None, joint_type="planar", mass=0.3,
               inertia_com=np.diag([5e-4, 5e-4, 5e-4]),
               joint_name="brick_planar")
    model, params = b.build(dtype)
    geoms = [
        CollisionGeometry(
            name=f"f{fi}_tip", body=model.body_index(f"f{fi}_link2"),
            shape=sh.Sphere(TIP_R), p_BG=np.asarray([L2, 0.0, 0.0]),
            friction=MU, stiffness=2e4,
        )
        for fi in (0, 1)
    ] + [
        CollisionGeometry(name="brick", body=model.body_index("brick"),
                          shape=sh.Box(BRICK), friction=MU, stiffness=2e4),
    ]
    return model, params, CollisionScene.build(geoms)


def keyframe_trajectory(n, h):
    """Desired joint positions (n, 4): reach -> press -> sweep -> hold."""
    face = BRICK[1] / 2  # +-0.05 contact faces
    # (time_s, top tip target, bottom tip target)
    keys = [
        (0.00, (0.0, face + TIP_R + 0.03), (0.0, -face - TIP_R - 0.03)),
        (0.30, (0.0, face + TIP_R + 0.002), (0.0, -face - TIP_R - 0.002)),
        (0.60, (0.0, face + TIP_R - PRESS), (0.0, -face - TIP_R + PRESS)),
        (1.40, (0.05, face + TIP_R - PRESS), (-0.05, -face - TIP_R + PRESS)),
        (1.60, (0.05, face + TIP_R - PRESS), (-0.05, -face - TIP_R + PRESS)),
    ]
    q_keys = []
    for _, top, bot in keys:
        q_top = ik_2link((0.0, BASE_Y), top, elbow_sign=+1.0)
        q_bot = ik_2link((0.0, -BASE_Y), bot, elbow_sign=+1.0)
        q_keys.append(np.concatenate([q_top, q_bot]))
    q_keys = np.asarray(q_keys)
    times = np.asarray([k[0] for k in keys])
    t = (np.arange(n) + 1) * h
    out = np.empty((n, 4))
    for j in range(4):
        out[:, j] = np.interp(t, times, q_keys[:, j])
    return out


def main():
    dtype = jnp.float32 if args.f32 else jnp.float64
    h = 2e-3
    n = args.steps
    model, params, scene = build(dtype)
    pd = [(name, 50.0, 5.0, 8.0)
          for name in ("f0_shoulder", "f0_elbow", "f1_shoulder", "f1_elbow")]
    dsys = cplant.make_discrete_system(
        model, params, scene, h, actuated_joints=[], pd_joints=pd
    )
    iq_brick = model.q_offsets[model.body_index("brick")]

    q_des = jnp.asarray(keyframe_trajectory(n, h), dtype)
    x = model.default_state(dtype)
    # Start fingers at their first keyframe posture (zero transient).
    x = x.at[0:4].set(q_des[0])

    @partial(jax.jit, static_argnums=2)
    def rollout(x, q_des, steps):
        def body(xx, u):
            xx = dsys.g(params, xx, u)
            return xx, xx[iq_brick : iq_brick + 3]

        return jax.lax.scan(body, x, q_des, length=steps)

    _, brick = rollout(x, q_des, n)
    brick = np.asarray(brick)
    theta = brick[-1, 2]
    drift = float(np.hypot(brick[-1, 0], brick[-1, 1]))
    print(f"brick rotation: {np.degrees(theta):+.1f} deg "
          f"(target: clockwise/negative), center drift {drift * 1e3:.1f} mm")
    # The friction couple (top tip sweeps +x on the +y face, bottom tip -x
    # on the -y face) rotates the brick clockwise: theta < 0.
    ok = theta < -0.15 and drift < 0.04
    print("PLANAR-GRIPPER", "SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
