"""Atlas-style humanoid drop: passive multibody dynamics under SAP contact.

Reference parity: examples/atlas/atlas_run_dynamics.cc — load the Atlas
humanoid, drop it onto the ground plane, and run the discrete SAP plant,
reporting the realtime rate.  The reference's point is a stress test: a
~30-dof floating-base tree with many simultaneous contacts, straight
through the default contact solver.

The reference loads an URDF with meshes; model files are assets, so here an
equivalent humanoid is built procedurally with the same topology scale:
floating pelvis, torso, 2 legs (universal hip + knee + ankle), 2 arms
(universal shoulder + elbow) = 13 bodies / 24 dofs (+4 massless universal
intermediates), with sphere collision pads on feet, knees, hands, head and
pelvis — 9 contact geometries against the ground half-space.

Checks: the robot falls at gravity until first touch, crumples, dissipates
all kinetic energy, and settles with every body above ground (no
penetration beyond the contact layer); prints steps/s like the reference's
realtime-rate report.

Run: python examples/atlas_drop.py [--cpu]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--f32", action="store_true", help="TPU mode")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
if not args.f32:
    jax.config.update("jax_enable_x64", True)

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.kinematics import forward_kinematics
from drake_tpu.multibody.model import ModelBuilder

MU = 0.8


def build(dtype):
    b = ModelBuilder()
    ey = np.eye(3)
    b.add_body("pelvis", parent=None, joint_type="floating", mass=10.0,
               inertia_com=ey * 0.1)
    b.add_body("torso", parent="pelvis", joint_type="revolute", mass=20.0,
               axis=(0, 1, 0), com=(0, 0, 0.25), inertia_com=ey * 0.5,
               X_PJ_xyz=(0, 0, 0.1), damping=1.0)
    b.add_body("head", parent="torso", joint_type="revolute", mass=3.0,
               axis=(0, 1, 0), com=(0, 0, 0.1), inertia_com=ey * 0.02,
               X_PJ_xyz=(0, 0, 0.5), damping=0.5)
    for side, sy in (("l", 1.0), ("r", -1.0)):
        b.add_body(f"{side}_thigh", parent="pelvis", joint_type="universal",
                   mass=6.0, axis=(1, 0, 0), axis2=(0, 1, 0),
                   com=(0, 0, -0.2), inertia_com=ey * 0.08,
                   X_PJ_xyz=(0, sy * 0.12, -0.05), damping=1.0)
        b.add_body(f"{side}_shin", parent=f"{side}_thigh",
                   joint_type="revolute", mass=4.0, axis=(0, 1, 0),
                   com=(0, 0, -0.2), inertia_com=ey * 0.05,
                   X_PJ_xyz=(0, 0, -0.4), damping=1.0)
        b.add_body(f"{side}_foot", parent=f"{side}_shin",
                   joint_type="revolute", mass=1.5, axis=(0, 1, 0),
                   com=(0.05, 0, -0.03), inertia_com=ey * 0.01,
                   X_PJ_xyz=(0, 0, -0.4), damping=0.5)
        b.add_body(f"{side}_uarm", parent="torso", joint_type="universal",
                   mass=3.0, axis=(1, 0, 0), axis2=(0, 1, 0),
                   com=(0, 0, -0.15), inertia_com=ey * 0.03,
                   X_PJ_xyz=(0, sy * 0.25, 0.45), damping=1.0)
        b.add_body(f"{side}_larm", parent=f"{side}_uarm",
                   joint_type="revolute", mass=2.0, axis=(0, 1, 0),
                   com=(0, 0, -0.15), inertia_com=ey * 0.02,
                   X_PJ_xyz=(0, 0, -0.3), damping=0.5)
    model, params = b.build(dtype)

    def pad(name, body, p, r=0.06):
        return CollisionGeometry(name=name, body=model.body_index(body),
                                 shape=sh.Sphere(r), p_BG=np.asarray(p, float),
                                 friction=MU, stiffness=1e6, dissipation=0.2)

    geoms = [
        pad("pelvis_pad", "pelvis", (0, 0, 0), 0.12),
        pad("head_pad", "head", (0, 0, 0.1), 0.1),
        pad("l_knee", "l_shin", (0, 0, 0)), pad("r_knee", "r_shin", (0, 0, 0)),
        pad("l_foot_pad", "l_foot", (0.05, 0, -0.03), 0.05),
        pad("r_foot_pad", "r_foot", (0.05, 0, -0.03), 0.05),
        pad("l_hand", "l_larm", (0, 0, -0.3), 0.05),
        pad("r_hand", "r_larm", (0, 0, -0.3), 0.05),
        pad("torso_pad", "torso", (0, 0, 0.25), 0.15),
        CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                          friction=MU, stiffness=1e10, dissipation=0.2),
    ]
    return model, params, CollisionScene.build(geoms)


def main():
    dtype = jnp.float32 if args.f32 else jnp.float64
    h, n = 1e-3, 6000
    model, params, scene = build(dtype)
    nv = model.num_velocities
    print(f"humanoid: {model.num_bodies} bodies, {nv} dofs, "
          f"{len(scene.pairs) if hasattr(scene, 'pairs') else 9} contact pads")
    dsys = cplant.make_discrete_system(model, params, scene, h,
                                       actuated_joints=[])  # passive drop

    @partial(jax.jit, static_argnums=1)
    def rollout(x, steps):
        def body(xx, _):
            xx = dsys.g(params, xx, jnp.zeros(0, dtype))
            return xx, (xx[6], jnp.sum(xx[model.num_positions:] ** 2))

        return jax.lax.scan(body, x, None, length=steps)

    x = model.default_state(dtype)
    x = x.at[6].set(1.2)  # pelvis 1.2 m up, slight tilt via knee bend
    iq = model.q_offsets
    for name, val in (("l_shin", 0.3), ("r_shin", 0.3), ("torso", 0.2)):
        x = x.at[iq[model.body_index(name)]].set(val)

    t0 = time.perf_counter()
    x_final, (pz, v2) = rollout(x, n)
    v2 = np.asarray(v2)
    wall = time.perf_counter() - t0
    pz = np.asarray(pz)

    # Ballistic check before first touch (lowest pad starts ~0.5 m down).
    t = (np.arange(n) + 1) * h
    k = 200  # well within flight
    ball_err = float(abs(pz[k] - (1.2 - 0.5 * 9.81 * t[k] ** 2)))

    v_end = float(np.sqrt(v2[-1]))
    print(f"drop: pelvis 1.2 m -> {pz[-1]:.3f} m; ballistic |err| at "
          f"t=0.2s: {ball_err:.1e} m; final |v| = {v_end:.2e}")

    # No body below ground: all pad centers above their radius - tol.
    # No pad below ground: each pad CENTER must sit at least its radius
    # above the plane, minus a small contact-layer penetration slack.
    qf = x_final[: model.num_positions]
    R_WB, p_WB = forward_kinematics(model, params, qf)
    pads = [("pelvis", (0, 0, 0), 0.12), ("head", (0, 0, 0.1), 0.1),
            ("l_shin", (0, 0, 0), 0.06), ("r_shin", (0, 0, 0), 0.06),
            ("l_foot", (0.05, 0, -0.03), 0.05),
            ("r_foot", (0.05, 0, -0.03), 0.05),
            ("l_larm", (0, 0, -0.3), 0.05), ("r_larm", (0, 0, -0.3), 0.05),
            ("torso", (0, 0, 0.25), 0.15)]
    worst = min(
        float((p_WB[i] + R_WB[i] @ jnp.asarray(p, qf.dtype))[2]) - r
        for name, p, r in pads
        for i in [model.body_index(name)]
    )
    print(f"settled: worst pad clearance = {worst*1e3:.1f} mm "
          f"(>= -2 mm contact layer); {n / wall:.0f} steps/s "
          f"({n / wall * h:.2f}x realtime)")

    ok = ball_err < 2e-3 and v_end < 0.05 and worst > -2e-3
    print("ATLAS DROP", "SUCCESS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
