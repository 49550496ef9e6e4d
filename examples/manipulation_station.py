"""Manipulation station: iiwa + WSG gripper pick-and-lift over the driver
stack.

Reference examples/manipulation_station/ (manipulation_station.cc: the
iiwa-14 + Schunk WSG + manipulands diagram with LCM-driven teleop) — here
the full station is ONE SAP plant (arm + two prismatic fingers + free box,
implicit effort-limited PD on all servo joints, the
sap_pd_controller_constraint role), and the command path runs over the
native pub/sub transport through the manipulation driver stack
(IiwaCommandSender -> IiwaCommandReceiver, WsgCommandSender ->
WsgCommandReceiver), exactly the reference's LCM wiring.

Script: differential IK descends the gripper over the box, the fingers
close on it, and the arm lifts.  Success = the box leaves the table and
tracks the gripper upward (friction grasp through SAP contact).

Run:  python examples/manipulation_station.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from drake_tpu.contact import plant as cplant
    from drake_tpu.contact import sap
    from drake_tpu.geometry import shapes as sh
    from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
    from drake_tpu.io.pubsub import PubSub
    from drake_tpu.manipulation import iiwa_driver, wsg_driver
    from drake_tpu.models import iiwa
    from drake_tpu.multibody import ik
    from drake_tpu.multibody.model import (
        FLOATING,
        PRISMATIC,
        ModelBuilder,
        REVOLUTE,
        WELD,
    )

    dtype = jnp.float64 if args.cpu else jnp.float32

    # ---- build the station plant: arm + fingers + box -------------------
    from drake_tpu.models.iiwa import _LINKS

    b = ModelBuilder()
    for name, parent, rpy, xyz, mass, com, (ixx, iyy, izz), jt in _LINKS:
        b.add_body(
            name, parent=parent, joint_type=jt, mass=mass, com=com,
            inertia_com=np.diag([ixx, iyy, izz]), X_PJ_rpy=rpy,
            X_PJ_xyz=xyz, axis=(0, 0, 1),
            damping=0.5 if jt == REVOLUTE else 0.0,
            joint_name=f"iiwa_joint_{name[-1]}" if jt == REVOLUTE else None,
        )
    # WSG-role fingers: prismatic along link7 y, pads hanging 0.14 m below
    # the flange.  Finger q > 0 = open (symmetric).
    for fname, sign in (("finger_left", 1.0), ("finger_right", -1.0)):
        b.add_body(
            fname, parent="link7", joint_type=PRISMATIC, mass=0.1,
            com=(0, 0, 0.07), inertia_com=np.eye(3) * 1e-4,
            X_PJ_xyz=(0, 0, 0.05), axis=(0, sign, 0), damping=2.0,
            joint_name=f"{fname}_joint",
        )
    b.add_body(
        "box", parent=None, joint_type=FLOATING, mass=0.15,
        com=(0, 0, 0), inertia_com=np.eye(3) * 0.15 * (0.04**2) / 6,
    )
    model, params = b.build(dtype)
    nq, nv = model.num_positions, model.num_velocities

    side = 0.045
    mu = 1.0
    pad = dict(friction=mu, stiffness=2e5, dissipation=0.5)
    geoms = [
        CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                          friction=mu, stiffness=1e12),
        CollisionGeometry(name="pad_l", body=model.body_index("finger_left"),
                          shape=sh.Sphere(0.012), p_BG=(0, 0, 0.14), **pad),
        CollisionGeometry(name="pad_r", body=model.body_index("finger_right"),
                          shape=sh.Sphere(0.012), p_BG=(0, 0, 0.14), **pad),
        CollisionGeometry(name="box", body=model.body_index("box"),
                          shape=sh.Box((side, side, side)), **pad),
    ]
    scene = CollisionScene.build(geoms, model=model)

    # ---- gripper-site kinematics -----------------------------------------
    q_home = iiwa.home_position(dtype)
    ee = model.body_index("link7")
    grasp_offset = jnp.asarray([0, 0, 0.19], dtype)  # flange -> pad midpoint

    def station_q(q_arm, w, box_pose):
        return jnp.concatenate(
            [q_arm, jnp.asarray([w / 2, w / 2], dtype), box_pose]
        )

    q_probe = station_q(q_home, 0.08,
                        jnp.asarray([1, 0, 0, 0, 0.6, 0, side / 2], dtype))
    p_grip0 = ik.frame_position(model, params, q_probe, ee, grasp_offset)
    # place the box exactly under the home grip point
    box_xy = np.asarray(p_grip0[:2])
    box_pose0 = jnp.asarray(
        [1, 0, 0, 0, box_xy[0], box_xy[1], side / 2], dtype)
    print(f"grip point at home: {np.asarray(p_grip0).round(3)}; "
          f"box at ({box_xy[0]:.3f}, {box_xy[1]:.3f}, {side/2:.3f})")

    # ---- offline diff-IK waypoint generation (arm dofs only) ------------
    def ik_track(q_arm, p_target, steps, dt_ik=0.02):
        qs = []
        q_full = station_q(q_arm, 0.08, box_pose0)
        for _ in range(steps):
            res = ik.differential_ik_step(
                model, params, q_full, p_target, ee, grasp_offset, gain=3.0)
            v_arm = res.v[:7]
            q_arm = q_arm + dt_ik * v_arm
            q_full = station_q(q_arm, 0.08, box_pose0)
            qs.append(np.asarray(q_arm))
        return q_arm, qs

    # grasp the UPPER part of the box: the pads (r=0.012) must stay clear
    # of the ground or stiction pins the fingers open
    p_box = jnp.asarray([box_xy[0], box_xy[1], 0.035], dtype)
    p_lift = p_box + jnp.asarray([0, 0, 0.18], dtype)
    q_arm = q_home
    q_arm, descend = ik_track(q_arm, p_box, 60)
    _, lift = ik_track(q_arm, p_lift, 80)

    # ---- the station plant with implicit PD servos ----------------------
    pd_joints = [
        (f"iiwa_joint_{i+1}", 2500.0, 100.0, float(iiwa.EFFORT_LIMITS[i]))
        for i in range(7)
    ] + [
        ("finger_left_joint", 400.0, 20.0, 80.0),
        ("finger_right_joint", 400.0, 20.0, 80.0),
    ]
    h = 2e-3
    dsys = cplant.make_discrete_system(
        model, params, scene, h,
        actuated_joints=[],  # everything is PD-servoed
        sap_params=sap.SapParameters(max_iterations=40),
        pd_joints=pd_joints,
    )
    step = jax.jit(lambda x, u: dsys.g(params, x, u))

    # ---- command transport: the reference's LCM wiring -------------------
    bus = PubSub("memq://station")
    iiwa_tx = iiwa_driver.IiwaCommandSender(bus)
    iiwa_rx = iiwa_driver.IiwaCommandReceiver(bus, hold_position=np.asarray(q_home))
    wsg_tx = wsg_driver.WsgCommandSender(bus)
    wsg_rx = wsg_driver.WsgCommandReceiver(bus)

    x = jnp.concatenate([station_q(q_home, 0.08, box_pose0),
                         jnp.zeros(nv, dtype)])

    open_w, closed_w = 0.08, 0.030  # squeeze below the box side
    phases = (
        [(q, open_w) for q in descend]
        + [(descend[-1], closed_w)] * 40  # close & squeeze
        + [(q, closed_w) for q in lift]
        + [(lift[-1], closed_w)] * 30
    )
    steps_per_cmd = 5  # 100 Hz commands, 500 Hz physics

    box_z_hist = []
    for k, (q_des, w_des) in enumerate(phases):
        # command path: publish -> transport -> receive -> plant input
        iiwa_tx.send(iiwa_driver.IiwaCommand(
            utime=k * 10000, joint_position=np.asarray(q_des)))
        wsg_tx.send(wsg_driver.WsgCommand(
            utime=k * 10000, target_position_mm=w_des * 1000.0, force=80.0))
        cmd = iiwa_rx.latest(bus)
        wcmd = wsg_rx.latest(bus)
        q_arm_des = jnp.asarray(cmd.joint_position, dtype)
        w_half = jnp.asarray(wcmd.target_position_mm / 1000.0 / 2.0, dtype)
        u = jnp.concatenate([q_arm_des, jnp.stack([w_half, w_half])])
        for _ in range(steps_per_cmd):
            x = step(x, u)
        box_z_hist.append(float(x[nq - 1]))

    box_z = np.asarray(box_z_hist)
    grip_q = np.asarray(x[7:9])
    print(f"finger joints at end: {grip_q.round(4)} (target {closed_w/2})")
    print(f"box z: start {box_z[0]:.3f} -> max {box_z.max():.3f} "
          f"-> final {box_z[-1]:.3f} m")

    assert box_z.max() > 0.12, "box was not lifted"
    assert box_z[-1] > 0.10, "box slipped out of the grasp"
    print("MANIPULATION STATION OK: picked and held the box "
          f"at {box_z[-1]:.3f} m via the pub/sub driver stack")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
