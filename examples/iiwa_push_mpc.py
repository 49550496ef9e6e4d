"""iiwa contact-implicit MPC: push a free box to a goal through SAP contact.

The baseline config-4 demo (BASELINE.json: "kuka iiwa manipulation-station
contact-implicit MPC through the SAP solver").  A 7-dof iiwa (welded base)
shares the world with a free box on the ground; the receding-horizon iLQR
optimizes joint torques THROUGH the SAP contact dynamics (gradients via the
solver's implicit-function-theorem custom_vjp), discovering the push.

Run: python examples/iiwa_push_mpc.py [--cpu] [--f32] [--steps N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build_world(dtype):
    from drake_tpu.geometry import shapes as sh
    from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
    from drake_tpu.models import iiwa
    from drake_tpu.multibody.model import FLOATING, ModelBuilder, REVOLUTE, WELD

    b = ModelBuilder()
    for name, parent, rpy, xyz, mass, com, (ixx, iyy, izz), jt in iiwa._LINKS:
        b.add_body(
            name, parent=parent, joint_type=jt, mass=mass, com=com,
            inertia_com=np.diag([ixx, iyy, izz]), X_PJ_rpy=rpy, X_PJ_xyz=xyz,
            axis=(0, 0, 1), damping=2.0 if jt == REVOLUTE else 0.0,
        )
    side = 0.12
    mass_box = 0.5
    b.add_body(
        "box", parent=None, joint_type=FLOATING, mass=mass_box,
        inertia_com=np.eye(3) * mass_box * side**2 / 6.0,
    )
    model, params = b.build(dtype)

    geoms = [
        CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                          friction=0.6),
        CollisionGeometry(name="box", body=model.body_index("box"),
                          shape=sh.Box((side, side, side)), friction=0.6,
                          stiffness=1e5, dissipation=0.1),
        CollisionGeometry(name="ee", body=model.body_index("link7"),
                          shape=sh.Sphere(0.06), friction=0.6,
                          stiffness=1e5, dissipation=0.1),
    ]
    # Only box-ground and ee-box contacts matter for the push.
    scene = CollisionScene.build(geoms, exclude=[("ground", "ee")])
    return model, params, scene, side


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--steps", type=int, default=40)
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if args.f32 else jnp.float64

    from drake_tpu.contact import plant as cplant
    from drake_tpu.control import mpc
    from drake_tpu.models import iiwa
    from drake_tpu.multibody import dynamics as dyn
    from drake_tpu.multibody import kinematics as kin
    from drake_tpu.trajopt import ilqr

    model, params, scene, side = build_world(dtype)
    nq, nv = model.num_positions, model.num_velocities
    print(f"world: nq={nq} nv={nv} contacts={scene.num_contacts}")

    h = 0.04  # SAP is stable at large steps; 12*0.04 = 0.48 s lookahead
    dsys = cplant.make_discrete_system(model, params, scene, h)
    nu = dsys.num_inputs  # 7 arm torques

    # Initial state: arm at home, box in front of the arm on the ground.
    q_arm = iiwa.home_position(dtype)
    q_box = jnp.asarray([1, 0, 0, 0, 0.62, 0.0, side / 2], dtype)
    q0 = jnp.concatenate([q_arm, q_box])
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])

    box_goal = jnp.asarray([0.78, 0.15], dtype)  # push 16cm, veer +y
    # Gravity-compensation feedforward at the home pose.
    tau_g = dyn.bias_forces(model, params, q0, jnp.zeros(nv, dtype))[:7]

    ee_body = model.body_index("link7")

    def running_cost(p, x, u, t):
        q_box_xy = x[nq - 3 : nq - 1]
        box_err = jnp.sum((q_box_xy - box_goal) ** 2)
        # (weights tuned on the 0.48 s horizon)
        # Approach shaping: contact gradients vanish out of contact, so pull
        # the EE toward the push point behind the box (standard contact-MPC
        # reward shaping).
        _, p_WB = kin.forward_kinematics(model, p, x[:nq])
        p_ee = p_WB[ee_body]
        box_pos = x[nq - 3 : nq]
        push_dir = (box_goal - q_box_xy) / (
            jnp.linalg.norm(box_goal - q_box_xy) + 1e-6
        )
        push_point = box_pos - jnp.concatenate(
            [push_dir * (side / 2 + 0.055), jnp.zeros(1, x.dtype)]
        )
        ee_err = jnp.sum((p_ee - push_point) ** 2)
        arm_reg = 0.01 * jnp.sum((x[:7] - q_arm) ** 2)
        effort = 1e-4 * jnp.sum((u - tau_g) ** 2)
        vel_reg = 1e-4 * jnp.sum(x[nq:] ** 2)
        return 10.0 * box_err + 5.0 * ee_err + arm_reg + effort + vel_reg

    def final_cost(p, x):
        q_box_xy = x[nq - 3 : nq - 1]
        return 400.0 * jnp.sum((q_box_xy - box_goal) ** 2)

    horizon = 12
    us0 = jnp.tile(tau_g[None], (horizon, 1))
    effort_lim = jnp.asarray(iiwa.EFFORT_LIMITS, dtype)

    t0 = time.perf_counter()
    roll = jax.jit(
        lambda x: mpc.ilqr_mpc_rollout(
            dsys.g, running_cost, final_cost, params, x, us0, args.steps,
            dt=h, u_lower=-effort_lim, u_upper=effort_lim,
            options=ilqr.IlqrOptions(max_iters=5, tol=1e-8, use_jacrev=True),
        )
    )
    res = roll(x0)
    jax.block_until_ready(res.xs)
    t1 = time.perf_counter()
    res = roll(x0)
    jax.block_until_ready(res.xs)
    t2 = time.perf_counter()

    box_xy = np.asarray(res.xs[:, nq - 3 : nq - 1])
    print(f"box start {box_xy[0]}, goal {np.asarray(box_goal)}")
    print(f"box trajectory xy: {box_xy[:: max(1, args.steps // 8)]}")
    err0 = float(np.linalg.norm(box_xy[0] - np.asarray(box_goal)))
    err = float(np.linalg.norm(box_xy[-1] - np.asarray(box_goal)))
    print(f"box error: start {err0:.3f} m -> final {err:.3f} m")
    print(f"compile {t1 - t0:.0f}s; rollout of {args.steps} MPC solves "
          f"{(t2 - t1) * 1e3:.0f}ms -> {(t2 - t1) / args.steps * 1e3:.0f}ms/solve")
    ok = err < 0.3 * err0
    print("PUSH", "SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
