"""Four-bar linkage: a kinematic loop closed two ways.

Mirrors reference examples/multibody/four_bar/passive_simulation.cc, which
cuts the loop and closes it with a stiff LinearBushingRollPitchYaw
"bushing-as-joint" (force_stiffness 30000, damping 1500) while a constant
torque drives the crank.  This example runs the same linkage with BOTH
closure mechanisms this framework offers and compares them:

  1. bushing closure — the reference's approach: a stiff ball-joint
     bushing (zero torque stiffness) ties the rocker tip back to a world
     anchor through the ForceElement hook of the continuous plant, so the
     loop error is set by the bushing stiffness;
  2. constraint closure — the TPU-native default: a SAP ball constraint
     (what multibody/topology's loop cutting emits), solved implicitly by
     the discrete plant to near-machine closure each step.

SUCCESS = the crank completes at least one full revolution under constant
torque in both models, with constraint closure holding the loop >= 10x
tighter than the bushing.

Run: python examples/four_bar.py [--cpu] [--f32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

L_CRANK, L_COUPLER, L_ROCKER = 1.0, 2.0, 1.0
ANCHOR = np.array([2.0, 0.0, 0.0])


def build(dtype, with_anchor_body=False):
    from drake_tpu.multibody.model import ModelBuilder

    b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
    if with_anchor_body:
        # Bushing frames attach to named bodies; give the world anchor one.
        b.add_body("anchor", parent=None, joint_type="weld", mass=0.0,
                   X_PJ_xyz=tuple(ANCHOR))
    b.add_body(
        "crank", parent=None, joint_type="revolute", mass=1.0,
        com=(0, 0, -L_CRANK / 2),
        inertia_com=np.diag([1 / 12, 1 / 12, 1e-3]), axis=(0, 1, 0),
    )
    b.add_body(
        "coupler", parent="crank", joint_type="revolute", mass=1.0,
        com=(L_COUPLER / 2, 0, 0),
        inertia_com=np.diag([1e-3, L_COUPLER**2 / 12, L_COUPLER**2 / 12]),
        axis=(0, 1, 0), X_PJ_xyz=(0, 0, -L_CRANK),
    )
    b.add_body(
        "rocker", parent="coupler", joint_type="revolute", mass=1.0,
        com=(0, 0, L_ROCKER / 2),
        inertia_com=np.diag([1 / 12, 1 / 12, 1e-3]),
        axis=(0, 1, 0), X_PJ_xyz=(L_COUPLER, 0, 0),
    )
    return b.build(dtype)


def loop_errors(model, params, qs, dtype):
    from drake_tpu.multibody import kinematics as kin

    rocker = model.body_index("rocker")
    tip_B = jnp.asarray([0.0, 0.0, L_ROCKER], dtype)
    anchor = jnp.asarray(ANCHOR, dtype)

    def one(q):
        R, p = kin.forward_kinematics(model, params, q)
        tip = p[rocker] + R[rocker] @ tip_B
        return jnp.linalg.norm(tip - anchor)

    return jax.vmap(one)(qs)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--torque", type=float, default=15.0,
                        help="constant crank torque [N*m] (ref applied_torque)")
    parser.add_argument("--seconds", type=float, default=4.0)
    # 15 N*m clears the ~12.5 N*m gravity stall torque of the linkage; with
    # no dissipation the crank keeps accelerating, so longer runs trade
    # closure error for revolutions.
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if args.f32 else jnp.float64

    from drake_tpu.contact import plant as cplant
    from drake_tpu.geometry.scene import CollisionScene
    from drake_tpu.multibody import force_elements as fel
    from drake_tpu.multibody import plant as mplant
    from drake_tpu.systems import simulator

    h = 2e-3
    steps = int(args.seconds / h)

    # --- 1. bushing closure (reference passive_simulation.cc approach) ---
    model_b, params_b = build(dtype, with_anchor_body=True)
    feb = fel.ForceElementBuilder(model_b)
    feb.add_bushing(
        "anchor", "rocker",
        X_CM_xyz=(0.0, 0.0, L_ROCKER),
        torque_stiffness=(0.0, 0.0, 0.0),   # free rotation: ball bushing
        torque_damping=(0.0, 0.0, 0.0),
        force_stiffness=(30000.0,) * 3,     # ref four_bar.cc:54
        force_damping=(300.0,) * 3,  # sub-critical (c_crit~346);
        # the ref runs 1500 under an implicit integrator, RK4 would need
        # h < 2.8/1500 — see the h_c choice below
    )
    fe, fp = feb.build(dtype)
    csys = mplant.make_system(
        model_b, params_b,
        applied_forces=lambda p, q, v, t: fel.generalized_forces(
            model_b, p, fe, fp, q, v))
    h_c = 5e-4  # explicit RK4 stability for the stiff bushing (h*d/m < 2.8)
    steps_c = int(args.seconds / h_c)
    u = jnp.zeros((steps_c, 3), dtype).at[:, 0].set(args.torque)
    x0 = jnp.zeros(2 * model_b.num_positions, dtype)
    xs, _ = simulator.simulate(csys, params_b, x0, u, h_c)
    errs_b = loop_errors(model_b, params_b, xs[:, :3], dtype)
    revs_b = float(xs[-1, 0]) / (2 * np.pi)
    bush_err = float(jnp.max(errs_b))
    print(f"   bushing: crank revolutions = {revs_b:+.2f}, "
          f"max loop error = {bush_err:.2e} m")

    # --- 2. SAP ball-constraint closure (the TPU-native path) ---
    model_c, params_c = build(dtype)
    rocker_idx = model_c.body_index("rocker")
    dsys = cplant.make_discrete_system(
        model_c, params_c, CollisionScene.build([]), h,
        ball_constraints=[
            (rocker_idx, (0.0, 0.0, L_ROCKER), -1, tuple(ANCHOR))
        ],
    )
    uc = jnp.asarray([args.torque, 0.0, 0.0], dtype)

    def step(x, _):
        return dsys.g(params_c, x, uc), x

    _, xsc = jax.lax.scan(jax.jit(step), jnp.zeros(6, dtype), None,
                          length=steps)
    errs_c = loop_errors(model_c, params_c, xsc[:, :3], dtype)
    revs_c = float(xsc[-1, 0]) / (2 * np.pi)
    cons_err = float(jnp.max(errs_c))
    print(f"constraint: crank revolutions = {revs_c:+.2f}, "
          f"max loop error = {cons_err:.2e} m")

    ok_spin = abs(revs_b) >= 1.0 and abs(revs_c) >= 1.0
    ok_tight = cons_err * 10 <= bush_err and cons_err < 1e-3
    print(f"constraint closure is {bush_err / max(cons_err, 1e-300):.0f}x "
          "tighter than the bushing")
    if ok_spin and ok_tight:
        print("FOUR-BAR SUCCESS")
    else:
        raise SystemExit("four-bar FAILED")


if __name__ == "__main__":
    main()
