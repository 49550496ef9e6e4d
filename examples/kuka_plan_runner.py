"""KUKA plan-runner pipeline: robot plan -> interpolator -> command stream.

Reference: examples/kuka_iiwa_arm/kuka_plan_runner.cc + kuka_simulation.cc —
a planner publishes an ``lcmt_robot_plan`` on COMMITTED_ROBOT_PLAN; the plan
runner interpolates it (PiecewisePolynomial::Cubic, kuka_plan_runner.cc) and
streams ``lcmt_iiwa_command`` at the control rate; the simulation process
runs the arm behind an inverse-dynamics driver and publishes
``lcmt_iiwa_status``.  Here the three roles share one process but speak
ONLY over the wire: the typed lcmt_robot_plan schema (io/messages.py)
carries the plan, RobotPlanInterpolator (manipulation/plan_interpolator.py)
rebuilds the trajectory, and the SimIiwaDriver stack closes the loop.

Run:  python examples/kuka_plan_runner.py [--cpu]
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

    from drake_tpu.io.messages import (
        TypedPublisher,
        TypedSubscriber,
        lcmt_robot_plan,
    )
    from drake_tpu.io.pubsub import PubSub
    from drake_tpu.manipulation.iiwa_driver import (
        IiwaCommand,
        IiwaCommandSender,
        IiwaStatusReceiver,
        SimIiwaDriver,
    )
    from drake_tpu.manipulation.plan_interpolator import (
        InterpolatorType,
        RobotPlanInterpolator,
        encode_plan,
    )
    from drake_tpu.models import iiwa
    from drake_tpu.multibody import dynamics as dyn

    dtype = jnp.float64 if args.cpu else jnp.float32
    F = dtype

    bus = PubSub("memq://kuka")
    model, params = iiwa.make_model(F)
    q0 = np.asarray(iiwa.home_position(F), np.float64)

    # --- plan-runner role: subscribe FIRST (memq has no replay), hold at
    # the measured home position until a plan arrives (the reference
    # initializes its hold from the first status message).
    plan_rx = TypedSubscriber(bus, "COMMITTED_ROBOT_PLAN", lcmt_robot_plan)
    interp = RobotPlanInterpolator(7, InterpolatorType.Cubic)
    interp.set_plan(np.array([0.0]), q0[None, :])
    cmd_tx = IiwaCommandSender(bus)

    # --- planner role: publish a 3-knot joint plan on the wire ----------
    plan_tx = TypedPublisher(bus, "COMMITTED_ROBOT_PLAN", lcmt_robot_plan)
    q_goal = q0 + np.array([0.4, -0.3, 0.25, 0.5, -0.4, 0.3, 0.6])
    knots_t = np.array([0.0, 1.5, 3.0])
    knots_q = np.stack([q0, 0.5 * (q0 + q_goal) + 0.1, q_goal])
    plan_tx.publish(encode_plan(knots_t, knots_q))

    # --- simulation role ------------------------------------------------
    driver = SimIiwaDriver(bus, model, params, hold_position=q0, kp=400.0)
    status_rx = IiwaStatusReceiver(bus)

    h = 1e-3
    command_decimation = 10  # 100 Hz command stream, kuka_plan_runner rate
    n_steps = 3500
    nv = model.num_velocities
    q = jnp.asarray(q0, F)
    v = jnp.zeros(nv, F)

    @jax.jit
    def substep(q, v, tau):
        vdot = dyn.forward_dynamics(model, params, q, v, tau)
        v2 = v + h * vdot
        return q + h * v2, v2

    track_err = []
    for k in range(n_steps):
        t = k * h
        if k % command_decimation == 0:
            msg = plan_rx.poll()
            if msg is not None and plan_rx.count == 1:
                interp.handle_message(msg)
            qd, vd = interp.state(t)
            cmd_tx.send(
                IiwaCommand(utime=int(t * 1e6), joint_position=np.asarray(qd))
            )
            track_err.append(
                float(np.linalg.norm(np.asarray(q)[:7] - np.asarray(qd)))
            )
        tau = driver.step(t, np.asarray(q), np.asarray(v))
        q, v = substep(q, v, jnp.asarray(tau, F))

    qf = np.asarray(q)[:7]
    final_err = float(np.linalg.norm(qf - q_goal))
    st = status_rx.latest(bus)
    print(f"final |q - q_goal| = {final_err:.2e}")
    print(f"peak in-plan tracking error = {max(track_err):.3f} rad")
    print(f"status wire: utime {st.utime} us, q[0] {st.joint_position_measured[0]:+.3f}")

    ok = final_err < 1e-2 and max(track_err) < 0.2 and st.utime > 0
    print("SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
