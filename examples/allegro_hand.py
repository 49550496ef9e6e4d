"""Allegro hand: constant-load curl to the joint stops, then a PD grasp.

Reference parity: examples/allegro_hand/run_allegro_constant_load_demo.cc —
apply a constant torque to every joint of the 16-dof Allegro hand and watch
the fingers curl until the joint limits stop them (the demo exists to
exercise the joint-limit constraints at scale), plus the joint_control demo
(PD joint targets over LCM).  Model files are assets, so an equivalent hand
is built procedurally: a fixed palm with 4 fingers x 3 revolute joints
(12 dofs), fingertip/link sphere pads, SAP joint-limit constraints.

Phase 1 (constant load): +0.3 Nm on every joint -> every joint settles AT
its upper limit with zero velocity; reversing the load sends it to the
lower limit.  The limits hold through SAP (sap_limit_constraint role), not
clamping.

Phase 2 (PD grasp): the hand is palm-up under a free ball; the implicit
effort-limited SAP PD servos (pd_joints, the sap_pd_controller_constraint
role) curl the fingers to grasp targets and hold the ball against gravity.

Run: python examples/allegro_hand.py [--cpu]
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
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
if not args.f32:
    jax.config.update("jax_enable_x64", True)

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import ModelBuilder

N_FINGERS, N_JOINTS = 4, 3
LINK = 0.045
Q_LO, Q_HI = -0.3, 1.6


def build(dtype, with_ball: bool):
    b = ModelBuilder()
    ey = np.eye(3)
    # Fingers curl about +y; finger k sits at angle around the palm edge.
    joints = []
    for k in range(N_FINGERS):
        px = 0.07 * np.cos(np.pi / 2 * k + np.pi / 4)
        py = 0.07 * np.sin(np.pi / 2 * k + np.pi / 4)
        yaw = np.pi / 2 * k + np.pi / 4
        parent = None
        for j in range(N_JOINTS):
            name = f"f{k}_l{j}"
            jn = f"f{k}_j{j}"
            b.add_body(
                name, parent=parent, joint_type="revolute", mass=0.03,
                axis=(0, -1, 0), com=(LINK / 2, 0, 0), inertia_com=ey * 2e-5,
                joint_name=jn, damping=0.02,
                X_PJ_xyz=(px, py, 0.0) if j == 0 else (LINK, 0, 0),
                X_PJ_rpy=(0, 0, yaw) if j == 0 else (0, 0, 0),
            )
            parent = name
            joints.append(jn)
    if with_ball:
        b.add_body("ball", parent=None, joint_type="floating", mass=0.05,
                   inertia_com=ey * 8e-6)
    model, params = b.build(dtype)

    geoms = []
    if with_ball:
        for k in range(N_FINGERS):
            for j in range(1, N_JOINTS):
                geoms.append(CollisionGeometry(
                    name=f"f{k}_pad{j}", body=model.body_index(f"f{k}_l{j}"),
                    shape=sh.Sphere(0.012), p_BG=np.array([LINK, 0.0, 0.0]),
                    friction=1.0, stiffness=2e4, dissipation=0.2))
        geoms.append(CollisionGeometry(
            name="ball", body=model.body_index("ball"), shape=sh.Sphere(0.035),
            friction=1.0, stiffness=2e4, dissipation=0.2))
        geoms.append(CollisionGeometry(
            name="palm", body=-1, shape=sh.HalfSpace(),
            friction=1.0, stiffness=1e7, dissipation=0.2))
    return model, params, CollisionScene.build(geoms), joints


def phase1(dtype, h=1e-3, n=1500):
    model, params, scene, joints = build(dtype, with_ball=False)
    nq = len(joints)
    lims = (jnp.full(nq, Q_LO, dtype), jnp.full(nq, Q_HI, dtype))
    dsys = cplant.make_discrete_system(
        model, params, scene, h, actuated_joints=joints, joint_limits=lims)

    @partial(jax.jit, static_argnums=2)
    def rollout(x, tau, steps):
        u = jnp.full((steps, nq), tau, dtype)
        return jax.lax.scan(lambda xx, uu: (dsys.g(params, xx, uu), None),
                            x, u)[0]

    x0 = model.default_state(dtype)
    x_hi = rollout(x0, 0.3, n)
    x_lo = rollout(x_hi, -0.3, n)
    q_hi, v_hi = np.asarray(x_hi[:nq]), np.asarray(x_hi[nq:])
    q_lo = np.asarray(x_lo[:nq])
    err_hi = float(np.max(np.abs(q_hi - Q_HI)))
    err_lo = float(np.max(np.abs(q_lo - Q_LO)))
    print(f"constant +load: all 12 joints at upper stop, max |q - q_hi| = "
          f"{err_hi:.2e} rad, max |v| = {np.abs(v_hi).max():.2e}")
    print(f"constant -load: all 12 joints at lower stop, max |q - q_lo| = "
          f"{err_lo:.2e} rad")
    return err_hi < 5e-3 and err_lo < 5e-3 and np.abs(v_hi).max() < 1e-3


def phase2(dtype, h=1e-3, n=2500):
    model, params, scene, joints = build(dtype, with_ball=True)
    nj = len(joints)
    lims = (jnp.full(nj, Q_LO, dtype), jnp.full(nj, Q_HI, dtype))
    pd = [(jn, 2.0, 0.1, 0.6) for jn in joints]  # Kp, Kd, effort limit
    dsys = cplant.make_discrete_system(
        model, params, scene, h, actuated_joints=[], joint_limits=lims,
        pd_joints=pd)
    iq_ball = model.q_offsets[model.body_index("ball")]

    # Ball resting on the palm plane at the hand center.
    x = model.default_state(dtype)
    x = x.at[iq_ball + 6].set(0.036)

    # Servo targets: curl proximal links up and around the ball.
    targets = np.tile([0.9, 0.9, 0.7], N_FINGERS).astype(np.float64)
    u = jnp.asarray(np.tile(targets, (n, 1)), dtype)

    @jax.jit
    def rollout(x, u):
        def body(xx, uu):
            xx = dsys.g(params, xx, uu)
            return xx, xx[iq_ball + 6]
        return jax.lax.scan(body, x, u)

    x_end, ball_z = rollout(x, u)
    ball_z = np.asarray(ball_z)
    lifted = float(ball_z[-1])
    q_end = np.asarray(x_end[:nj])
    print(f"PD grasp: fingers curl to {q_end.mean():.2f} rad mean "
          f"(targets 0.9/0.9/0.7), ball center z = {lifted:.3f} m "
          f"(caged on the palm, started 0.036)")
    # The grasp should cage the ball: it stays near the palm (no ejection),
    # fingers wrapped (mean angle > 0.4 rad), and the system is quiescent.
    v_ball = float(np.abs(np.asarray(x_end[model.num_positions:])).max())
    return (0.03 < lifted < 0.12 and q_end.mean() > 0.4 and v_ball < 0.5)


def main():
    dtype = jnp.float32 if args.f32 else jnp.float64
    ok1 = phase1(dtype)
    ok2 = phase2(dtype)
    print("ALLEGRO HAND", "SUCCESS" if (ok1 and ok2) else
          f"FAIL (limits={ok1}, grasp={ok2})")
    return 0 if (ok1 and ok2) else 1


if __name__ == "__main__":
    sys.exit(main())
