"""Simple gripper: grip-vs-slip of a shaken parallel-jaw grasp.

Reference parity: examples/simple_gripper/simple_gripper.cc — a two-finger
gripper on a vertical prismatic "carriage" joint squeezes a mug while a sine
force shakes the gripper up and down; the knobs (grip force, friction,
shake amplitude) decide whether the mug holds or slips.  The reference
builds it from an SDF + Sine source + coupler constraint; here the same
mechanism is four bodies from ModelBuilder, the SAP coupler constraint ties
the two finger joints symmetric (q_left = -q_right, the reference's
CouplerConstraint on the same mechanism), and the squeeze/shake forcing is
the actuation input sequence.

Physics check (Coulomb at grasp scale): the mug (m = 0.1 kg) holds iff
2 mu F_grip >= m (g + a_shake).  With mu = 0.5, shake a_max ~ 0.5 g:
F = 4 N  -> 2muF = 4.0 N  >> 1.47 N  (holds through the shake)
F = 0.3 N -> 2muF = 0.3 N <  1.47 N  (slips out of the jaws)

Run: python examples/simple_gripper.py [--cpu]
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

MU = 0.5
M_MUG = 0.1
G = 9.81
MUG_W = 0.06          # mug width (y extent)
PAD = (0.08, 0.02, 0.10)  # finger pad box


def build(dtype):
    b = ModelBuilder()
    b.add_body("carriage", parent=None, joint_type="prismatic", mass=0.8,
               inertia_com=np.eye(3) * 1e-3, axis=(0, 0, 1),
               joint_name="jz", damping=2.0)
    b.add_body("left_pad", parent="carriage", joint_type="prismatic",
               mass=0.1, inertia_com=np.eye(3) * 1e-4, axis=(0, 1, 0),
               joint_name="jl", X_PJ_xyz=(0, -0.08, 0), damping=0.5)
    b.add_body("right_pad", parent="carriage", joint_type="prismatic",
               mass=0.1, inertia_com=np.eye(3) * 1e-4, axis=(0, 1, 0),
               joint_name="jr", X_PJ_xyz=(0, 0.08, 0), damping=0.5)
    b.add_body("mug", parent=None, joint_type="floating", mass=M_MUG,
               inertia_com=np.eye(3) * 1e-4)
    model, params = b.build(dtype)
    geoms = [
        CollisionGeometry(name="lpad", body=model.body_index("left_pad"),
                          shape=sh.Box(PAD), friction=MU, stiffness=1e5),
        CollisionGeometry(name="rpad", body=model.body_index("right_pad"),
                          shape=sh.Box(PAD), friction=MU, stiffness=1e5),
        CollisionGeometry(name="mug", body=model.body_index("mug"),
                          shape=sh.Box((0.06, MUG_W, 0.08)),
                          friction=MU, stiffness=1e5),
    ]
    return model, params, CollisionScene.build(geoms)


def run(f_grip, dtype, h=1e-3, n=3000, shake_amp=4.0, shake_hz=2.0):
    model, params, scene = build(dtype)
    dsys = cplant.make_discrete_system(
        model, params, scene, h,
        actuated_joints=["jz", "jl"],
        couplers=[("jl", "jr", -1.0, 0.0)],  # symmetric jaws
    )
    iq_mug = model.q_offsets[model.body_index("mug")]

    # Hold force = total suspended weight; sine rides on top of it.
    m_tot = 0.8 + 0.1 + 0.1 + M_MUG
    t = (np.arange(n) + 1) * h
    fz = m_tot * G + shake_amp * np.sin(2 * np.pi * shake_hz * t)
    # +y squeeze on the left jaw; the coupler mirrors it onto the right jaw.
    u_seq = jnp.asarray(np.stack([fz, f_grip * np.ones(n)], axis=1), dtype)

    x = model.default_state(dtype)
    # Pad centers start just at the mug faces: mug face y=+-0.03, pad half
    # thickness 0.01 -> pad centers at -+0.04; joint frames sit at -+0.08.
    x = x.at[1].set(0.04).at[2].set(-0.04)

    @partial(jax.jit, static_argnums=2)
    def rollout(x, u_seq, steps):
        def body(xx, u):
            xx = dsys.g(params, xx, u)
            mug_z = xx[iq_mug + 6]
            car_z = xx[0]
            return xx, (mug_z, car_z)

        return jax.lax.scan(body, x, u_seq, length=steps)

    _, (mug_z, car_z) = rollout(x, u_seq, n)
    return np.asarray(mug_z), np.asarray(car_z)


def main():
    dtype = jnp.float32 if args.f32 else jnp.float64

    mug_z, car_z = run(f_grip=4.0, dtype=dtype)
    rel_hold = mug_z - car_z
    drift_hold = float(abs(rel_hold[-1] - rel_hold[200]))
    print(f"F_grip=4.0 N: carriage shaken +-{float(np.ptp(car_z))/2:.3f} m, "
          f"mug-in-hand drift {drift_hold*1e3:.2f} mm  (2muF=4.0 N >> load)")

    mug_z_w, car_z_w = run(f_grip=0.3, dtype=dtype)
    rel_weak = mug_z_w - car_z_w
    slip = float(rel_weak[200] - rel_weak[-1])
    note = "falls free of the grasp" if slip > 0.1 else "slips in the jaws"
    print(f"F_grip=0.3 N: mug slides {min(slip, 0.1)*1e3:.0f}+ mm down and "
          f"{note}  (2muF=0.3 N < 1.47 N load)")

    ok = drift_hold < 2e-3 and slip > 0.02
    print("SIMPLE GRIPPER", "SUCCESS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
