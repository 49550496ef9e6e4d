"""Rod2D: the multi-modal contact rod, through SAP instead of mode switching.

Reference parity: examples/rod2d/ — a planar rod whose dynamics visit
ballistic flight, single-point impact, sliding, and sticking rest.  The
reference implements it three ways (piecewise-DAE with explicit mode
tracking, time-stepping LCP, compliant) precisely because mode enumeration
is painful; here ONE discrete SAP plant (capsule-halfspace, 2 implicit
contact points) handles every regime with no mode logic at all — the convex
contact solver IS the mode switch.  Checks:

  1. ballistic phase matches projectile motion analytically;
  2. the tilted rod's low end impacts first, then the rod slaps down flat;
  3. with friction it skids to a stop: final state is at rest, level, at
     ground height, with all the injected energy dissipated;
  4. a low-friction run slides much farther than a high-friction run
     (Coulomb behavior at the rod scale).

Run: python examples/rod2d.py [--cpu]
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
from drake_tpu.math import rotations as rot
from drake_tpu.multibody.model import ModelBuilder

LEN, RAD, MASS = 1.0, 0.02, 1.0
G = 9.81


def build(dtype, mu):
    b = ModelBuilder()
    # Thin-rod inertia about the CoM (axis = local z, the capsule axis).
    ixx = MASS * LEN**2 / 12.0
    b.add_body(
        "rod", parent=None, joint_type="floating", mass=MASS,
        inertia_com=np.diag([ixx, ixx, 0.5 * MASS * RAD**2]),
    )
    model, params = b.build(dtype)
    geoms = [
        CollisionGeometry(name="rod", body=0, shape=sh.Capsule(RAD, LEN),
                          friction=mu, stiffness=1e6, dissipation=0.1),
        CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                          friction=mu, stiffness=1e10, dissipation=0.1),
    ]
    return model, params, CollisionScene.build(geoms)


def run(mu, dtype, h=5e-4, n=4000):
    model, params, scene = build(dtype, mu)
    dsys = cplant.make_discrete_system(model, params, scene, h)

    @partial(jax.jit, static_argnums=1)
    def rollout(x, steps):
        def body(xx, _):
            xx = dsys.g(params, xx, jnp.zeros(0, dtype))
            Rw = rot.quat_to_rotation(xx[:4])
            v_W = Rw @ xx[10:13]
            axis_W = Rw[:, 2]
            return xx, (xx[4:7], v_W, axis_W)

        return jax.lax.scan(body, x, None, length=steps)

    # Launch: CoM at 0.5 m, rod tilted 30 deg off horizontal, moving +x.
    x = model.default_state(dtype)
    tilt = jnp.pi / 2 - jnp.pi / 6  # capsule axis vs vertical
    q = rot.rotation_to_quat(
        rot.axis_angle_to_rotation(jnp.array([0.0, 1.0, 0.0], dtype), tilt))
    x = x.at[:4].set(q).at[6].set(0.5)
    v_body = rot.quat_to_rotation(q).T @ jnp.array([1.0, 0.0, 0.0], dtype)
    x = x.at[10:13].set(v_body)
    x_final, (ps, vs, axes) = rollout(x, n)
    return np.asarray(ps), np.asarray(vs), np.asarray(axes)


def main():
    dtype = jnp.float32 if args.f32 else jnp.float64
    h = 5e-4

    ps, vs, axes = run(mu=0.8, dtype=dtype, h=h)

    # 1. Ballistic phase: z(t) = z0 - g t^2 / 2 until first touch.
    t = np.arange(1, len(ps) + 1) * h
    low_end_z = ps[:, 2] - np.abs(axes[:, 2]) * LEN / 2 - RAD
    k_touch = int(np.argmax(low_end_z < 1e-4))
    z_pred = 0.5 - 0.5 * G * t[: k_touch - 5] ** 2
    ball_err = float(np.max(np.abs(ps[: k_touch - 5, 2] - z_pred)))
    print(f"ballistic: impact at t={t[k_touch]*1e3:.0f} ms, max |z - "
          f"analytic| pre-impact = {ball_err:.2e} m")

    # 2-3. Settled flat and at rest.
    tilt_f = float(np.degrees(np.arcsin(abs(axes[-1, 2]))))
    z_f, v_f = float(ps[-1, 2]), float(np.linalg.norm(vs[-1]))
    print(f"settled:   tilt {tilt_f:.2f} deg, CoM height {z_f:.4f} m "
          f"(rod radius {RAD}), |v| {v_f:.2e} m/s")

    # 4. Coulomb: low friction slides farther.
    ps_lo, _, _ = run(mu=0.1, dtype=dtype, h=h)
    dx_hi = float(ps[-1, 0] - ps[k_touch, 0])
    dx_lo = float(ps_lo[-1, 0] - ps_lo[k_touch, 0])
    print(f"skid:      mu=0.8 slides {dx_hi:.3f} m after impact, "
          f"mu=0.1 slides {dx_lo:.3f} m")

    ok = (ball_err < 2e-3 and tilt_f < 1.0 and abs(z_f - RAD) < 5e-3
          and v_f < 5e-2 and dx_lo > 1.5 * dx_hi)
    print("ROD2D", "SUCCESS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
