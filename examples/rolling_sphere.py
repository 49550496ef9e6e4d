"""Rolling sphere: point contact vs hydroelastic patch — the
examples/multibody/rolling_sphere demo.

The reference demo exists to contrast contact models on the same scene
(rolling_sphere_run_dynamics.cc --contact_model={point,hydroelastic}).  Same
experiment here, same conclusions:

  * POINT contact: a ball launched sliding brakes to the analytic rolling
    speed 5/7 v0 and rolls forever; a ball spinning about the vertical axis
    never slows down (a point has no moment arm — torsional friction is
    identically zero).
  * HYDROELASTIC patch (quadrature rings over the contact cap,
    drake_tpu/geometry/scene.py _hydro_sphere_halfspace; reference
    geometry/proximity hydroelastic machinery): the distributed friction
    produces the torsional moment that decays the vertical spin, plus a
    rolling-resistance moment that eventually brings the rolling ball to
    rest — both effects a point contact cannot represent.

Run: python examples/rolling_sphere.py [--cpu]
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

R = 0.1
E_MOD = 2e5
MU = 0.5


def build(dtype, hydro: bool, rings=3):
    b = ModelBuilder()
    b.add_body(
        "ball", parent=None, joint_type="floating", mass=1.0,
        inertia_com=np.eye(3) * (0.4 * R**2),
    )
    model, params = b.build(dtype)
    ball_kwargs = dict(
        name="ball", body=0, shape=sh.Sphere(R),
        friction=MU, dissipation=0.1,
    )
    if hydro:
        ball_kwargs.update(hydroelastic_modulus=E_MOD, hydro_rings=rings)
    else:
        ball_kwargs.update(stiffness=1e6)
    geoms = [
        CollisionGeometry(**ball_kwargs),
        CollisionGeometry(
            name="ground", body=-1, shape=sh.HalfSpace(),
            friction=MU, stiffness=1e10, dissipation=0.1,
        ),
    ]
    return model, params, CollisionScene.build(geoms)


def run(hydro: bool, dtype, h=1e-3, n=1200):
    model, params, scene = build(dtype, hydro)
    dsys = cplant.make_discrete_system(model, params, scene, h)

    from drake_tpu.math import rotations as rot

    @partial(jax.jit, static_argnums=1)
    def rollout(x, steps):
        def body(xx, _):
            xx = dsys.g(params, xx, jnp.zeros(0, dtype))
            # Floating-joint velocities are body-frame; report world-frame.
            Rw = rot.quat_to_rotation(xx[:4])
            v_W = Rw @ xx[10:13]
            w_W = Rw @ xx[7:10]
            return xx, (v_W[0], w_W[1], w_W[2])  # (vx, wy, wz)

        return jax.lax.scan(body, x, None, length=steps)

    # Settle onto the ground, then (a) kick vx, (b) kick wz.
    x = model.default_state(dtype)
    x = x.at[6].set(R)
    x, _ = rollout(x, 600)
    x_roll = x.at[10].set(1.0)
    _, (vxs, wys, _) = rollout(x_roll, n)
    x_spin = x.at[9].set(10.0)
    _, (_, _, wzs) = rollout(x_spin, n)
    return np.asarray(vxs), np.asarray(wys), np.asarray(wzs)


def main():
    dtype = jnp.float32 if args.f32 else jnp.float64
    v0, w0 = 1.0, 10.0

    vxs, wys, wzs = run(hydro=False, dtype=dtype)
    slips = np.abs(vxs - wys * R)
    onset = int(np.argmax(slips < 1e-4))
    print(f"[point]  slide->roll at t = {onset + 1} ms; rolling speed "
          f"{vxs[-1]:.4f} m/s (analytic 5/7 v0 = {5 * v0 / 7:.4f}); "
          f"vertical spin {w0:.0f} -> {wzs[-1]:.3f} rad/s (no torsional "
          f"friction from a point)")
    point_ok = (abs(vxs[-1] - 5 * v0 / 7) < 0.02
                and slips[-1] < 1e-3 and wzs[-1] > 0.95 * w0)

    vxs_h, wys_h, wzs_h = run(hydro=True, dtype=dtype)
    print(f"[hydro]  rolling speed decays {vxs_h[200]:.3f} (0.2s) -> "
          f"{vxs_h[-1]:.4f} m/s (patch rolling resistance); vertical spin "
          f"{w0:.0f} -> {wzs_h[-1]:.3f} rad/s (patch torsional friction)")
    hydro_ok = vxs_h[-1] < 0.2 * v0 and wzs_h[-1] < 0.5 * w0

    ok = point_ok and hydro_ok
    print("ROLLING-SPHERE", "SUCCESS" if ok else "FAIL",
          f"(point_ok={point_ok}, hydro_ok={hydro_ok})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
