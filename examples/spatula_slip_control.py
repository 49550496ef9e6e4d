"""Spatula slip control: torsional grasp stability needs hydroelastic patches.

Reference: examples/hydroelastic/spatula_slip_control/ — a gripper pinches a
spatula with compliant-hydroelastic pads; at low grip force the spatula
ROTATES in the grasp (slips about the pinch axis under the blade's gravity
torque), at high grip force the distributed patch friction holds it.  The
demo exists because point contact cannot tell the difference: a pinch
rotation spins each contact about its own normal, a motion a single contact
point resists with ZERO moment (the rolling-sphere lesson applied to
grasping).

TPU re-telling on the discrete SAP plant: the spatula is a floating body
whose grip knob (compliant sphere) is pinched between two world-anchored
pads, with the blade's center of mass offset sideways so gravity applies a
pure torque about the pinch axis.  Three runs:

  * point contact, strong pinch     -> spins away (no torsional resistance)
  * hydro patches, strong pinch     -> holds (slip < a few mrad/s)
  * hydro patches, weak pinch       -> controlled slip (the reference's
                                       low-grip-force regime)

Run:  python examples/spatula_slip_control.py [--cpu]
"""

import argparse
import os
import sys
from functools import partial

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
    from drake_tpu.geometry import shapes as sh
    from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
    from drake_tpu.math import rotations as rot
    from drake_tpu.multibody.model import ModelBuilder

    dtype = jnp.float64 if args.cpu else jnp.float32

    R_KNOB = 0.02  # grip knob radius [m]
    MU = 1.0
    M = 0.2  # spatula mass [kg]
    D_COM = 0.08  # blade COM offset along +y from the grip point [m]

    def build(hydro: bool, overlap: float):
        b = ModelBuilder()
        # Body origin at the grip point; COM offset in +y gives gravity a
        # pure torque about the pinch (x) axis.
        b.add_body(
            "spatula", parent=None, joint_type="floating", mass=M,
            com=(0.0, D_COM, 0.0), inertia_com=np.eye(3) * 2e-4,
        )
        model, params = b.build(dtype)
        knob = dict(
            name="knob", body=0, shape=sh.Sphere(R_KNOB),
            friction=MU, dissipation=0.2,
        )
        if hydro:
            knob.update(hydroelastic_modulus=5e6, hydro_rings=3)
        else:
            knob.update(stiffness=5e7)
        gap = R_KNOB - overlap  # pad face distance from the grip center
        pads = [
            CollisionGeometry(
                name=f"pad_{side}", body=-1,
                shape=sh.Box((0.02, 0.08, 0.08)),
                p_BG=np.array([s * (gap + 0.01), 0.0, 0.0]),
                friction=MU, stiffness=1e10, dissipation=0.2,
            )
            for side, s in (("minus", -1.0), ("plus", 1.0))
        ]
        scene = CollisionScene.build([CollisionGeometry(**knob)] + pads)
        return model, params, scene

    def run(hydro: bool, overlap: float, h=5e-4, n=2000):
        model, params, scene = build(hydro, overlap)
        dsys = cplant.make_discrete_system(model, params, scene, h)

        @partial(jax.jit, static_argnums=1)
        def rollout(x, steps):
            def body(xx, _):
                xx = dsys.g(params, xx, jnp.zeros(0, dtype))
                Rw = rot.quat_to_rotation(xx[:4])
                w_W = Rw @ xx[7:10]
                return xx, w_W[0]

            return jax.lax.scan(body, x, None, length=steps)

        x = model.default_state(dtype)
        x, wx = rollout(x, n)
        # Total rotation about the pinch axis over the window.
        return float(jnp.abs(jnp.sum(wx)) * h), float(jnp.abs(wx[-1]))

    t_window = 2000 * 5e-4
    rot_point, w_point = run(hydro=False, overlap=0.004)
    print(f"point contact, strong pinch: |rotation| {rot_point:.3f} rad "
          f"over {t_window:.1f} s (final |wx| {w_point:.2f} rad/s)")
    rot_hyd, w_hyd = run(hydro=True, overlap=0.004)
    print(f"hydro patches, strong pinch: |rotation| {rot_hyd:.4f} rad "
          f"(final |wx| {w_hyd:.4f} rad/s) -- grasp holds")
    rot_weak, w_weak = run(hydro=True, overlap=0.0008)
    print(f"hydro patches, weak pinch:   |rotation| {rot_weak:.3f} rad "
          f"-- controlled slip regime")

    ok = (
        rot_point > 5.0 * max(rot_hyd, 1e-4)
        and rot_hyd < 0.1
        and rot_weak > 2.0 * rot_hyd
    )
    print("SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
