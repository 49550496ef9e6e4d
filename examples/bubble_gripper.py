"""Bubble gripper: FEM bubbles grasp a rigid payload through SAP stiction.

Reference: examples/multibody/deformable/bubble_gripper.cc — two compliant
deformable "bubble" fingers (DeformableBodyConfig E=1e4 Pa, nu=0.45) on a
closed WSG gripper hold a rigid object against gravity; the grasp works only
because the deformable-vs-rigid contact goes through the SAP cone projection
(solver-consistent stiction), not a viscous penalty.

TPU-first re-telling: each bubble is an FEM vertex clique coupled into SAP
(fem/sap_coupling.py), its back layer Dirichlet-pinned to the (closed,
static) finger.  The payload is a rigid box integrated from the coupling
impulses both bubbles return.  The acceptance gate is the reference demo's
physics: at grasp friction mu=1.0 the payload hangs on (drop < 5 mm over
0.3 s); at mu=0.02 the same squeeze lets it slip (an order of magnitude
farther — the pad's elastic shear makes the sliding payload creep rather
than free-fall over this window).

Run:  python examples/bubble_gripper.py --cpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_grasp(mu: float, n_steps: int = 150, h: float = 2e-3,
              resolution=(2, 3, 3)):
    """Simulate the two-bubble grasp; returns the payload's vertical drop [m]."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from drake_tpu.fem import mesh as fem_mesh
    from drake_tpu.fem import sap_coupling as fsc
    from drake_tpu.fem.model import make_model
    from drake_tpu.fem.solver import FemState
    from drake_tpu.geometry import shapes as sh
    from drake_tpu.mpm.coupling import RigidGeom

    F64 = jnp.float64

    # Payload: a 4 cm rigid cube, 50 g (the bubble_gripper.cc object role).
    box_size = (0.04, 0.04, 0.04)
    m_box = 0.05
    half = box_size[0] / 2

    # Bubbles: 2x6x6 cm compliant pads, squeezed 2 mm into each +-x face.
    # Back layer (the finger side) is Dirichlet-pinned: the gripper is
    # closed and holding position, as after bubble_gripper.cc's close phase.
    overlap = 0.002
    pad = (0.02, 0.06, 0.06)

    def make_bubble(side):
        verts, tets = fem_mesh.box_tet_mesh(*resolution, size=pad)
        verts = np.asarray(verts) - np.asarray(pad) / 2  # center at origin
        if side == "left":
            verts[:, 0] += -half - pad[0] / 2 + overlap
            pinned = verts[:, 0] < verts[:, 0].min() + 1e-6
        else:
            verts[:, 0] += half + pad[0] / 2 - overlap
            pinned = verts[:, 0] > verts[:, 0].max() - 1e-6
        model = make_model(
            verts, tets, density=200.0, youngs_modulus=2e4,
            poisson_ratio=0.4, dirichlet_mask=pinned, dtype=F64,
        )
        return model

    models = [make_bubble("left"), make_bubble("right")]
    states = [FemState(x=m.rest_x, v=jnp.zeros_like(m.rest_x)) for m in models]
    contact = fsc.FemContactParams(stiffness=1e6, dissipation=0.1, friction=mu)

    def payload_geom(p, v):
        return RigidGeom(
            shape=sh.Box(box_size), body_index=0,
            R_WG=jnp.eye(3, dtype=F64), p_WG=p, p_WB=p,
            V_WB=jnp.concatenate([jnp.zeros(3, F64), v]),
        )

    # The shape is static; close over it and pass only the pose/velocity
    # arrays through jit.
    steps = [
        jax.jit(
            lambda s, p, v, m=m: fsc.sap_fem_step(
                m, s, h, (payload_geom(p, v),), contact
            )
        )
        for m in models
    ]

    p = jnp.zeros(3, F64)
    v = jnp.zeros(3, F64)
    g_z = -9.81
    for _ in range(n_steps):
        impulse = jnp.zeros(3, F64)
        for i in range(2):
            res = steps[i](states[i], p, v)
            states[i] = res.state
            impulse = impulse + res.impulses[0, 3:]
        # Symmetric grasp: torques/side impulses cancel; integrate the
        # translation from the coupling impulses + gravity (lagged two-way
        # coupling, the deformable_driver.h:210-218 convention).
        v = v + impulse / m_box + jnp.array([0.0, 0.0, g_z * h], F64)
        p = p + h * v
    return float(-p[2])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    drop_grip = run_grasp(mu=1.0)
    print(f"mu=1.0 : payload drop over 0.3 s = {drop_grip * 1000:.2f} mm")
    drop_slip = run_grasp(mu=0.02)
    print(f"mu=0.02: payload drop over 0.3 s = {drop_slip * 1000:.2f} mm")

    ok = drop_grip < 0.002 and drop_slip > 5.0 * max(drop_grip, 1e-3)
    print("SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
