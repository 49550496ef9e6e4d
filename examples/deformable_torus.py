"""Deformable torus drop: implicit FEM settling on the ground.

Reference examples/multibody/deformable/deformable_torus.cc — a
volumetric deformable torus (corotated FEM, implicit integration) dropped
onto the ground, settling under gravity.  Here the whole rollout is one
`lax.scan` of backward-Euler steps (matrix-free Newton-PCG inside each
step; drake_tpu/fem/solver.py), so the sim jits once and runs on device.

Checks: the torus comes to rest ON the ground (lowest nodes at z~0, not
sunk), kinetic energy decays to ~0, and the volume is preserved within the
compressible model's tolerance.

Run:  python examples/deformable_torus.py [--cpu]
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

    from drake_tpu.fem import mesh as fmesh
    from drake_tpu.fem import model as fmodel
    from drake_tpu.fem import solver as fsolver

    dtype = jnp.float64 if args.cpu else jnp.float32

    verts, tets = fmesh.torus_tet_mesh()
    # scale to a ~20 cm torus and drop from 15 cm
    verts = np.asarray(verts) * 0.1
    model = fmodel.make_model(
        verts, np.asarray(tets), density=1000.0,
        youngs_modulus=5e4, poisson_ratio=0.4, dtype=dtype,
    )
    state = fsolver.make_state(model)
    drop = 0.15 - float(jnp.min(state.x[:, 2]))
    state = state._replace(x=state.x + jnp.asarray([0, 0, drop], dtype))

    h = 2e-3
    steps = 600
    opts = fsolver.FemSolverOptions()

    def body(s, _):
        s = fsolver.implicit_step(model, s, h, ground_z=0.0, options=opts)
        ke = 0.5 * jnp.sum(model.mass[:, None] * s.v**2)
        return s, (jnp.min(s.x[:, 2]), ke)

    scan = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=steps)
    )
    final, (zmins, kes) = scan(state)
    zmins = np.asarray(zmins)
    kes = np.asarray(kes)

    def vol_of(x):
        d1 = x[model.tets[:, 1]] - x[model.tets[:, 0]]
        d2 = x[model.tets[:, 2]] - x[model.tets[:, 0]]
        d3 = x[model.tets[:, 3]] - x[model.tets[:, 0]]
        return float(
            jnp.sum(jnp.einsum("ti,ti->t", jnp.cross(d1, d2), d3)) / 6.0
        )

    v_rest = vol_of(model.rest_x)
    v_final = vol_of(final.x)
    print(f"nodes: {model.rest_x.shape[0]}  tets: {model.tets.shape[0]}")
    print(f"lowest node: start {zmins[0]:.4f} m -> final {zmins[-1]:.4f} m")
    print(f"kinetic energy: impact peak {kes.max():.4f} J -> "
          f"final {kes[-1]:.2e} J")
    print(f"volume: rest {v_rest*1e3:.3f} L -> settled {v_final*1e3:.3f} L "
          f"({100*(v_final/v_rest-1):+.2f}%)")

    assert zmins[-1] > -0.01, "torus sank through the ground"
    assert zmins[-1] < 0.02, "torus is floating"
    assert kes[-1] < 0.02 * kes.max(), "did not come to rest"
    assert abs(v_final / v_rest - 1.0) < 0.08, "volume blew up"
    print("DEFORMABLE TORUS OK: settled on the ground at rest")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
