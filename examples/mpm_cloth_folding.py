"""Cloth folding: kinematic pinch grabs one edge and folds it over.

Reference examples/multibody/deformable/mpm_cloth_folding.cc (the fork's
codimensional-MPM folding demo: a gripper pinches a cloth edge, arcs it
across, releases; MPM's single-velocity-field grid gives self-contact for
free, so the folded layers do not interpenetrate).

Here the gripper is a scripted Dirichlet constraint: the grabbed vertex
strip's position/velocity are overridden along a half-circle arc inside
the jitted substep loop (the reference drives the same motion through its
grippers).  Phases: settle -> fold (arc) -> release -> settle.

Checks: the folded cloth's x-extent shrinks toward half, the grabbed edge
lands near the far edge, both layers rest near the floor, and the state
stays finite.

Run:  python examples/mpm_cloth_folding.py [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from drake_tpu.mpm import cloth
    from drake_tpu.mpm import solver as mpm

    F32 = jnp.float32

    cfg = cloth.ClothConfig()
    grid = mpm.MpmConfig(
        grid_size=(32, 32, 32), dx=1.0 / 32, dt=5e-5, wall_width=2
    )
    # cloth spans x in [0.25, 0.75] just above the sticky floor (z=2/32)
    z0 = 2.0 / 32 + 0.02
    nx = 16
    c = cloth.make_grid_cloth(cfg, nx, nx, origin=(0.25, 0.25, z0),
                              size=(0.5, 0.5))
    n_verts = c.x.shape[0]
    # the grabbed strip: the max-x edge column of the vertex grid
    grab = np.where(np.asarray(c.x[:, 0]) > 0.74)[0]
    grab = jnp.asarray(grab)
    x_edge0 = c.x[grab]  # rest positions of the grabbed strip

    # Fold arc: hinge at the cloth CENTER (x = 0.5) so the grabbed edge
    # lands on the far half — fold in half; radius = half the span.
    hinge_x = 0.5
    radius = 0.25
    fold_T = 12000  # substeps for the fold (0.6 s)
    settle_T = 3000
    release_T = 5000

    def strip_pose(k):
        """Scripted strip positions/velocities at fold substep k."""
        th = jnp.pi * jnp.clip(k / fold_T, 0.0, 1.0)
        x = hinge_x + radius * jnp.cos(th)
        z = z0 + radius * jnp.sin(th)
        dth = jnp.pi / (fold_T * grid.dt)
        vx = -radius * jnp.sin(th) * dth
        vz = radius * jnp.cos(th) * dth
        pos = jnp.stack(
            [jnp.full_like(x_edge0[:, 0], x), x_edge0[:, 1],
             jnp.full_like(x_edge0[:, 2], z)], axis=1)
        vel = jnp.tile(jnp.asarray([vx, 0.0, vz], F32)[None], (grab.shape[0], 1))
        return pos, vel

    def substep(state, k, grabbed):
        state, _ = cloth.cloth_substep(grid, cfg, state)
        if grabbed:
            pos, vel = strip_pose(k)
            state = state.replace(
                x=state.x.at[grab].set(pos), v=state.v.at[grab].set(vel)
            )
        return state

    @jax.jit
    def settle(state, n):
        return jax.lax.fori_loop(
            0, n, lambda i, s: substep(s, 0, False), state)

    @jax.jit
    def fold(state):
        return jax.lax.fori_loop(
            0, fold_T, lambda k, s: substep(s, k, True), state)

    state = c
    t0 = time.perf_counter()
    state = settle(state, settle_T)
    x_settled = np.asarray(state.x)
    print(f"settled: z [{x_settled[:,2].min():.3f}, {x_settled[:,2].max():.3f}]")

    state = fold(state)
    state = settle(state, release_T)
    wall = time.perf_counter() - t0
    x = np.asarray(state.x)
    total = settle_T + fold_T + release_T
    print(f"{total} substeps in {wall:.1f}s -> {total/wall:.0f} substeps/s")

    assert np.all(np.isfinite(x)), "cloth blew up"
    extent_x = x[:, 0].max() - x[:, 0].min()
    print(f"x-extent after fold: {extent_x:.3f} m (flat was 0.50)")
    # grabbed edge ended near the far edge (a real fold, not a drag)
    edge_x = float(np.median(x[np.asarray(grab), 0]))
    print(f"grabbed-edge median x: {edge_x:.3f} (hinge at {hinge_x})")
    assert extent_x < 0.40, "cloth did not fold"
    assert edge_x < 0.40, "grabbed edge did not cross to the far half"
    # two layers, both near the floor
    z_top = float(np.percentile(x[:, 2], 95))
    print(f"95th-pct z: {z_top:.3f} (floor at {2/32:.3f})")
    assert z_top < 2 / 32 + 0.12, "fold is not lying down"

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "folded.obj"), "w") as f:
            for v in x:
                f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}\n")
            for tri in np.asarray(c.faces):
                f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
    print("CLOTH FOLDING OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
