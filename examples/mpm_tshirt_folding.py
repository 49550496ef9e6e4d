"""T-shirt folding — the mpm_tshirt_folding.cc analog.

A t-shirt-shaped cloth mesh (body panel + two sleeves, built with a masked
grid triangulation through cloth.make_cloth_from_mesh) lies on the sticky
floor and is folded in three scripted moves, the classic laundry fold the
reference fork demos (examples/multibody/deformable/mpm_tshirt_folding.cc):

  1. left sleeve folded over the body,
  2. right sleeve folded over the body,
  3. hem folded up to the collar.

Each move grabs an edge strip of vertices and drives it along a half-circle
arc (a scripted Dirichlet constraint inside the jitted substep loop — the
role of the reference's kinematic grippers); MPM's single grid velocity
field provides the layer-on-layer self-contact that keeps the folds from
interpenetrating.

Run:  python examples/mpm_tshirt_folding.py [--cpu] [--out DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_tshirt(cfg, spacing=1.0 / 32, dtype=None):
    """Masked-grid t-shirt: body x in [0.36, 0.64], y in [0.25, 0.72];
    sleeves x in [0.27, 0.36] / [0.64, 0.73], y in [0.55, 0.72]."""
    import numpy as np

    from drake_tpu.mpm import cloth

    xs = np.arange(0.27, 0.73 + 1e-9, spacing)
    ys = np.arange(0.25, 0.72 + 1e-9, spacing)

    def inside(x, y):
        body = 0.36 - 1e-9 <= x <= 0.64 + 1e-9
        sleeve = (x < 0.36 or x > 0.64) and y >= 0.55 - 1e-9
        return body or sleeve

    index = -np.ones((len(xs), len(ys)), np.int64)
    pts = []
    for i, x in enumerate(xs):
        for j, y in enumerate(ys):
            if inside(x, y):
                index[i, j] = len(pts)
                pts.append((x, y, 0.0))
    faces = []
    for i in range(len(xs) - 1):
        for j in range(len(ys) - 1):
            a, b = index[i, j], index[i + 1, j]
            c, d = index[i, j + 1], index[i + 1, j + 1]
            if min(a, b, c) >= 0:
                faces.append([a, b, c])
            if min(b, d, c) >= 0:
                faces.append([b, d, c])
    pts = np.asarray(pts)
    return cloth.make_cloth_from_mesh(cfg, pts, faces, dtype), pts


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
    z0 = 2.0 / 32 + 0.015

    state, pts0 = make_tshirt(cfg, dtype=F32)
    state = state.replace(x=state.x.at[:, 2].set(z0))
    nverts = state.x.shape[0]
    print(f"t-shirt: {nverts} verts, {state.faces.shape[0]} faces")

    def fold_plan(axis, hinge, lo_side, strip_lo, strip_hi):
        """Grab verts whose `axis` coord is in [strip_lo, strip_hi]; arc
        them over the hinge line (perpendicular axis stays fixed)."""
        mask = (pts0[:, axis] >= strip_lo) & (pts0[:, axis] <= strip_hi)
        grab = np.where(mask)[0]
        r = np.abs(pts0[grab, axis] - hinge)  # per-vertex arc radius
        sgn = -1.0 if lo_side else 1.0  # which side of the hinge it starts
        return (jnp.asarray(grab), jnp.asarray(r, F32), hinge, sgn, axis)

    # 1) left sleeve over body (hinge x=0.38), 2) right sleeve (x=0.62),
    # 3) hem (y<=0.30 strip) up over the collar (hinge y=0.50).
    plans = [
        fold_plan(0, 0.38, True, 0.26, 0.34),
        fold_plan(0, 0.62, False, 0.66, 0.74),
        fold_plan(1, 0.50, True, 0.24, 0.30),
    ]

    fold_T = 9000
    settle_T = 2500

    def make_fold(plan):
        grab, r, hinge, sgn, axis = plan

        def strip_pose(k):
            th = jnp.pi * jnp.clip(k / fold_T, 0.0, 1.0)
            u = hinge + sgn * r * jnp.cos(th)  # folded coordinate
            z = z0 + r * jnp.sin(th)
            dth = jnp.pi / (fold_T * grid.dt)
            du = -sgn * r * jnp.sin(th) * dth
            dz = r * jnp.cos(th) * dth
            return u, z, du, dz

        def substep(k, s):
            s, _ = cloth.cloth_substep(grid, cfg, s)
            u, z, du, dz = strip_pose(k)
            x = s.x.at[grab, axis].set(u).at[grab, 2].set(z)
            v = s.v.at[grab, axis].set(du).at[grab, 2].set(dz)
            return s.replace(x=x, v=v)

        @jax.jit
        def fold(s):
            s = jax.lax.fori_loop(0, fold_T, substep, s)
            return jax.lax.fori_loop(
                0, settle_T, lambda i, ss: cloth.cloth_substep(grid, cfg, ss)[0], s
            )

        return fold

    @jax.jit
    def settle(s):
        return jax.lax.fori_loop(
            0, settle_T, lambda i, ss: cloth.cloth_substep(grid, cfg, ss)[0], s
        )

    t0 = time.perf_counter()
    state = settle(state)
    for i, plan in enumerate(plans):
        state = make_fold(plan)(state)
        x = np.asarray(state.x)
        assert np.all(np.isfinite(x)), f"blow-up in fold {i}"
        print(f"fold {i}: x-extent {x[:,0].max()-x[:,0].min():.3f}, "
              f"y-extent {x[:,1].max()-x[:,1].min():.3f}, "
              f"z-top {np.percentile(x[:,2],95):.3f}")
    wall = time.perf_counter() - t0
    total = settle_T + len(plans) * (fold_T + settle_T)
    print(f"{total} substeps in {wall:.1f}s -> {total/wall:.0f} substeps/s")

    x = np.asarray(state.x)
    ext_x = x[:, 0].max() - x[:, 0].min()
    ext_y = x[:, 1].max() - x[:, 1].min()
    z_top = float(np.percentile(x[:, 2], 95))
    # Folded footprint: sleeves tucked to ~body width, length halved.
    ok = (ext_x < 0.36 and ext_y < 0.33 and z_top < 2 / 32 + 0.12)
    print(f"final footprint {ext_x:.3f} x {ext_y:.3f} m "
          f"(flat was 0.46 x 0.47), stack z-top {z_top:.3f}")

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "tshirt_folded.obj"), "w") as f:
            for v in x:
                f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}\n")
            for tri in np.asarray(state.faces):
                f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
    print("TSHIRT-FOLDING", "SUCCESS" if ok else "PARTIAL")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
