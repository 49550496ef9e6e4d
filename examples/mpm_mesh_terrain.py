"""MPM cloth on NON-convex rigid mesh terrain — the MeshSdf coupling demo.

The reference fork's MPM demos contact rigid meshes through per-substep
CPU SceneGraph signed-distance queries (deformable_driver.h:120-196 —
SyncParticleStateToCpu, then FCL per particle).  Here the mesh is baked
once into a MeshSdf voxel grid and the particle contact stays ON DEVICE
inside the fused substep: a cloth patch drapes into a terrain dip that a
convex-hull mesh proxy would fill.

Run: python examples/mpm_mesh_terrain.py [--cpu] [--frames N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--frames", type=int, default=14)
    parser.add_argument("--substeps-per-frame", type=int, default=600)
    parser.add_argument(
        "--meshcat-html", default="",
        help="bake the rollout into a standalone meshcat HTML file")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    F32 = jnp.float32

    from drake_tpu.geometry import shapes as sh
    from drake_tpu.geometry.mesh_io import make_terrain_mesh
    from drake_tpu.mpm import cloth
    from drake_tpu.mpm import coupling as cpl
    from drake_tpu.mpm import solver as mpm

    # Terrain: 0.6 x 0.6 m plateau at z=0.35 with a Gaussian dip to z=0.20,
    # inside the unit MPM domain.  Watertight solid, baked once.
    n = 11
    xs = np.linspace(0.2, 0.8, n)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    h = 0.35 - 0.15 * np.exp(-(((X - 0.5) ** 2 + (Y - 0.5) ** 2) / (2 * 0.15**2)))
    verts, faces = make_terrain_mesh(h, 0.2, 0.2, xs[1] - xs[0], 0.08)
    terrain = sh.MeshSdf.from_mesh(verts, faces, resolution=48)
    dip_z, rim_z = float(h.min()), float(h.max())

    cfg = cloth.ClothConfig()
    grid = mpm.MpmConfig(
        grid_size=(32, 32, 32), dx=1.0 / 32, dt=5e-5, wall_width=0
    )
    c = cloth.make_grid_cloth(
        cfg, 16, 16, origin=(0.32, 0.32, 0.45), size=(0.36, 0.36)
    )
    geom = cpl.RigidGeom(
        shape=terrain, body_index=-1,
        R_WG=jnp.eye(3, dtype=F32), p_WG=jnp.zeros(3, F32),
        p_WB=jnp.zeros(3, F32), V_WB=jnp.zeros(6, F32),
    )
    params = cpl.MpmContactParams(stiffness=3e4, damping=30.0, friction=0.5)

    step = jax.jit(
        lambda s: cloth.simulate_cloth(
            grid, cfg, s, args.substeps_per_frame, [geom], params
        )
    )

    state = c
    frames = [np.asarray(c.x)]
    t0 = time.perf_counter()
    fz = 0.0
    for frame in range(args.frames):
        state, acc = step(state)
        frames.append(np.asarray(state.x))
        zc = float(state.x[:, 2].mean())
        z_lo = float(state.x[:, 2].min())
        fz = float(-acc[0, 5]) / (args.substeps_per_frame * grid.dt)
        print(
            f"frame {frame}: mean z {zc:.3f}, min z {z_lo:.3f} "
            f"(rim {rim_z:.2f}, dip {dip_z:.2f}), support {fz:.2f} N"
        )
        if not bool(jnp.all(jnp.isfinite(state.x))):
            print("MESH-TERRAIN FAILURE (non-finite)")
            return 1
    wall = time.perf_counter() - t0
    total = args.frames * args.substeps_per_frame
    print(
        f"{total} substeps in {wall:.1f}s -> {total / wall:.0f} substeps/s "
        f"({c.x.shape[0]} verts)"
    )

    if args.meshcat_html:
        from drake_tpu.viz import mpm_visualization as mviz
        from drake_tpu.viz.meshcat import Meshcat

        viz = Meshcat()
        viz.set_triangle_mesh(
            "terrain", np.asarray(verts, np.float32).T,
            np.asarray(faces, np.uint32).T, color=0x886644
        )
        mviz.record_mpm_rollout(
            viz, "cloth", frames, faces=np.asarray(c.faces),
            frames_per_second=8.0
        )
        with open(args.meshcat_html, "w") as f:
            f.write(viz.static_html())
        print(f"meshcat recording -> {args.meshcat_html}")

    # Success: the cloth center drapes INTO the dip (below the rim plane —
    # impossible under a convex-hull terrain proxy), it rests ON the
    # surface (not through it), and the terrain carries ~the cloth weight.
    center = frames[-1][:, :2] - 0.5
    central = np.linalg.norm(center, axis=1) < 0.08
    z_central = float(frames[-1][central, 2].mean())
    weight = float(c.mass.sum()) * 9.81
    in_dip = z_central < rim_z - 0.02
    above = float(frames[-1][:, 2].min()) > dip_z - 0.05
    supported = abs(fz - weight) < 0.6 * weight
    ok = in_dip and above and supported
    print(
        f"central cloth z {z_central:.3f} (rim {rim_z:.2f}) "
        f"support {fz:.2f} N vs weight {weight:.2f} N"
    )
    print("MESH-TERRAIN", "SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
