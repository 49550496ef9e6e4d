"""Cloth drape demo — the mpm_cloth.cc analog.

Drops a cloth patch onto a rigid sphere (the reference fork's flagship demo,
examples/multibody/deformable/mpm_cloth.cc) using the codimensional cloth
MPM with on-device rigid coupling, and dumps OBJ frames like the reference's
GpuMpmSolver::Dump.

Run: python examples/mpm_cloth_demo.py [--cpu] [--frames N] [--out DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def write_obj(path, vertices, faces):
    """Minimal OBJ dump (cuda_mpm_solver.cu Dump :169 role)."""
    with open(path, "w") as f:
        for v in np.asarray(vertices):
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in np.asarray(faces):
            f.write(f"f {tri[0] + 1} {tri[1] + 1} {tri[2] + 1}\n")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--frames", type=int, default=10)
    parser.add_argument("--substeps-per-frame", type=int, default=800)
    parser.add_argument("--out", default="/tmp/mpm_cloth_frames")
    parser.add_argument(
        "--publish", action="store_true",
        help="publish the cloth mesh over the typed wire while simulating "
        "(the fork's DrakeVisualizer MPM path: topology once on "
        "DEFORMABLE_MESHES_INIT, vertices per frame on _UPDATE)")
    parser.add_argument(
        "--meshcat-html", default="",
        help="also bake the rollout into a standalone meshcat HTML file "
        "(the fork's MeshcatVisualizer MpmPortData path)")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    F32 = jnp.float32

    from drake_tpu.geometry import shapes as sh
    from drake_tpu.mpm import cloth
    from drake_tpu.mpm import coupling as cpl
    from drake_tpu.mpm import solver as mpm

    cfg = cloth.ClothConfig()
    grid = mpm.MpmConfig(grid_size=(32, 32, 32), dx=1.0 / 32, dt=5e-5, wall_width=0)
    c = cloth.make_grid_cloth(cfg, 16, 16, origin=(0.28, 0.28, 0.62), size=(0.44, 0.44))
    sphere = cpl.RigidGeom(
        shape=sh.Sphere(0.12), body_index=0,
        R_WG=jnp.eye(3, dtype=F32),
        p_WG=jnp.asarray([0.5, 0.5, 0.35], F32),
        p_WB=jnp.asarray([0.5, 0.5, 0.35], F32),
        V_WB=jnp.zeros(6, F32),
    )
    params = cpl.MpmContactParams(stiffness=3e4, damping=30.0, friction=0.5)

    step = jax.jit(
        lambda s: cloth.simulate_cloth(
            grid, cfg, s, args.substeps_per_frame, [sphere], params
        )
    )

    os.makedirs(args.out, exist_ok=True)
    wire_pub = wire_sub = None
    if args.publish:
        from drake_tpu.io import messages as msgs
        from drake_tpu.io.pubsub import PubSub
        from drake_tpu.viz.mpm_visualization import (
            DeformableMeshWirePublisher,
        )

        node = PubSub("memq://")
        wire_sub = msgs.TypedSubscriber(
            node, "DEFORMABLE_MESHES_UPDATE",
            msgs.experimental_lcmt_deformable_tri_meshes_update)
        wire_pub = DeformableMeshWirePublisher(
            node, [("cloth", np.asarray(c.faces), int(c.x.shape[0]))])
    state = c
    mesh_frames = [np.asarray(c.x)]
    t0 = time.perf_counter()
    for frame in range(args.frames):
        state, acc = step(state)
        mesh_frames.append(np.asarray(state.x))
        zr = (float(state.x[:, 2].min()), float(state.x[:, 2].max()))
        fz = float(-acc[0, 5]) / (args.substeps_per_frame * grid.dt)
        write_obj(os.path.join(args.out, f"cloth_{frame:04d}.obj"), state.x, c.faces)
        if wire_pub is not None:
            wire_pub.publish(frame * args.substeps_per_frame * grid.dt,
                             [np.asarray(state.x)])
        print(f"frame {frame}: z [{zr[0]:.3f}, {zr[1]:.3f}] support {fz:.2f} N")
        if not bool(jnp.all(jnp.isfinite(state.x))):
            print("CLOTH FAILURE (non-finite)")
            return 1
    wall = time.perf_counter() - t0
    total = args.frames * args.substeps_per_frame
    print(f"{total} substeps in {wall:.1f}s -> {total / wall:.0f} substeps/s "
          f"({c.x.shape[0]} verts); OBJ frames in {args.out}")
    if wire_sub is not None:
        got = wire_sub.poll()
        print(f"wire: {wire_sub.count} DEFORMABLE_MESHES_UPDATE messages, "
              f"last timestamp {got.timestamp} us, "
              f"{got.meshes[0].vertices_W.shape[0]} verts")
    if args.meshcat_html:
        from drake_tpu.viz import mpm_visualization as mviz
        from drake_tpu.viz.meshcat import Meshcat

        viz = Meshcat()
        viz.set_object("sphere", sh.Sphere(0.12), color=0xAAAAAA)
        viz.set_transform("sphere", p=np.asarray(sphere.p_WG))
        mviz.record_mpm_rollout(
            viz, "cloth", mesh_frames, faces=np.asarray(c.faces),
            frames_per_second=8.0)
        with open(args.meshcat_html, "w") as f:
            f.write(viz.static_html())
        print(f"meshcat recording -> {args.meshcat_html}")
    weight = float(c.mass.sum()) * 9.81
    ok = abs(fz - weight) < 0.5 * weight  # settled support ~ cloth weight
    print("CLOTH-DRAPE", "SUCCESS" if ok else "PARTIAL (still settling)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
