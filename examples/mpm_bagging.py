"""Bagging: a cloth sheet catches and lifts a rigid ball — mpm_bagging.cc.

A cloth sheet is held at its four corners (scripted Dirichlet strips); a
free rigid ball drops onto it and the sheet sags into a pouch around the
ball (wrapped multi-particle contact).  The corners are then pulled up and
inward, closing the pouch; the ball is carried aloft purely by the two-way
MPM⇄rigid coupling (cloth contact impulses accumulate over the substeps
and enter the ball's SAP step as external spatial forces — the
FinalizeExternalContactForces path, reference deformable_driver.h:210-218,
demo examples/multibody/deformable/mpm_bagging.cc).

This exercises the cloth-coupled `CoupledWorld` (cloth_config set): every
substep applies cloth elastic forces, transfers through the grid, resolves
penalty contact against the CURRENT ball pose, and the ball's dynamics see
the bag's net wrench.

Run:  python examples/mpm_bagging.py [--cpu]
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
    ap.add_argument(
        "--implicit", dest="implicit", action="store_true", default=True,
        help="route cloth-rigid contact through the implicit grid-contact "
             "Newton (mpm/grid_contact.py) — the DEFAULT since round 5 "
             "(the stiction-capable path now runs 3.7x faster than round "
             "4; BASELINE.md round-5 implicit campaign)",
    )
    ap.add_argument(
        "--penalty", dest="implicit", action="store_false",
        help="explicit per-particle penalty contact instead",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from drake_tpu.contact.coupled_plant import CoupledState, CoupledWorld
    from drake_tpu.geometry import shapes as sh
    from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
    from drake_tpu.mpm import cloth
    from drake_tpu.mpm import coupling as cpl
    from drake_tpu.mpm import solver as mpm
    from drake_tpu.multibody.model import ModelBuilder

    F32 = jnp.float32

    # Rigid world: a free ball over a ground halfspace (if the bag fails
    # the ball lands on the floor and the checks catch it).
    r_ball = 0.07
    m_ball = 0.15
    b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
    b.add_body(
        "ball", parent=None, joint_type="floating", mass=m_ball,
        inertia_com=np.eye(3) * (0.4 * m_ball * r_ball**2),
    )
    model, params = b.build(F32)
    floor_z = 0.05
    geoms = [
        CollisionGeometry(name="ball", body=0, shape=sh.Sphere(r_ball),
                          friction=0.6, stiffness=1e5, dissipation=0.1),
        CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                          p_BG=np.array([0.0, 0.0, floor_z]),
                          friction=0.6, stiffness=1e7, dissipation=0.1),
    ]
    scene = CollisionScene.build(geoms)

    # No MPM grid walls: the trampoline never touches the floor, and the
    # sticky wall band would otherwise glue a floor-resting cloth in place.
    grid = mpm.MpmConfig(
        grid_size=(32, 32, 32), dx=1.0 / 32, dt=5e-5, wall_width=0
    )
    cfg = cloth.ClothConfig()
    z0 = 0.34  # taut sheet height: the trampoline
    nx = 22
    sheet = cloth.make_grid_cloth(cfg, nx, nx, origin=(0.3, 0.3, z0),
                                  size=(0.4, 0.4))
    pts0 = np.asarray(sheet.x)

    world = CoupledWorld(
        model=model, scene=scene, mpm_config=grid,
        contact_params=cpl.MpmContactParams(
            stiffness=3e4, damping=30.0, friction=0.6),
        coupled_geometries=(0,),  # the ball sphere
        substeps_per_step=20, time_step=1e-3,
        cloth_config=cfg,
        contact_model="implicit" if args.implicit else "penalty",
    )

    # Ball dropped from just above the sheet center.
    q0 = jnp.asarray([1, 0, 0, 0, 0.5, 0.5, z0 + r_ball + 0.02], F32)
    x_rigid = jnp.concatenate([q0, jnp.zeros(6, F32)])
    state = CoupledState(rigid=x_rigid, particles=sheet)

    # Corner grabs: the 4 corner vertex bunches.
    corners_xy = [(0.3, 0.3), (0.3, 0.7), (0.7, 0.3), (0.7, 0.7)]
    grabs, targets = [], []
    for cx, cy in corners_xy:
        d = np.linalg.norm(pts0[:, :2] - [cx, cy], axis=1)
        grabs.append(np.where(d < 0.035)[0])
        # converge toward just off-center, high up
        tx = 0.5 + 0.05 * np.sign(cx - 0.5)
        ty = 0.5 + 0.05 * np.sign(cy - 0.5)
        targets.append((tx, ty))
    grab = jnp.asarray(np.concatenate(grabs))
    g_start = jnp.asarray(pts0[np.concatenate(grabs)], F32)
    g_end = np.concatenate(
        [np.stack([np.full(len(g), t[0]) + (pts0[g, 0] - c[0]) * 0.25,
                   np.full(len(g), t[1]) + (pts0[g, 1] - c[1]) * 0.25,
                   np.full(len(g), z0 + 0.35)], axis=1)
         for g, t, c in zip(grabs, targets, corners_xy)])
    g_end = jnp.asarray(g_end, F32)

    settle_T, lift_T, hold_T = 500, 1200, 500
    tau0 = jnp.zeros(model.num_velocities, F32)

    def grab_pose(k):
        """Smoothstep lift profile over [settle_T, settle_T + lift_T]."""
        s = jnp.clip((k - settle_T) / lift_T, 0.0, 1.0)
        s2 = s * s * (3.0 - 2.0 * s)
        ds = jnp.where((s > 0) & (s < 1),
                       6.0 * s * (1.0 - s) / (lift_T * world.time_step), 0.0)
        pos = g_start + s2 * (g_end - g_start)
        vel = ds * (g_end - g_start)
        return pos.astype(F32), vel.astype(F32)

    @jax.jit
    def run(state, ks):
        def body(st, k):
            st = world.step(params, st, tau0)
            pos, vel = grab_pose(k)
            p = st.particles
            p = p.replace(x=p.x.at[grab].set(pos), v=p.v.at[grab].set(vel))
            st = CoupledState(rigid=st.rigid, particles=p)
            return st, st.rigid[6]  # ball z

        return jax.lax.scan(body, state, ks)

    total = settle_T + lift_T + hold_T
    t0 = time.perf_counter()
    state, ball_z = run(state, jnp.arange(total))
    z_rest = float(ball_z[settle_T - 1])
    z_final = float(ball_z[-1])
    wall = time.perf_counter() - t0
    print(f"{total * world.substeps_per_step} substeps in {wall:.1f}s -> "
          f"{total * world.substeps_per_step / wall:.0f} substeps/s")

    x = np.asarray(state.particles.x)
    qb = np.asarray(state.rigid[:7])
    print(f"ball z: rest {z_rest:.3f} -> lifted {z_final:.3f} "
          f"(floor+r = {floor_z + r_ball:.3f})")
    print(f"ball xy: ({qb[4]:.3f}, {qb[5]:.3f}) (bag centred at 0.5, 0.5)")
    assert np.all(np.isfinite(x)), "cloth blew up"
    lifted = z_final > z_rest + 0.10
    carried = abs(qb[4] - 0.5) < 0.1 and abs(qb[5] - 0.5) < 0.1
    held = z_final > floor_z + r_ball + 0.05  # not resting on the floor
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "bag.obj"), "w") as f:
            for v in x:
                f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}\n")
            for tri in np.asarray(state.particles.faces):
                f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
    ok = lifted and carried and held
    print("BAGGING", "SUCCESS" if ok else "FAIL",
          f"(lifted={lifted}, carried={carried}, held={held})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
