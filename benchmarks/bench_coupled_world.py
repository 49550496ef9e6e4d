"""Coupled MPM+rigid batched substeps/s (BASELINE.md config-5 row).

K parallel rollouts of the FULL coupled pipeline (MPM substeps against live
rigid poses -> impulse accumulation -> SAP rigid step), the role of the
fork's GPU-MPM coupled stack (reference deformable_driver.h:221-270).
This is the batched-MPM-MPC inner loop: vmap over the sample axis, scan
over the horizon, one jit.  vs_baseline is the ratio to the round-1 CPU
measurement (2,240 coupled substeps/s at K=8) — the TPU number VERDICT r1
asked for.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _harness

import argparse

parser = argparse.ArgumentParser()
parser.add_argument(
    "--implicit", action="store_true",
    help="grid-level implicit contact Newton on the tile pipeline "
         "(mpm/tiles_contact.py) instead of the explicit penalty",
)
parser.add_argument("--max-iters", type=int, default=0,
                    help="with --implicit: Newton iteration cap "
                         "(0 = GridContactParams default 20)")
parser.add_argument("--ls-points", type=int, default=0,
                    help="with --implicit: exact line-search bracket points "
                         "(0 = default 12)")
parser.add_argument("--ls-levels", type=int, default=0,
                    help="with --implicit: bracket refinement passes "
                         "(0 = default 2; 1 = single-level + secant)")
parser.add_argument("--ext-factor", type=int, default=0,
                    help="with --implicit: closure capacity factor "
                         "(0 = default 4)")
parser.add_argument(
    "--unroll", type=int, default=0,
    help="with --implicit: fixed-iteration Newton (rollout fast path, "
         "GridContactParams.unroll_iterations).  CAUTION: faults the "
         "TPU runtime at K >= ~16 vmapped lanes (BASELINE.md round 4); "
         "CPU / small-K only",
)
args = parser.parse_args()

if __name__ == "__main__":
    _harness.tpu_or_cpu_fallback()

import jax
import jax.numpy as jnp
import numpy as np

if _harness.on_cpu():
    jax.config.update("jax_platforms", "cpu")


def main():
    from drake_tpu.contact import coupled_plant
    from drake_tpu.geometry import shapes as sh
    from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
    from drake_tpu.mpm import coupling as cpl
    from drake_tpu.mpm import grid_contact as gc
    from drake_tpu.mpm import solver as mpm
    from drake_tpu.multibody.model import ModelBuilder

    F32 = jnp.float32
    cpu = _harness.on_cpu()
    K = 8 if cpu else 64
    horizon = 10

    b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
    b.add_body(
        "paddle", parent=None, joint_type="prismatic", mass=2.0,
        inertia_com=np.eye(3) * 1e-3, axis=(1, 0, 0), damping=5.0,
        joint_name="slide", X_PJ_xyz=(0.0, 0.5, 0.0),
    )
    model, params = b.build(F32)
    geoms = [
        CollisionGeometry(
            name="paddle", body=0, shape=sh.Box((0.02, 0.3, 0.3)),
            friction=0.5, stiffness=1e5, dissipation=0.1,
            p_BG=np.asarray([0.0, 0.0, 0.15]),
        ),
    ]
    scene = CollisionScene.build(geoms)
    grid = mpm.MpmConfig(
        grid_size=(32, 32, 32), dx=1.0 / 32, dt=1e-3, wall_width=2,
        youngs_modulus=3e4, max_active_blocks=64, block_capacity=512,
        # The Pallas kernels are batch-safe (custom_vmap folds the sample
        # axis into the kernel grid); at this particle count the XLA
        # scatter path wins, so it stays the default on both backends.
        xla_only=True,
    )
    world = coupled_plant.CoupledWorld(
        model=model, scene=scene, mpm_config=grid,
        contact_params=cpl.MpmContactParams(
            stiffness=5e4, damping=100.0, friction=0.3
        ),
        coupled_geometries=(0,),
        substeps_per_step=10, time_step=1e-2,
        contact_model="implicit" if args.implicit else "penalty",
        grid_contact_params=(
            gc.GridContactParams(
                stiffness=5e4, damping=100.0, friction=0.3,
                unroll_iterations=args.unroll,
                max_iterations=args.max_iters or 20,
                line_search_points=args.ls_points or 12,
                line_search_levels=args.ls_levels or 2,
                # Scene-sized closure capacity (round-5 measured lever:
                # 153 -> 564 substeps/s; the per-iteration window ops
                # scale with it).  Overflow would show as dropped > 0,
                # asserted below — never silent.
                ext_capacity_factor=args.ext_factor or 1,
            )
            if args.implicit
            else None
        ),
    )
    particles = mpm.make_particle_block(
        grid, (0.35, 0.42, 0.08), (0.45, 0.58, 0.18)
    )
    state0 = coupled_plant.CoupledState(
        rigid=jnp.asarray([0.31, 0.0], F32), particles=particles
    )
    states = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (K,) + a.shape), state0
    )
    us = 5.0 * jnp.sin(
        jnp.arange(K * horizon, dtype=F32).reshape(K, horizon, 1)
    )

    @jax.jit
    def rollout(ss, uu):
        def one(s, u_seq):
            def body(s, u):
                s = world.step(params, s, u)
                return s, ()

            s, _ = jax.lax.scan(body, s, u_seq)
            return s

        return jax.vmap(one)(ss, uu)

    out = rollout(states, us)
    float(out.particles.x.sum())
    # Timed call on DIFFERENT inputs — the TPU tunnel caches repeated
    # identical dispatches (BASELINE.md round-3 timing discipline).
    t0 = time.perf_counter()
    out = rollout(states, us * 1.0001)
    float(out.particles.x.sum())
    wall = time.perf_counter() - t0

    assert bool(jnp.all(jnp.isfinite(out.particles.x))), "non-finite"
    n_sub = K * horizon * world.substeps_per_step
    _harness.emit(
        f"coupled MPM+SAP batched substeps/s (K={K} rollouts, "
        f"{particles.x.shape[0]} particles, two-way impulses"
        + (", implicit grid contact" if args.implicit else "")
        + (f" unroll={args.unroll}" if args.implicit and args.unroll else "")
        + (", CPU FALLBACK" if cpu else "") + ")",
        n_sub / wall,
        "substeps/s",
        2240.0,
    )


if __name__ == "__main__":
    main()
