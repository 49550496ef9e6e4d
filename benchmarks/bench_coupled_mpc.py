"""Config-5 QUALITY-METERED benchmark: MPC through the coupled MPM+SAP plant.

VERDICT round-4 item 3: bench_coupled_world.py measures raw substeps/s;
this harness measures the thing the fork exists for — closed-loop
contact-rich MPC THROUGH the coupled deformable dynamics — with the same
metric shape as the iiwa headline: goal-reach %, median error, solves/s.

Scene: K perturbed scenarios of the paddle-pushes-soft-blob task
(examples/coupled_mpm_mpc.py); each scenario runs an MPPI controller
(M samples, horizon 10 coupled steps of 10 substeps) for N MPC steps —
all of it one jit: vmap over scenarios x vmap over MPPI samples x scan
over horizon and steps.  Reference role: the fork's deformable MPC stack
(deformable_driver.h:221-270 + the mpm_cloth demo set).

Run: python benchmarks/bench_coupled_mpc.py [--scenarios 32 --steps 20]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _harness

import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--scenarios", type=int, default=0, help="0 = default")
parser.add_argument("--samples", type=int, default=0)
parser.add_argument("--steps", type=int, default=0)
parser.add_argument(
    "--chunk", type=int, default=0,
    help="scenarios per call (0 = default 1 on TPU): the nested-vmap "
    "MPPI-through-coupled-dynamics program trips the TPU-runtime "
    "vmapped-solver worker fault (BASELINE.md round 4) at 64 lanes "
    "AND at 8x8; sequential 1-scenario chunks (8 MPPI lanes — the "
    "known-good scale) dodge it with ONE compile",
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
    from drake_tpu.control import mppi
    from drake_tpu.geometry import shapes as sh
    from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
    from drake_tpu.mpm import coupling as cpl
    from drake_tpu.mpm import solver as mpm
    from drake_tpu.multibody.model import ModelBuilder

    F32 = jnp.float32
    cpu = _harness.on_cpu()
    B = args.scenarios or (2 if cpu else 32)
    M = args.samples or (4 if cpu else 8)
    steps = args.steps or (3 if cpu else 50)

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
        xla_only=True,
    )
    world = coupled_plant.CoupledWorld(
        model=model, scene=scene, mpm_config=grid,
        contact_params=cpl.MpmContactParams(
            stiffness=5e4, damping=100.0, friction=0.3
        ),
        coupled_geometries=(0,), substeps_per_step=10, time_step=1e-2,
    )
    particles = mpm.make_particle_block(
        grid, (0.35, 0.42, 0.08), (0.45, 0.58, 0.18)
    )
    state0 = coupled_plant.CoupledState(
        rigid=jnp.asarray([0.31, 0.0], F32), particles=particles
    )
    goal_x = 0.55

    dyn = lambda s, u: world.step(params, s, u)
    centroid_x = lambda s: jnp.mean(s.particles.x[:, 0])

    def running(s, u):
        cx = centroid_x(s)
        gap = cx - (s.rigid[0] + 0.02)
        approach_on = jax.nn.sigmoid((goal_x - 0.03 - cx) / 0.01)
        vx = jnp.mean(s.particles.v[:, 0])
        return (
            200.0 * (cx - goal_x) ** 2
            + 5.0 * approach_on * gap * gap
            + 1.0 * (1.0 - approach_on) * vx * vx
            + 1e-6 * u[0] ** 2
        )

    final = lambda s: 200.0 * (centroid_x(s) - goal_x) ** 2
    opts = mppi.MppiOptions(
        num_samples=M, temperature=0.05, noise_sigma=8.0,
        u_lower=jnp.array([-25.0]), u_upper=jnp.array([25.0]),
    )

    def scenario(dx0, key):
        # Perturbed blob start: shift every particle (and keep the paddle
        # just behind the blob's new face).
        p = state0.particles
        p = p.replace(x=p.x.at[:, 0].add(dx0))
        s0 = coupled_plant.CoupledState(
            rigid=state0.rigid.at[0].add(dx0), particles=p
        )
        states, us, costs = mppi.mppi_mpc_rollout(
            dyn, running, final, s0, jnp.zeros((10, 1), F32), key,
            num_steps=steps, options=opts,
        )
        cx_end = jnp.mean(states.particles.x[-1][:, 0])
        finite = jnp.all(jnp.isfinite(states.particles.x[-1]))
        return cx_end, finite

    key = jax.random.PRNGKey(0)
    dx0s = 0.04 * (
        jax.random.uniform(key, (B,), F32) - 0.5
    )  # +-2 cm blob start spread
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    chunk = args.chunk or (B if cpu else 1)
    chunk = min(chunk, B)
    assert B % chunk == 0, (B, chunk)
    rollout = jax.jit(jax.vmap(scenario))

    def run_all(dx, ks):
        outs = [
            rollout(dx[i : i + chunk], ks[i : i + chunk])
            for i in range(0, B, chunk)
        ]
        cx = jnp.concatenate([o[0] for o in outs])
        fin = jnp.concatenate([o[1] for o in outs])
        return cx, fin

    cx, fin = run_all(dx0s, keys)
    float(cx.sum())  # warm + sync
    t0 = time.perf_counter()
    cx, fin = run_all(dx0s + 1e-6, keys)
    float(cx.sum())
    wall = time.perf_counter() - t0

    err = np.abs(np.asarray(cx) - goal_x)
    reached = int(np.sum((err < 0.06) & np.asarray(fin)))
    med = float(np.median(err))
    solves = B * steps / wall
    _harness.emit(
        f"coupled MPM+SAP MPC solves/s ({B} scenarios x {M} MPPI samples, "
        f"horizon 10x10 substeps, {reached}/{B} reach goal, "
        f"median err {med:.3f} m"
        + (", CPU FALLBACK" if cpu else "") + ")",
        solves,
        "solves/s",
        # Round-5 committed measurement (this config) = the baseline.
        2.3,
    )


if __name__ == "__main__":
    main()
