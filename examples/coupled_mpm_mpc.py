"""Baseline config 5: contact-rich MPC over the coupled MPM+rigid plant.

An actuated rigid paddle (prismatic slide) must push a soft MPM blob to a
goal position.  The controller is MPPI (drake_tpu.control.mppi): batched
rollouts of the FULL coupled pipeline — MPM substeps against live rigid
poses, impulse accumulation, SAP rigid step — reweighted by cost.  This is
the role of the reference's GPU-MPM contact-rich MPC stack
(deformable_driver.h:221-270 + arXiv:2503.05046), built TPU-first: the
sample axis vmaps, the horizon scans, everything jits end to end.

Run:  python examples/coupled_mpm_mpc.py --cpu    (small, f32, ~2 min)
      python examples/coupled_mpm_mpc.py          (TPU, bigger batch)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--samples", type=int, default=None)
parser.add_argument("--steps", type=int, default=50)
parser.add_argument(
    "--html", type=str, default=None,
    help="record the closed-loop push as a standalone meshcat HTML animation",
)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from drake_tpu.contact import coupled_plant
from drake_tpu.control import mppi
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.mpm import coupling as cpl
from drake_tpu.mpm import solver as mpm
from drake_tpu.multibody.model import ModelBuilder

F32 = jnp.float32
on_cpu = jax.default_backend() == "cpu"
K = args.samples or (8 if on_cpu else 64)

# --- world: sliding paddle + soft blob on the ground ------------------------
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
        p_BG=jnp.asarray([0.0, 0.0, 0.15], F32),
    ),
]
scene = CollisionScene.build(geoms)
grid = mpm.MpmConfig(
    grid_size=(32, 32, 32), dx=1.0 / 32, dt=1e-3, wall_width=2,
    youngs_modulus=3e4,
    max_active_blocks=64, block_capacity=512,
    # Pure-XLA MPM: the Pallas P2G faults the TPU worker under MPPI's vmap
    # (see MpmConfig.xla_only); at 360 particles the scatter path is cheap.
    xla_only=True,
)
world = coupled_plant.CoupledWorld(
    model=model, scene=scene, mpm_config=grid,
    contact_params=cpl.MpmContactParams(
        stiffness=5e4, damping=100.0, friction=0.3
    ),
    coupled_geometries=(0,),
    substeps_per_step=10, time_step=1e-2,
)
particles = mpm.make_particle_block(grid, (0.35, 0.42, 0.08), (0.45, 0.58, 0.18))
state0 = coupled_plant.CoupledState(
    rigid=jnp.asarray([0.31, 0.0], F32), particles=particles
)
goal_x = 0.55
print(f"particles: {particles.x.shape[0]}, samples K={K}, "
      f"horizon 10, steps {args.steps}, backend {jax.default_backend()}")

# --- MPPI through the coupled dynamics --------------------------------------
dyn = lambda s, u: world.step(params, s, u)
centroid_x = lambda s: jnp.mean(s.particles.x[:, 0])


def running(s, u):
    cx = centroid_x(s)
    # Approach shaping (same trick as the iiwa push MPC): keep the paddle
    # face at the blob so the goal term has leverage within the horizon —
    # but only while the blob is still short of the goal, so the paddle
    # backs off instead of bulldozing through.
    gap = cx - (s.rigid[0] + 0.02)
    approach_on = jax.nn.sigmoid((goal_x - 0.03 - cx) / 0.01)
    vx = jnp.mean(s.particles.v[:, 0])
    return (
        200.0 * (cx - goal_x) ** 2
        + 5.0 * approach_on * gap * gap
        + 1.0 * (1.0 - approach_on) * vx * vx  # brake at the goal
        + 1e-6 * u[0] ** 2
    )


final = lambda s: 200.0 * (centroid_x(s) - goal_x) ** 2
opts = mppi.MppiOptions(
    num_samples=K, temperature=0.05, noise_sigma=8.0,
    u_lower=jnp.array([-25.0]), u_upper=jnp.array([25.0]),
)

solve = jax.jit(
    lambda k: mppi.mppi_mpc_rollout(
        dyn, running, final, state0, jnp.zeros((10, 1), F32), k,
        num_steps=args.steps, options=opts,
    )
)
t0 = time.perf_counter()
states, us, costs = solve(jax.random.PRNGKey(0))
x_end = float(jnp.mean(states.particles.x[-1][:, 0]))  # also syncs
t_compile = time.perf_counter() - t0
t0 = time.perf_counter()
states, us, costs = solve(jax.random.PRNGKey(1))
x_end = float(jnp.mean(states.particles.x[-1][:, 0]))
t_run = time.perf_counter() - t0

x0 = float(jnp.mean(particles.x[:, 0]))
per_step = t_run / args.steps
# One MPC step = K rollouts x horizon 10 coupled steps x 10 substeps.
print(f"compile {t_compile:.0f}s; {per_step*1e3:.0f} ms/MPC-step "
      f"({K * 10 * world.substeps_per_step / per_step:.0f} coupled substeps/s)")
print(f"blob centroid x: {x0:.3f} -> {x_end:.3f} (goal {goal_x})")
finite = bool(jnp.all(jnp.isfinite(states.particles.x)))
moved = x_end - x0
if finite and x_end > goal_x - 0.06:
    print(f"COUPLED MPC SUCCESS: pushed {moved:.3f} m to within "
          f"{abs(x_end - goal_x):.3f} of goal")
elif finite and moved > 0.03:
    print(f"COUPLED MPC PARTIAL: pushed {moved:.3f} m (finite, "
          f"{abs(x_end - goal_x):.3f} from goal)")
else:
    print("COUPLED MPC FAILED")

# --- optional meshcat HTML animation recording ------------------------------
if args.html:
    from drake_tpu.viz.meshcat import Meshcat, MeshcatAnimation

    viz = Meshcat()
    fps = 1.0 / world.time_step
    anim = MeshcatAnimation(frames_per_second=min(fps, 30.0))
    # Static ground plane for context.
    viz.set_object("ground", sh.Box((1.0, 1.0, 0.02)),
                   color=0x9999AA, p=(0.5, 0.5, -0.01))
    # Paddle: one box whose transform animates.
    viz.set_object("paddle", sh.Box((0.02, 0.3, 0.3)), color=0x3366CC)
    xs_np = np.asarray(states.rigid)  # (steps, 2) [q, v]
    pts_np = np.asarray(states.particles.x)  # (steps, n, 3)
    stride = max(1, args.steps // 60)  # cap the recording size
    frames = list(range(0, args.steps, stride))
    for f_idx, k in enumerate(frames):
        anim.set_transform(
            f_idx, "paddle", p=(float(xs_np[k, 0]), 0.5, 0.15)
        )
        # Blob: per-frame point clouds flipped by a visibility track (the
        # way meshcat animates topology-changing data).
        path = f"blob/frame{f_idx:03d}"
        viz.set_points(path, pts_np[k].T.astype(np.float32),
                       colors=None, size=0.012)
        viz.set_property(path, "visible", f_idx == 0)
        for other in range(len(frames)):
            anim.set_property(other, path, "visible", "boolean",
                              other == f_idx)
    viz.set_animation(anim)
    with open(args.html, "w") as f:
        f.write(viz.static_html())
    print(f"wrote meshcat animation: {args.html} "
          f"({len(frames)} frames, {pts_np.shape[1]} particles)")
