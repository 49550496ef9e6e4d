"""Tutorial 4: MPM deformables and multi-device parallelism.

Part A drives the codimensional cloth MPM (the fork's GPU-MPM flagship,
multibody/gpu_mpm/* in the reference) on a small grid.  Part B shows the
scaling model: vmap for batch parallelism, then shard_map over a device
Mesh for multi-chip data parallelism — the design that replaces the
reference's thread-pool BatchEval and NCCL paths.

Run:  python tutorials/04_deformables_and_parallelism.py   (CPU, ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# 8 virtual devices BEFORE jax initializes (multi-chip rehearsal on CPU).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# A. Cloth MPM: a 12x12 patch settles onto a rigid sphere with two-way
#    contact coupling (reference examples/multibody/deformable/mpm_cloth.cc).
# ---------------------------------------------------------------------------
from drake_tpu.geometry import shapes as sh
from drake_tpu.mpm import cloth
from drake_tpu.mpm import coupling as cpl
from drake_tpu.mpm import solver as mpm

F32 = jnp.float32
cfg = cloth.ClothConfig()
grid = mpm.MpmConfig(grid_size=(32, 32, 32), dx=1.0 / 32, dt=5e-5,
                     wall_width=0)
patch = cloth.make_grid_cloth(cfg, 12, 12, origin=(0.3, 0.3, 0.55),
                              size=(0.4, 0.4))
sphere = cpl.RigidGeom(
    shape=sh.Sphere(0.12), body_index=0,
    R_WG=jnp.eye(3, dtype=F32),
    p_WG=jnp.asarray([0.5, 0.5, 0.35], F32),
    p_WB=jnp.asarray([0.5, 0.5, 0.35], F32),
    V_WB=jnp.zeros(6, F32),
)
contact = cpl.MpmContactParams(stiffness=3e4, damping=30.0, friction=0.5)

step = jax.jit(
    lambda s: cloth.simulate_cloth(grid, cfg, s, 400, [sphere], contact))
state = patch
for frame in range(4):
    state, acc = step(state)
z_lo, z_hi = float(state.x[:, 2].min()), float(state.x[:, 2].max())
print(f"cloth after 0.08 s: z in [{z_lo:.3f}, {z_hi:.3f}] "
      f"(sphere top at 0.47)")
assert np.isfinite(np.asarray(state.x)).all()
assert z_lo > 0.33, "cloth should be caught by the sphere, not fall through"

# ---------------------------------------------------------------------------
# B. Parallelism.  Level 1: vmap — N scenarios in one XLA program.
# ---------------------------------------------------------------------------
from drake_tpu.models import pendulum
from drake_tpu.systems.simulator import simulate

params = pendulum.default_params(jnp.float32)
system = pendulum.make_system(params)
us = jnp.zeros((100, 1), jnp.float32)

batch_x0 = jnp.stack([
    jnp.asarray([th, 0.0], jnp.float32)
    for th in np.linspace(-1.0, 1.0, 64)
])


def rollout_final(x0):
    xs, _ = simulate(system, params, x0, us, dt=0.01, method="rk4")
    return xs[-1]


finals = jax.jit(jax.vmap(rollout_final))(batch_x0)
print(f"vmap: {finals.shape[0]} pendulum rollouts in one call")

# ---------------------------------------------------------------------------
#    Level 2: shard the batch over a device Mesh.  On real hardware the same
#    code spans TPU chips over ICI; here it spans 8 virtual CPU devices.
#    This is the whole multi-chip story: annotate shardings, let XLA insert
#    the collectives (jax-ml.github.io/scaling-book recipe).
# ---------------------------------------------------------------------------
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devices = np.array(jax.devices())
mesh = Mesh(devices, axis_names=("data",))
sharded_x0 = jax.device_put(batch_x0, NamedSharding(mesh, P("data", None)))
finals_sharded = jax.jit(jax.vmap(rollout_final))(sharded_x0)
print(f"mesh: batch sharded over {len(devices)} devices -> "
      f"output sharding {finals_sharded.sharding.spec}")
np.testing.assert_allclose(
    np.asarray(finals_sharded), np.asarray(finals), rtol=1e-6)

# A cross-device reduction (the psum that would ride ICI on hardware):
mean_final = jax.jit(
    lambda xs: jnp.mean(xs, axis=0), in_shardings=NamedSharding(
        mesh, P("data", None)))(finals_sharded)
print(f"cross-device mean final state: {np.asarray(mean_final).round(4)}")
print("TUTORIAL 4 OK")
