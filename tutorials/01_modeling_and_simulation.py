"""Tutorial 1: build a multibody model, simulate it, and differentiate it.

The drake_tpu analog of the reference's "dynamical systems" and
"authoring a multibody simulation" tutorials (tutorials/dynamical_systems.
ipynb, authoring_multibody_simulation.ipynb): everything is a pure function
over pytrees, so simulation, batching, and gradients compose from the same
building blocks.

Run:  python tutorials/01_modeling_and_simulation.py
(CPU, float64, runs in a few seconds.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# 1. Build a model.  ModelBuilder is the MultibodyPlant-authoring role: add
#    bodies with joints, masses, and frames, then build() freezes it into an
#    immutable (model, params) pair.  `model` holds the static topology;
#    `params` is a pytree of numbers you can differentiate with respect to.
# ---------------------------------------------------------------------------
from drake_tpu.multibody.model import ModelBuilder

builder = ModelBuilder()
builder.add_body(
    "link1", parent=None, joint_type="revolute", mass=1.0,
    com=(0.0, 0.0, -0.5), inertia_com=np.diag([0.083, 0.083, 0.01]),
    axis=(0, 1, 0),
)
builder.add_body(
    "link2", parent="link1", joint_type="revolute", mass=1.0,
    com=(0.0, 0.0, -0.5), inertia_com=np.diag([0.083, 0.083, 0.01]),
    axis=(0, 1, 0), X_PJ_xyz=(0.0, 0.0, -1.0),
)
model, params = builder.build(jnp.float64)
print(f"double pendulum: nq={model.num_positions} nv={model.num_velocities}")

# ---------------------------------------------------------------------------
# 2. Dynamics are plain functions.  forward_dynamics is the ABA/CRBA role;
#    it returns qdd given (q, v, tau).  Wrap it as a ContinuousSystem to get
#    the simulate/linearize conveniences.
# ---------------------------------------------------------------------------
from drake_tpu.multibody import dynamics as dyn
from drake_tpu.systems.base import ContinuousSystem


def f(p, x, u, t):
    q, v = x[:2], x[2:]
    qdd = dyn.forward_dynamics(model, p, q, v, u)
    return jnp.concatenate([v, qdd])


system = ContinuousSystem(f=f, num_states=4, num_inputs=2,
                          default_params=params)

# ---------------------------------------------------------------------------
# 3. Simulate.  simulate() is Simulator::AdvanceTo as one lax.scan — the
#    whole rollout jit-compiles, so repeated calls are microseconds.
# ---------------------------------------------------------------------------
from drake_tpu.systems.simulator import simulate

x0 = jnp.asarray([0.5, 0.0, 0.0, 0.0])
us = jnp.zeros((400, 2))  # passive
xs, ts = simulate(system, params, x0, us, dt=0.005, method="rk4")
print(f"simulated {len(ts)} steps; final q = {np.asarray(xs[-1, :2])}")

# Energy check: passive, conservative -> total energy constant.
from drake_tpu.multibody import kinematics as kin


def energy(x):
    q, v = x[:2], x[2:]
    M = dyn.mass_matrix(model, params, q)
    _, p_WB = kin.forward_kinematics(model, params, q)
    com_z = p_WB[:, 2] + jax.vmap(
        lambda R, c: (R @ c)[2])(
            kin.forward_kinematics(model, params, q)[0],
            params.com)
    return 0.5 * v @ M @ v + 9.81 * jnp.sum(params.mass * com_z)


e0, e1 = float(energy(xs[0])), float(energy(xs[-1]))
print(f"energy drift over 2 s: {abs(e1 - e0):.2e} (rk4, h=5 ms)")

# ---------------------------------------------------------------------------
# 4. Batch and differentiate — the reasons this framework exists.
#    vmap turns one rollout into a thousand; grad turns the rollout into a
#    loss gradient (the AutoDiffXd role, but through the entire trajectory).
# ---------------------------------------------------------------------------
batch_x0 = x0[None] + 0.01 * jax.random.normal(
    jax.random.PRNGKey(0), (32, 4))
batch_final = jax.vmap(
    lambda x: simulate(system, params, x, us, dt=0.005, method="rk4")[0][-1]
)(batch_x0)
print(f"batched rollouts: {batch_final.shape[0]} scenarios in one call")


def loss(x_init):
    traj, _ = simulate(system, params, x_init, us, dt=0.005, method="rk4")
    return jnp.sum(traj[-1, :2] ** 2)


g = jax.grad(loss)(x0)
print(f"d loss / d x0 = {np.asarray(g)}")
print("TUTORIAL 1 OK")
