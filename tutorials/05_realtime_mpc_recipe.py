"""Tutorial 5: the real-time contact-MPC recipe — how 60 became 1000.

This tutorial walks the exact performance levers that took the iiwa
contact-implicit MPC from 59.9 to ~1000 solves/s/chip (BASELINE.md round-2
ladder), on a problem small enough to run on CPU in under a minute.  The
levers generalize to any receding-horizon solver on TPU:

  1. BATCH: the chip is op-dispatch-bound at robot-scale shapes — batch
     scenarios with vmap until utilization saturates.
  2. FIXED-TRIP-COUNT inner solvers for the PLANNING dynamics
     (SapParameters.unroll_iterations): a while_loop inside vmap runs every
     lane to the slowest lane's trip count; a fixed-N scan doesn't.
  3. REAL-TIME ITERATION schedule: one heavy cold-start solve plans, then
     each period runs ONE warm-started Newton step (ilqr.rti_solve) — the
     fused step gets the linearization rollout and the Jacobians from a
     single vjp pass per knot.
  4. FREE MONOTONICITY GUARD: the RTI rollout already prices the warm
     start, so a cost-increasing step can be rejected wholesale for free —
     always-accept RTI without it quietly degrades the hard lanes.
  5. LANE FREEZE: one diverged f32 lane must not poison batch statistics —
     freeze it (mpc.ilqr_mpc_rollout does this) and report it.

Run:  python tutorials/05_realtime_mpc_recipe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from drake_tpu.control import mpc
from drake_tpu.models import quadrotor
from drake_tpu.systems import base as sysbase
from drake_tpu.trajopt import ilqr

F32 = jnp.float32

# ---------------------------------------------------------------------------
# Problem: quadrotor point-to-point MPC (12 states, 4 inputs, horizon 20).
# Small enough for CPU; the recipe is identical for the contact plant.
# ---------------------------------------------------------------------------
system = quadrotor.make_system(quadrotor.default_params(F32))
params = system.default_params
dt = 0.02
dsys = sysbase.discretize(system, dt, "rk4")
u_h = quadrotor.hover_input(params)
x_goal = jnp.zeros(12, F32).at[0].set(1.0).at[2].set(0.5)


def running_cost(p, x, u, t):
    return 0.05 * jnp.sum((u - u_h) ** 2) + 0.1 * jnp.sum((x - x_goal) ** 2)


def final_cost(p, x):
    return 50.0 * jnp.sum((x - x_goal) ** 2)


us0 = jnp.tile(u_h[None], (20, 1))
key = jax.random.PRNGKey(0)
BATCH, STEPS = 64, 12
x0s = jnp.zeros((BATCH, 12), F32).at[:, :3].set(
    0.2 * jax.random.normal(key, (BATCH, 3), F32)
)


def bench(label, options, first_options=None):
    def scenario(x0):
        return mpc.ilqr_mpc_rollout(
            dsys.g, running_cost, final_cost, params, x0, us0, STEPS,
            dt=dt, u_lower=jnp.zeros(4, F32), u_upper=jnp.full(4, 4.0, F32),
            options=options, first_options=first_options,
        )

    f = jax.jit(jax.vmap(scenario))
    res = f(x0s)
    float(res.xs.sum())  # compile + sync
    t0 = time.perf_counter()
    res = f(x0s)
    float(res.xs.sum())
    wall = time.perf_counter() - t0
    err = jnp.linalg.norm(res.xs[:, -1, :3] - x_goal[:3], axis=1)
    print(f"  {label:<46s} {BATCH*STEPS/wall:8.1f} solves/s   "
          f"median err {float(jnp.median(err)):.3f}")
    return BATCH * STEPS / wall


print(f"batch={BATCH} scenarios x {STEPS} MPC steps, CPU (levers transfer "
      "to TPU at ~100x the throughput):")

# Lever 0 (baseline): every period pays a 4-iteration solve with the full
# 6-alpha line search.
r0 = bench("baseline: 4 iters / 6 alphas every period",
           ilqr.IlqrOptions(max_iters=4))

# Lever 3: RTI schedule — heavy FIRST solve (planning), then 1-iteration
# tracking solves.
r1 = bench("RTI schedule: heavy first, 1-iter tracking",
           ilqr.IlqrOptions(max_iters=1),
           first_options=ilqr.IlqrOptions(max_iters=6))

# Levers 3+4: the FUSED one-Newton-step RTI solve (rti=True) — one vjp pass
# per knot gives rollout + Jacobians, no line search, free monotonicity
# guard.
r2 = bench("fused rti_solve tracking (the round-2 winner)",
           ilqr.IlqrOptions(rti=True),
           first_options=ilqr.IlqrOptions(max_iters=6))

print(f"\nspeedups vs baseline: RTI {r1/r0:.2f}x, fused RTI {r2/r0:.2f}x")
print("On the TPU contact problem the same ladder measured "
      "59.9 -> 531 -> 998 solves/s/chip (BASELINE.md).")
assert r2 > r0, "fused RTI should beat the every-period full solve"
print("TUTORIAL 5 OK")
