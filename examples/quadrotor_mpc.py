"""Quadrotor receding-horizon MPC with obstacle, batched scenarios.

Baseline config-3 demo (BASELINE.json: "quadrotor receding-horizon MPC with
obstacle constraints, 4k batched scenarios").  Each scenario runs the
closed-loop iLQR MPC (the reference's LinearModelPredictiveController role,
nonlinear and contact-free here) from a randomized start toward a goal past
a spherical obstacle; the scenario batch is vmapped and sharded over the
device mesh.

Run: python examples/quadrotor_mpc.py [--cpu] [--batch N] [--steps T]
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
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--steps", type=int, default=25)
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dtype = jnp.float32

    from drake_tpu.control import mpc
    from drake_tpu.models import quadrotor
    from drake_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
    from drake_tpu.systems import base as sysbase
    from drake_tpu.trajopt import ilqr

    system = quadrotor.make_system(quadrotor.default_params(dtype))
    params = system.default_params
    dt = 0.02
    dsys = sysbase.discretize(system, dt, "rk4")
    u_h = quadrotor.hover_input(params)

    x_goal = jnp.zeros(12, dtype).at[0].set(2.0).at[2].set(1.0)
    obst = jnp.asarray([1.0, 0.0, 0.5], dtype)
    r_obs = 0.4

    def running_cost(p, x, u, t):
        d2 = jnp.sum((x[:3] - obst) ** 2)
        pen = jnp.maximum(0.0, r_obs**2 - d2) ** 2 * 100.0
        return (
            0.05 * jnp.sum((u - u_h) ** 2)
            + 0.05 * jnp.sum((x - x_goal) ** 2)
            + pen
        )

    def final_cost(p, x):
        return 50.0 * jnp.sum((x - x_goal) ** 2)

    horizon = 30
    us0 = jnp.tile(u_h[None], (horizon, 1))

    def scenario(x0):
        return mpc.ilqr_mpc_rollout(
            dsys.g, running_cost, final_cost, params, x0, us0, args.steps,
            dt=dt,
            u_lower=jnp.zeros(4, dtype), u_upper=jnp.full(4, 4.0, dtype),
            options=ilqr.IlqrOptions(max_iters=4),
        )

    key = jax.random.PRNGKey(0)
    x0s = jnp.zeros((args.batch, 12), dtype)
    x0s = x0s.at[:, :3].set(0.2 * jax.random.normal(key, (args.batch, 3), dtype))

    mesh = make_mesh({"batch": len(jax.devices())}) if args.batch % len(
        jax.devices()
    ) == 0 else None
    rollout = jax.vmap(scenario)
    if mesh is not None:
        x0s = shard_batch(x0s, mesh)
        out_shapes = jax.eval_shape(rollout, x0s)
        rollout = jax.jit(
            rollout,
            out_shardings=jax.tree_util.tree_map(
                lambda leaf: batch_sharding(mesh, leaf.ndim), out_shapes
            ),
        )
    else:
        rollout = jax.jit(rollout)

    t0 = time.perf_counter()
    res = rollout(x0s)
    float(res.xs.sum())
    t1 = time.perf_counter()
    res = rollout(x0s)
    float(res.xs.sum())
    t2 = time.perf_counter()

    init_err = jnp.linalg.norm(x0s[:, :3] - x_goal[:3], axis=1)
    final_err = jnp.linalg.norm(res.xs[:, -1, :3] - x_goal[:3], axis=1)
    min_obs = jnp.min(
        jnp.linalg.norm(res.xs[:, :, :3] - obst, axis=2), axis=1
    )
    # Success: every scenario made clear progress toward the goal (a full
    # flight needs ~100 steps; short runs still must move).
    n_ok = int(jnp.sum(final_err < 0.8 * init_err))
    solves = args.batch * args.steps
    print(f"devices: {len(jax.devices())}, batch {args.batch}, steps {args.steps}")
    print(f"compile {t1 - t0:.0f}s; {solves} MPC solves in {(t2 - t1) * 1e3:.0f}ms "
          f"-> {solves / (t2 - t1):.0f} solves/s")
    print(f"median goal distance: {float(jnp.median(init_err)):.2f} -> "
          f"{float(jnp.median(final_err)):.2f} m; progressing {n_ok}/{args.batch}; "
          f"median obstacle clearance {float(jnp.median(min_obs)):.2f}m")
    ok = n_ok > 0.9 * args.batch
    print("QUADROTOR-MPC", "SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
