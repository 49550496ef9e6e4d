"""Quadrotor obstacle-MPC solves/s/chip (BASELINE.md row 2).

Batched receding-horizon iLQR on the 12-state quadrotor with an obstacle
penalty — the reference's LinearModelPredictiveController role
(linear_model_predictive_controller.h:41) made nonlinear and batched.
DEFAULT schedule is the headline bench's real-time iteration: one heavy
8-iteration planning solve, then fused always-accept RTI tracking steps
(round 4: 1,868 solves/s at 512/512 progressing vs 298 at 335/512 for
plain 4-iteration iLQR — 6.3x faster AND better quality; saturates ~1,870
through B=2048).  "Progressing" = moved measurably toward the goal in the
0.5 s window; full flights need ~75 steps.

CAUTION: steps > ~25 at batch 512 once crashed the tunneled TPU worker in
the plain-iLQR config; the 25-step shape is known-good.  One JSON line;
vs_baseline is the ratio to the round-1 measured 265 solves/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import _harness

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=0, help="0 = default")
parser.add_argument("--steps", type=int, default=0)
parser.add_argument("--iters", type=int, default=4)
parser.add_argument("--rti", dest="rti", action="store_true", default=True,
                    help="RTI light solves + heavy first solve (default)")
parser.add_argument("--no-rti", dest="rti", action="store_false",
                    help="plain 4-iteration iLQR at every MPC step")
parser.add_argument("--first-iters", type=int, default=8)
args = parser.parse_args()

if __name__ == "__main__":
    _harness.tpu_or_cpu_fallback()

import jax
import jax.numpy as jnp

if _harness.on_cpu():
    jax.config.update("jax_platforms", "cpu")


def main():
    from drake_tpu.control import mpc
    from drake_tpu.models import quadrotor
    from drake_tpu.systems import base as sysbase
    from drake_tpu.trajopt import ilqr

    dtype = jnp.float32
    cpu = _harness.on_cpu()
    batch = args.batch or (8 if cpu else 512)
    steps = args.steps or (3 if cpu else 25)

    system = quadrotor.make_system(quadrotor.default_params(dtype))
    params = system.default_params
    dt = 0.02
    dsys = sysbase.discretize(system, dt, "rk4")
    u_h = quadrotor.hover_input(params)
    x_goal = jnp.zeros(12, dtype).at[0].set(2.0).at[2].set(1.0)
    obst = jnp.asarray([1.0, 0.0, 0.5], dtype)

    def running_cost(p, x, u, t):
        d2 = jnp.sum((x[:3] - obst) ** 2)
        pen = jnp.maximum(0.0, 0.4**2 - d2) ** 2 * 100.0
        return (
            0.05 * jnp.sum((u - u_h) ** 2)
            + 0.05 * jnp.sum((x - x_goal) ** 2)
            + pen
        )

    def final_cost(p, x):
        return 50.0 * jnp.sum((x - x_goal) ** 2)

    us0 = jnp.tile(u_h[None], (30, 1))

    if args.rti:
        # The headline bench's real-time-iteration schedule (BASELINE.md
        # round 2): heavy planning solve once, fused always-accept RTI
        # steps track it.
        options = ilqr.IlqrOptions(rti=True)
        first_options = ilqr.IlqrOptions(max_iters=args.first_iters)
    else:
        options = ilqr.IlqrOptions(max_iters=args.iters)
        first_options = None

    def scenario(x0):
        return mpc.ilqr_mpc_rollout(
            dsys.g, running_cost, final_cost, params, x0, us0, steps,
            dt=dt, u_lower=jnp.zeros(4, dtype),
            u_upper=jnp.full(4, 4.0, dtype),
            options=options, first_options=first_options,
        )

    key = jax.random.PRNGKey(0)
    x0s = jnp.zeros((batch, 12), dtype)
    x0s = x0s.at[:, :3].set(0.2 * jax.random.normal(key, (batch, 3), dtype))

    rollout = jax.jit(jax.vmap(scenario))
    res = rollout(x0s)
    float(res.xs.sum())
    t0 = time.perf_counter()
    res = rollout(x0s)
    float(res.xs.sum())
    wall = time.perf_counter() - t0

    init_err = jnp.linalg.norm(x0s[:, :3] - x_goal[:3], axis=1)
    final_err = jnp.linalg.norm(res.xs[:, -1, :3] - x_goal[:3], axis=1)
    n_ok = int(jnp.sum(final_err < init_err - 0.05))

    _harness.emit(
        "quadrotor obstacle MPC solves/s/chip (horizon=30, "
        f"batch={batch}{', RTI' if args.rti else ''}, "
        f"{n_ok}/{batch} progressing"
        + (", CPU FALLBACK" if cpu else "") + ")",
        batch * steps / wall,
        "solves/s",
        265.0,
    )


if __name__ == "__main__":
    main()
