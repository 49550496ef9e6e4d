"""Acrobot swing-up via direct collocation + TV-LQR stabilization.

Baseline config-2 demo (BASELINE.json: "acrobot swing-up trajectory
optimization + time-varying LQR stabilization").  Composes the same APIs the
reference composes (DirectCollocation +
FiniteHorizonLinearQuadraticRegulator on AcrobotPlant — SURVEY.md §3.4):
solve the swing-up NLP, stabilize the trajectory with finite-horizon LQR,
then verify the closed loop reaches the upright balance under perturbation,
handing off to the infinite-horizon balancing LQR at the end (the
examples/acrobot/run_lqr.cc role).

Run: python examples/acrobot_swingup.py [--cpu]
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
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64

    from drake_tpu.control import lqr as lqr_mod
    from drake_tpu.models import acrobot
    from drake_tpu.systems import base as sysbase
    from drake_tpu.systems import simulator
    from drake_tpu.trajopt import dircol, ilqr
    from drake_tpu.solvers.sqp import SqpOptions

    system = acrobot.make_system(acrobot.default_params(dtype))
    params = system.default_params
    x0 = jnp.zeros(4, dtype)
    xf = acrobot.upright_state(dtype)

    # Stage 1: iLQR swing-up for a dynamically feasible warm start (the cold
    # straight-line guess is not solvable for the acrobot NLP; warm-starting
    # trajopt from a cheap DDP pass is the TPU-native workflow).
    dt_ilqr = 0.02
    n_ilqr = 150
    dsys = sysbase.discretize(system, dt_ilqr, "rk4")
    t_start = time.perf_counter()
    warm = jax.jit(
        lambda x, us: ilqr.solve(
            dsys.g,
            lambda p, x_, u_, t_: 0.01 * jnp.sum(u_**2) + 0.1 * jnp.sum((x_ - xf) ** 2),
            lambda p, x_: 500.0 * jnp.sum((x_ - xf) ** 2),
            params, x, us, dt=dt_ilqr,
            u_lower=jnp.array([-12.0], dtype), u_upper=jnp.array([12.0], dtype),
            options=ilqr.IlqrOptions(max_iters=200, tol=1e-9),
        )
    )(x0, jnp.zeros((n_ilqr, 1), dtype))
    print(
        f"iLQR warm start: final err {float(jnp.linalg.norm(warm.xs[-1] - xf)):.3f} "
        f"({time.perf_counter() - t_start:.0f}s incl compile)"
    )

    # Stage 2: dircol polish (minimum-effort, Hermite-Simpson feasible).
    n_knots = 31
    problem = dircol.DircolProblem(
        system=system,
        num_time_samples=n_knots,
        minimum_time_step=0.05,
        maximum_time_step=0.2,
        running_cost=lambda x, u: 1.0 * u[0] ** 2,
        x0=x0,
        xf=xf,
        u_lower=jnp.array([-12.0], dtype),
        u_upper=jnp.array([12.0], dtype),
    )
    idx = jnp.linspace(0, n_ilqr, n_knots).astype(int)
    z0 = problem.pack(
        jnp.asarray(n_ilqr * dt_ilqr / (n_knots - 1), dtype),
        warm.xs[idx],
        warm.us[jnp.clip(idx, 0, n_ilqr - 1)],
    )
    t_start = time.perf_counter()
    # 300 majors: the acrobot NLP converges slowly from some iLQR warm
    # starts (roundoff-level warm-start changes moved it from ~100 to ~200
    # required iterations; found by tools/run_examples.py).
    sol = jax.jit(
        lambda z: dircol.solve(problem, params, z, SqpOptions(max_iters=300))
    )(z0)
    jax.block_until_ready(sol.xs)
    print(
        f"dircol: success={bool(sol.success)} viol={float(sol.constraint_violation):.1e} "
        f"cost={float(sol.cost):.2f} T={float(sol.h) * 30:.2f}s "
        f"({time.perf_counter() - t_start:.0f}s incl compile)"
    )
    if not bool(sol.success):
        print("SWINGUP FAILURE (trajopt)")
        return 1

    # Dense nominal trajectory for TV-LQR (resample the Hermite spline).
    T = float(sol.h) * (n_knots - 1)
    n_grid = 600
    ts = jnp.linspace(0.0, T, n_grid + 1, dtype=dtype)
    xs_nom = jax.vmap(
        lambda t: dircol.reconstruct_state(sol, params, system, t)
    )(ts)
    us_nom = jax.vmap(lambda t: dircol.reconstruct_input(sol, t))(ts)

    Q = jnp.diag(jnp.asarray([10.0, 10.0, 1.0, 1.0], dtype))
    R = jnp.asarray([[1.0]], dtype)
    # Terminal cost: the upright balancing LQR's cost-to-go (handoff).
    bal = lqr_mod.lqr_for_system(system, params, xf, jnp.zeros(1, dtype), Q, R)
    tvlqr = lqr_mod.finite_horizon_lqr(
        system, params, Q, R, t0=0.0, tf=T, num_steps=n_grid,
        x0_traj=xs_nom, u0_traj=us_nom, Qf=bal.S,
    )
    policy_swing = lqr_mod.tvlqr_policy(tvlqr)

    def policy(_, x, t):
        u_sw = policy_swing(None, x, t)
        u_bal = -bal.K @ (x - xf)
        u = jnp.where(t < T, u_sw, u_bal)
        return jnp.clip(u, -20.0, 20.0)

    dt_sim = 1e-3
    n_steps = int((T + 2.0) / dt_sim)
    x_init = x0 + jnp.asarray([0.02, -0.02, 0.0, 0.0], dtype)  # perturbed
    xs_cl, us_cl, _ = simulator.simulate_controlled(
        system, params, x_init, policy, n_steps, dt_sim
    )
    err = float(jnp.linalg.norm(xs_cl[-1] - xf))
    print(f"closed loop from perturbed start: final err {err:.2e}")
    ok = err < 1e-3
    print("SWINGUP+TVLQR", "SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
