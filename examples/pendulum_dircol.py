"""Pendulum swing-up via direct collocation + PID tracking — the baseline config-1 demo.

Mirrors the reference example
examples/pendulum/trajectory_optimization_simulation.cc: 21 knots, equal time
intervals in [0.2, 0.5] s, |u| <= 3 N*m, running cost 10*u^2, swing from
[0, 0] to [pi, 0], then track the optimized trajectory closed-loop and check
the final state (reference asserts 1e-3; we report the error).

Run: python examples/pendulum_dircol.py [--f32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--f32", action="store_true", help="run in float32 (TPU mode)")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if args.f32 else jnp.float64

    from drake_tpu.models import pendulum
    from drake_tpu.systems import simulator
    from drake_tpu.trajopt import dircol
    from drake_tpu.solvers.sqp import SqpOptions

    system = pendulum.make_system(pendulum.default_params(dtype))
    params = system.default_params

    x0 = jnp.array([0.0, 0.0], dtype=dtype)
    xf = jnp.array([jnp.pi, 0.0], dtype=dtype)
    torque_limit = 3.0

    problem = dircol.DircolProblem(
        system=system,
        num_time_samples=21,
        minimum_time_step=0.2,
        maximum_time_step=0.5,
        running_cost=lambda x, u: 10.0 * u[0] ** 2,
        x0=x0,
        xf=xf,
        u_lower=jnp.array([-torque_limit], dtype=dtype),
        u_upper=jnp.array([torque_limit], dtype=dtype),
    )

    z_init = problem.initial_guess(x0, xf, timespan=4.0, dtype=dtype)
    solve = jax.jit(lambda z: dircol.solve(problem, params, z, SqpOptions()))

    t_start = time.perf_counter()
    sol = solve(z_init)
    jax.block_until_ready(sol.xs)
    t_compile = time.perf_counter() - t_start

    t_start = time.perf_counter()
    sol = solve(z_init)
    jax.block_until_ready(sol.xs)
    t_solve = time.perf_counter() - t_start

    print(f"solve: success={bool(sol.success)} cost={float(sol.cost):.4f} "
          f"viol={float(sol.constraint_violation):.2e} h={float(sol.h):.4f}s "
          f"T={float(sol.h) * 20:.2f}s")
    print(f"timing: first-call (incl compile) {t_compile:.2f}s, cached {t_solve * 1e3:.1f}ms")
    print(f"|u| max = {float(jnp.abs(sol.us).max()):.3f} (limit {torque_limit})")

    # Closed loop: trajectory feedforward + PD tracking (Kp=10, Kd=1 as in the
    # reference's PidControlledSystem wiring).
    Kp, Kd = 10.0, 1.0
    dt_sim = 1e-3
    t_final = float(sol.h) * 20

    def policy(_, x, t):
        u_ff = dircol.reconstruct_input(sol, t)
        x_des = dircol.reconstruct_state(sol, params, system, t)
        u = u_ff + Kp * (x_des[0] - x[0]) + Kd * (x_des[1] - x[1])
        return u[None] if u.ndim == 0 else u

    n_steps = int(t_final / dt_sim)
    xs, us, ts = simulator.simulate_controlled(
        system, params, x0, policy, n_steps, dt_sim
    )
    err = float(jnp.linalg.norm(xs[-1] - xf))
    print(f"closed-loop final state: {xs[-1]}, target {xf}, err {err:.2e}")
    ok = err < 1e-2
    print("SWING-UP", "SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
