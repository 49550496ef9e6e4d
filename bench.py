"""Benchmark: batched direct-collocation MPC solves per second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Round-1 headline: pendulum swing-up dircol (the reference's
examples/pendulum/trajectory_optimization_simulation.cc config: 21 knots,
torque limit 3, running cost 10u^2) solved as a batch of independent SQP
instances on one chip.  The reference solves ONE such NLP at a time through
SNOPT on CPU; `vs_baseline` is solves/s divided by an assumed 10 solves/s
for the reference path (SNOPT on a modern core solves this NLP in ~100 ms;
the repo publishes no numbers — see BASELINE.md).

On TPU this runs in f32 with relaxed tolerances (1e-3 feasibility — still
tighter than the 1e-3 closed-loop acceptance bar of the reference example).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from drake_tpu.models import pendulum
    from drake_tpu.solvers.ipm import IpmOptions
    from drake_tpu.solvers.sqp import SqpOptions
    from drake_tpu.trajopt import dircol

    dtype = jnp.float32
    system = pendulum.make_system(pendulum.default_params(dtype))
    params = system.default_params
    x0 = jnp.array([0.0, 0.0], dtype=dtype)
    xf = jnp.array([jnp.pi, 0.0], dtype=dtype)
    problem = dircol.DircolProblem(
        system=system,
        num_time_samples=21,
        minimum_time_step=0.2,
        maximum_time_step=0.5,
        running_cost=lambda x, u: 10.0 * u[0] ** 2,
        x0=x0,
        xf=xf,
        u_lower=jnp.array([-3.0], dtype=dtype),
        u_upper=jnp.array([3.0], dtype=dtype),
    )
    opts = SqpOptions(
        max_iters=40,
        qp=IpmOptions(max_iters=25, tol=1e-6, kkt_reg=1e-7),
        constraint_tol=1e-3,
        opt_tol=1e-2,
        hessian_reg=1e-4,
    )

    batch = 32
    # Perturbed initial guesses (scenario diversity).
    key = jax.random.PRNGKey(0)
    z0 = problem.initial_guess(x0, xf, timespan=4.0, dtype=dtype)
    z_batch = z0[None] + 0.01 * jax.random.normal(
        key, (batch, z0.shape[0]), dtype=dtype
    )

    solve = jax.jit(
        jax.vmap(lambda z: dircol.solve(problem, params, z, opts))
    )

    # Warm-up / compile.
    sol = solve(z_batch)
    jax.block_until_ready(sol.xs)

    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        sol = solve(z_batch)
        jax.block_until_ready(sol.xs)
    dt = (time.perf_counter() - t0) / n_rep

    n_ok = int(jnp.sum(sol.constraint_violation < 1e-2))
    solves_per_s = batch / dt
    baseline_solves_per_s = 10.0  # assumed reference SNOPT rate; see BASELINE.md
    print(
        json.dumps(
            {
                "metric": "pendulum dircol MPC solves/s/chip "
                f"(batch={batch}, f32, {n_ok}/{batch} feasible<1e-2)",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / baseline_solves_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
