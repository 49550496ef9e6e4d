"""TPU worker-crash forensics (VERDICT round-2 item 7).

Two crash classes were worked around with chunking in round 2:
  (a) B >= 2048 full-solver iiwa-MPC programs crash the TPU worker;
  (b) >= 16 vmapped Sl1QP (dircol) instances in ONE program crash it.

This harness root-causes them WITHOUT running the suspect programs: it
compiles each size ladder and reads the executable's own memory analysis
(argument/output/temp/peak HBM bytes) — superlinear temp growth pinpoints
the allocation that kills the worker.  Run with --execute to additionally
run each rung (on a throwaway day: a crash wedges the tunnel ~10-60 min).

Usage: python benchmarks/crash_forensics.py [--case mpc|dircol] [--execute]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

parser = argparse.ArgumentParser()
parser.add_argument("--case", choices=["mpc", "dircol", "both"],
                    default="both")
parser.add_argument("--execute", action="store_true")
parser.add_argument("--sizes", type=str, default="")
parser.add_argument("--analytic-jacobian", action="store_true",
                    help="use the memory-flat contact-jacobian formulation "
                    "(SapParameters.contact_jacobian='analytic') — the fix "
                    "for crash class (a)")
args = parser.parse_args()

import jax
import jax.numpy as jnp
import numpy as np


def report(tag, lowered):
    try:
        compiled = lowered.compile()
    except Exception as e:  # compile-time failure IS the finding
        print(f"{tag}: COMPILE FAILED: {type(e).__name__}: {e}")
        return None
    try:
        ma = compiled.memory_analysis()
        mb = 1024**2
        print(
            f"{tag}: temp={ma.temp_size_in_bytes / mb:.1f} MiB, "
            f"args={ma.argument_size_in_bytes / mb:.1f} MiB, "
            f"out={ma.output_size_in_bytes / mb:.1f} MiB, "
            f"gen_code={ma.generated_code_size_in_bytes / mb:.1f} MiB"
        )
        return ma
    except Exception as e:
        print(f"{tag}: memory_analysis unavailable ({e}); compiled OK")
        return None


def mpc_ladder(sizes):
    from iiwa_push_mpc import build_world

    from drake_tpu.contact import plant as cplant
    from drake_tpu.contact import sap
    from drake_tpu.control import mpc
    from drake_tpu.models import iiwa
    from drake_tpu.multibody import dynamics as dyn
    from drake_tpu.trajopt import ilqr

    dtype = jnp.float32
    model, params, scene, side = build_world(dtype)
    nq, nv = model.num_positions, model.num_velocities
    h = 0.04
    jac = "analytic" if args.analytic_jacobian else "jacfwd"
    dsys = cplant.make_discrete_system(
        model, params, scene, h,
        sap_params=sap.SapParameters(contact_jacobian=jac))
    sp_plan = sap.SapParameters(unroll_iterations=4, line_search_points=12,
                                contact_jacobian=jac)
    dsys_plan = cplant.make_discrete_system(
        model, params, scene, h, sap_params=sp_plan)
    q_arm = iiwa.home_position(dtype)
    q0 = jnp.concatenate(
        [q_arm, jnp.asarray([1, 0, 0, 0, 0.62, 0.0, side / 2], dtype)])
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])
    tau_g = dyn.bias_forces(model, params, q0, jnp.zeros(nv, dtype))[:7]

    def running_cost(p, x, u, t):
        return (10.0 * jnp.sum((x[nq - 3 : nq - 1]) ** 2)
                + 1e-4 * jnp.sum((u - tau_g) ** 2))

    def final_cost(p, x):
        return 400.0 * jnp.sum(x[nq - 3 : nq - 1] ** 2)

    us0 = jnp.tile(tau_g[None], (12, 1))
    lim = jnp.asarray(iiwa.EFFORT_LIMITS, dtype)
    first = ilqr.IlqrOptions(
        max_iters=4, use_jacrev=True, alphas=(1.0, 0.25, 0.03))
    light = ilqr.IlqrOptions(use_jacrev=True, rti=True)

    def scenario(x):
        return mpc.ilqr_mpc_rollout(
            dsys_plan.g, running_cost, final_cost, params, x, us0, 10,
            dt=h, u_lower=-lim, u_upper=lim, options=light,
            sim_dynamics=dsys.g, first_options=first)

    for B in sizes:
        x0s = jnp.tile(x0[None], (B, 1))
        fn = jax.jit(jax.vmap(scenario))
        lowered = fn.lower(x0s)
        ma = report(f"mpc B={B}", lowered)
        if args.execute and ma is not None:
            out = fn(x0s)
            print(f"  executed OK: {float(out.xs.sum()):.3f}")


def dircol_ladder(sizes):
    # EXACTLY the round-2 dircol gate's Sl1QP program (bench_dircol_f32.py).
    from drake_tpu.models import pendulum
    from drake_tpu.solvers.ipm import IpmOptions
    from drake_tpu.solvers.sqp import SqpOptions
    from drake_tpu.trajopt import dircol

    dtype = jnp.float32
    system = pendulum.make_system(pendulum.default_params(dtype))
    params = system.default_params
    x0 = jnp.array([0.0, 0.0], dtype)
    xf = jnp.array([jnp.pi, 0.0], dtype)
    problem = dircol.DircolProblem(
        system=system, num_time_samples=21,
        minimum_time_step=0.2, maximum_time_step=0.5,
        running_cost=lambda x, u: 10.0 * u[0] ** 2,
        x0=x0, xf=xf,
        u_lower=jnp.array([-3.0], dtype), u_upper=jnp.array([3.0], dtype),
    )
    opts = SqpOptions(
        max_iters=300, qp=IpmOptions(max_iters=60, tol=1e-8),
        constraint_tol=1e-4, opt_tol=1e-4,
    )
    z_base = problem.initial_guess(x0, xf, timespan=4.0, dtype=dtype)
    fn = jax.jit(
        jax.vmap(lambda z: dircol.solve(problem, params, z, opts))
    )
    for B in sizes:
        key = jax.random.PRNGKey(0)
        z0s = z_base[None] + 0.05 * jax.random.normal(
            key, (B,) + z_base.shape, dtype)
        lowered = fn.lower(z0s)
        ma = report(f"dircol B={B}", lowered)
        if args.execute and ma is not None:
            out = fn(z0s)
            print(f"  executed OK: viol max "
                  f"{float(out.constraint_violation.max()):.2e}")


def main():
    sizes = (
        [int(s) for s in args.sizes.split(",")]
        if args.sizes
        else None
    )
    if args.case in ("mpc", "both"):
        mpc_ladder(sizes or [256, 512, 1024, 2048])
    if args.case in ("dircol", "both"):
        dircol_ladder(sizes or [4, 8, 16, 32])


if __name__ == "__main__":
    main()
