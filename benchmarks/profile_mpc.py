"""Stage-by-stage profile of the headline iiwa contact-MPC benchmark.

Decomposes bench.py's batched MPC solve into its stages and times each on
the default backend (TPU unless DRAKE_TPU_BENCH_CPU=1):

  1. one batched SAP contact step        (the raw physics)
  2. SAP Newton iteration counts         (is the f32 tolerance reachable?)
  3. batched dynamics jacobian (derivs)  (the iLQR backward-pass input)
  4. one full batched MPC solve          (the headline metric path)

Run:  python benchmarks/profile_mpc.py [--cpu] [--batch N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=256)
parser.add_argument("--sap-iters", type=int, default=30)
parser.add_argument("--sap-tol", type=float, default=1e-6)
parser.add_argument("--skip-stages", action="store_true")
parser.add_argument("--n-alphas", type=int, default=6)
parser.add_argument("--ilqr-iters", type=int, default=3)
parser.add_argument("--mpc-steps", type=int, default=10)
parser.add_argument(
    "--first-iters", type=int, default=0,
    help="heavier FIRST solve (real-time-iteration schedule); 0 = off",
)
parser.add_argument(
    "--first-alphas", type=int, default=6,
    help="line-search candidates in the heavy first solve",
)
parser.add_argument("--plan-ls", type=int, default=12)
parser.add_argument("--horizon", type=int, default=12)
parser.add_argument(
    "--refresh-every", type=int, default=0,
    help="repeat the heavy first-iters solve every k-th MPC step")
parser.add_argument(
    "--rti", action="store_true",
    help="fused always-accept RTI step for the light solves "
    "(ilqr.rti_solve: 2 dynamics passes per knot instead of 3)",
)
parser.add_argument(
    "--analytic-jacobian", action="store_true",
    help="padded-temp-free contact-jacobian formulation (~11%% slower "
    "at B=1024; see sap.make_contact_jacobian / BASELINE.md round 4)")
parser.add_argument(
    "--plan-unroll", type=int, default=0,
    help="use a fixed-N-iteration scan SAP for the iLQR-internal dynamics "
    "(derivatives + line search) while the state advance keeps the full "
    "converged solver; 0 = one solver everywhere",
)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from iiwa_push_mpc import build_world

from drake_tpu.contact import plant as cplant
from drake_tpu.contact import sap
from drake_tpu.control import mpc
from drake_tpu.models import iiwa
from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody import kinematics as kin
from drake_tpu.trajopt import ilqr


def timeit(label, fn, *a, n=3):
    out = fn(*a)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).sum()), out
    )  # host sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
        jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).sum()), out)
    dt = (time.perf_counter() - t0) / n
    print(f"  {label:<48s} {dt*1e3:9.2f} ms")
    return out, dt


def _run_mpc_only(
    model, params, scene, side, dsys, x0s, q_arm, tau_g, box_goal, ee_body,
    nq, nv, h, batch, dtype
):
    """Stage 4 only: full MPC timing + controller quality."""

    def running_cost(p, x, u, t):
        q_box_xy = x[nq - 3 : nq - 1]
        box_err = jnp.sum((q_box_xy - box_goal) ** 2)
        _, p_WB = kin.forward_kinematics(model, p, x[:nq])
        p_ee = p_WB[ee_body]
        box_pos = x[nq - 3 : nq]
        push_dir = (box_goal - q_box_xy) / (
            jnp.linalg.norm(box_goal - q_box_xy) + 1e-6
        )
        push_point = box_pos - jnp.concatenate(
            [push_dir * (side / 2 + 0.055), jnp.zeros(1, x.dtype)]
        )
        ee_err = jnp.sum((p_ee - push_point) ** 2)
        return (
            10.0 * box_err
            + 5.0 * ee_err
            + 0.01 * jnp.sum((x[:7] - q_arm) ** 2)
            + 1e-4 * jnp.sum((u - tau_g) ** 2)
            + 1e-4 * jnp.sum(x[nq:] ** 2)
        )

    def final_cost(p, x):
        return 400.0 * jnp.sum((x[nq - 3 : nq - 1] - box_goal) ** 2)

    horizon = args.horizon
    mpc_steps = args.mpc_steps
    us0 = jnp.tile(tau_g[None], (horizon, 1))
    lim = jnp.asarray(iiwa.EFFORT_LIMITS, dtype)

    alphas_full = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)
    alphas = tuple(
        alphas_full[:: max(1, len(alphas_full) // args.n_alphas)][: args.n_alphas]
    )
    first_alphas = tuple(
        alphas_full[:: max(1, len(alphas_full) // args.first_alphas)][
            : args.first_alphas
        ]
    )
    first_options = (
        ilqr.IlqrOptions(
            max_iters=args.first_iters, use_jacrev=True, alphas=first_alphas
        )
        if args.first_iters
        else None
    )

    if args.plan_unroll:
        sp_plan = sap.SapParameters(
            unroll_iterations=args.plan_unroll,
            line_search_points=args.plan_ls,
            contact_jacobian=jac_method,
        )
        dsys_plan = cplant.make_discrete_system(
            model, params, scene, h, sap_params=sp_plan
        )
        plan_g, sim_g = dsys_plan.g, dsys.g
    else:
        plan_g, sim_g = dsys.g, None

    light_options = ilqr.IlqrOptions(
        max_iters=args.ilqr_iters, use_jacrev=True, alphas=alphas,
        rti=args.rti,
    )

    def scenario(x):
        return mpc.ilqr_mpc_rollout(
            plan_g, running_cost, final_cost, params, x, us0, mpc_steps,
            dt=h, u_lower=-lim, u_upper=lim,
            options=light_options,
            sim_dynamics=sim_g,
            first_options=first_options,
            refresh_every=args.refresh_every,
        )

    rollout = jax.jit(jax.vmap(scenario))
    res = rollout(x0s)
    float(res.xs.sum())
    t0 = time.perf_counter()
    n_rep = 2
    for _ in range(n_rep):
        res = rollout(x0s)
        float(res.xs.sum())
    wall = (time.perf_counter() - t0) / n_rep
    err0 = jnp.linalg.norm(x0s[:, nq - 3 : nq - 1] - box_goal, axis=1)
    err1 = jnp.linalg.norm(res.xs[:, -1, nq - 3 : nq - 1] - box_goal, axis=1)
    n_progress = int(jnp.sum(err1 < err0))
    print(
        f"  MPC: {wall*1e3:9.1f} ms -> {batch*mpc_steps/wall:,.1f} solves/s  "
        f"({n_progress}/{batch} progressing; median final err "
        f"{float(jnp.median(err1)):.3f} m from {float(jnp.median(err0)):.3f})"
    )


def main():
    dtype = jnp.float32
    model, params, scene, side = build_world(dtype)
    nq, nv = model.num_positions, model.num_velocities
    h = 0.04
    jac_method = "analytic" if args.analytic_jacobian else "jacfwd"
    sp = sap.SapParameters(
        max_iterations=args.sap_iters, rel_tolerance=args.sap_tol,
        contact_jacobian=jac_method,
    )
    dsys = cplant.make_discrete_system(model, params, scene, h, sap_params=sp)

    q_arm = iiwa.home_position(dtype)
    q0 = jnp.concatenate(
        [q_arm, jnp.asarray([1, 0, 0, 0, 0.62, 0.0, side / 2], dtype)]
    )
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])
    box_goal = jnp.asarray([0.78, 0.15], dtype)
    tau_g = dyn.bias_forces(model, params, q0, jnp.zeros(nv, dtype))[:7]
    ee_body = model.body_index("link7")

    batch = args.batch
    key = jax.random.PRNGKey(0)
    x0s = jnp.tile(x0[None], (batch, 1))
    x0s = x0s.at[:, nq - 3 : nq - 1].add(
        0.03 * jax.random.normal(key, (batch, 2), dtype)
    )
    us = jnp.tile(tau_g[None], (batch, 1))

    print(
        f"backend={jax.default_backend()}  batch={batch}  nv={nv}  "
        f"sap_iters={args.sap_iters}  sap_tol={args.sap_tol}"
    )

    if args.skip_stages:
        _run_mpc_only(
            model, params, scene, side, dsys, x0s, q_arm, tau_g, box_goal,
            ee_body, nq, nv, h, batch, dtype
        )
        return

    # ---- stage 1: raw batched SAP step --------------------------------
    @jax.jit
    def sap_step(xs, us_):
        return jax.vmap(lambda x, u: dsys.g(params, x, u, 0.0))(xs, us_)

    _, t_step = timeit("batched SAP contact step", sap_step, x0s, us)
    print(f"    -> {batch / t_step:,.0f} steps/s")

    # ---- stage 2: SAP iteration counts --------------------------------
    @jax.jit
    def sap_iters(xs, us_):
        def one(x, u):
            q, v = x[:nq], x[nq:]
            tau = jnp.zeros(nv, dtype).at[:7].set(u)
            data, _ = sap.assemble(model, params, scene, q, v, tau, h)
            sol = sap.solve_sap(data, data.v_star)
            return sol.iterations, sol.momentum_residual

        return jax.vmap(one)(xs, us_)

    (iters, resid), _ = timeit("SAP solve (iters probe)", sap_iters, x0s, us)
    import numpy as np

    iters = np.asarray(iters)
    resid = np.asarray(resid)
    print(
        f"    iters: min={iters.min()} p50={np.median(iters):.0f} "
        f"max={iters.max()}  (cap {sap.SapParameters().max_iterations})"
    )
    print(
        f"    resid: p50={np.median(resid):.2e} max={resid.max():.2e} "
        f"(tol {sap.SapParameters().rel_tolerance})"
    )

    # ---- stage 3: batched combined jacobian (iLQR derivs) -------------
    @jax.jit
    def derivs(xs, us_):
        def dyn_xu(xu):
            return dsys.g(params, xu[: nq + nv], xu[nq + nv :], 0.0)

        return jax.vmap(lambda x, u: jax.jacrev(dyn_xu)(jnp.concatenate([x, u])))(
            xs, us_
        )

    _, t_jac = timeit("batched dynamics jacrev (38-dim pull)", derivs, x0s, us)

    # ---- stage 4: full MPC solve --------------------------------------
    def running_cost(p, x, u, t):
        q_box_xy = x[nq - 3 : nq - 1]
        box_err = jnp.sum((q_box_xy - box_goal) ** 2)
        _, p_WB = kin.forward_kinematics(model, p, x[:nq])
        p_ee = p_WB[ee_body]
        box_pos = x[nq - 3 : nq]
        push_dir = (box_goal - q_box_xy) / (
            jnp.linalg.norm(box_goal - q_box_xy) + 1e-6
        )
        push_point = box_pos - jnp.concatenate(
            [push_dir * (side / 2 + 0.055), jnp.zeros(1, x.dtype)]
        )
        ee_err = jnp.sum((p_ee - push_point) ** 2)
        return (
            10.0 * box_err
            + 5.0 * ee_err
            + 0.01 * jnp.sum((x[:7] - q_arm) ** 2)
            + 1e-4 * jnp.sum((u - tau_g) ** 2)
            + 1e-4 * jnp.sum(x[nq:] ** 2)
        )

    def final_cost(p, x):
        return 400.0 * jnp.sum((x[nq - 3 : nq - 1] - box_goal) ** 2)

    horizon = 12
    mpc_steps = 10
    us0 = jnp.tile(tau_g[None], (horizon, 1))
    lim = jnp.asarray(iiwa.EFFORT_LIMITS, dtype)

    def scenario(x):
        return mpc.ilqr_mpc_rollout(
            dsys.g, running_cost, final_cost, params, x, us0, mpc_steps,
            dt=h, u_lower=-lim, u_upper=lim,
            options=ilqr.IlqrOptions(max_iters=3, use_jacrev=True),
        )

    rollout = jax.jit(jax.vmap(scenario))
    _, t_mpc = timeit("full MPC rollout (10 steps x 3 ilqr iters)", rollout, x0s, n=2)
    print(f"    -> {batch * mpc_steps / t_mpc:,.1f} solves/s")
    # Accounting: SAP forward solves per MPC step =
    #   1 rollout(12) + per-iter [12 derivs-fwd + 6 alphas x 12 fwd] x 3
    n_sap = mpc_steps * (horizon + 3 * (horizon + 6 * horizon))
    print(
        f"    SAP-solve equivalents in MPC: {n_sap} -> "
        f"{t_mpc / (n_sap * t_step / batch / batch):.1f}x"
        " (vs raw batched step extrapolation)"
        if t_step
        else ""
    )


if __name__ == "__main__":
    main()
