"""Quality sweep for the headline iiwa contact-MPC benchmark (bench.py).

Round-3 follow-up to the BASELINE.md headline-quality campaign: the
committed operating point reaches 900/1024 progressing; the residual tail
is 65 "smash" lanes (box launched past the goal) plus ~50 near-misses.
This harness sweeps the anti-smash cost shaping — including a
*distance-proportional braking cap* (allowed box speed shrinks as the box
approaches the goal, the classic proportional-braking profile) that the
fixed 0.25 m/s hinge cannot express — and reports progressing / median
err / solves/s for each config, same measurement discipline as bench.py.

Run:  python benchmarks/headline_quality_sweep.py --mode brake --k 1.5
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=1024)
parser.add_argument("--mpc-steps", type=int, default=30)
parser.add_argument(
    "--mode", choices=["fixed", "brake"], default="fixed",
    help="fixed: hinge at --cap m/s (bench.py committed = fixed 0.25); "
    "brake: hinge at max(--floor, --k * dist_to_goal) m/s",
)
parser.add_argument("--cap", type=float, default=0.25)
parser.add_argument("--k", type=float, default=1.5, help="brake slope 1/s")
parser.add_argument("--floor", type=float, default=0.05)
parser.add_argument("--whinge", type=float, default=1.0)
parser.add_argument("--wvel", type=float, default=0.02)
parser.add_argument(
    "--refresh", type=int, default=0,
    help="repeat the heavy first solve every k MPC steps (re-planning)")
parser.add_argument(
    "--hold", type=float, default=0.0,
    help="sim-side overspeed hold reflex: when the sim box planar speed "
    "exceeds this [m/s], the applied torque blends to gravity hold "
    "(freeze the arm, stop feeding the smash).  0 = off")
parser.add_argument(
    "--guard", choices=["off", "speed", "overshoot"], default="off",
    help="EVENT-TRIGGERED plan guard (round-5, VERDICT item 4): reacts to "
    "the solver's own predicted rollout.  speed: damp plans whose "
    "rollout exceeds --guard-cap planar box speed; overshoot: damp "
    "plans whose rollout carries the box PAST the goal by more than "
    "--guard-overshoot along the push direction")
parser.add_argument("--guard-cap", type=float, default=0.35)
parser.add_argument("--guard-overshoot", type=float, default=0.05)
parser.add_argument(
    "--guard-gamma", type=float, default=0.5,
    help="torque-deviation scale applied to triggered plans (about "
    "gravity compensation)")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    from iiwa_push_mpc import build_world

    from drake_tpu.contact import plant as cplant
    from drake_tpu.contact import sap
    from drake_tpu.control import mpc
    from drake_tpu.models import iiwa
    from drake_tpu.multibody import dynamics as dyn
    from drake_tpu.multibody import kinematics as kin
    from drake_tpu.trajopt import ilqr

    dtype = jnp.float32
    model, params, scene, side = build_world(dtype)
    nq, nv = model.num_positions, model.num_velocities
    h = 0.04
    dsys = cplant.make_discrete_system(model, params, scene, h)
    sp_plan = sap.SapParameters(unroll_iterations=4, line_search_points=12)
    dsys_plan = cplant.make_discrete_system(
        model, params, scene, h, sap_params=sp_plan
    )

    q_arm = iiwa.home_position(dtype)
    q0 = jnp.concatenate(
        [q_arm, jnp.asarray([1, 0, 0, 0, 0.62, 0.0, side / 2], dtype)]
    )
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])
    box_goal = jnp.asarray([0.78, 0.15], dtype)
    tau_g = dyn.bias_forces(model, params, q0, jnp.zeros(nv, dtype))[:7]
    ee_body = model.body_index("link7")

    def running_cost(p, x, u, t):
        q_box_xy = x[nq - 3 : nq - 1]
        box_err = jnp.sum((q_box_xy - box_goal) ** 2)
        _, p_WB = kin.forward_kinematics(model, p, x[:nq])
        p_ee = p_WB[ee_body]
        box_pos = x[nq - 3 : nq]
        dist = jnp.linalg.norm(box_goal - q_box_xy)
        push_dir = (box_goal - q_box_xy) / (dist + 1e-6)
        push_point = box_pos - jnp.concatenate(
            [push_dir * (side / 2 + 0.055), jnp.zeros(1, x.dtype)]
        )
        ee_err = jnp.sum((p_ee - push_point) ** 2)
        box_sp2 = jnp.sum(x[nq + 10 : nq + 12] ** 2)
        if args.mode == "fixed":
            cap = args.cap
        else:
            cap = jnp.maximum(args.floor, args.k * dist)
        return (
            10.0 * box_err
            + 5.0 * ee_err
            + 0.01 * jnp.sum((x[:7] - q_arm) ** 2)
            + 1e-4 * jnp.sum((u - tau_g) ** 2)
            + 1e-4 * jnp.sum(x[nq:] ** 2)
            + args.wvel * jnp.sum(x[nq + 7 : nq + 13] ** 2)
            + args.whinge * jnp.maximum(box_sp2 - cap**2, 0.0)
        )

    def final_cost(p, x):
        return 400.0 * jnp.sum((x[nq - 3 : nq - 1] - box_goal) ** 2)

    horizon = 12
    batch = args.batch
    mpc_steps = args.mpc_steps
    us0 = jnp.tile(tau_g[None], (horizon, 1))
    lim = jnp.asarray(iiwa.EFFORT_LIMITS, dtype)
    first_options = ilqr.IlqrOptions(
        max_iters=4, use_jacrev=True, alphas=(1.0, 0.25, 0.03)
    )
    light_options = ilqr.IlqrOptions(use_jacrev=True, rti=True)

    sim_g = dsys.g
    if args.hold > 0.0:
        hold_cap2 = args.hold**2

        def sim_g(p, x, u, *rest):
            # Overspeed hold reflex: once the SIM box runs past the cap,
            # blend the applied torque to a gravity hold — the arm stops
            # feeding the smash (plan-model mismatch protection).
            sp2 = jnp.sum(x[nq + 10 : nq + 12] ** 2)
            tau_hold = dyn.bias_forces(
                model, p, x[:nq], jnp.zeros_like(x[nq:])
            )[:7]
            u_eff = jnp.where(sp2 > hold_cap2, tau_hold, u)
            return dsys.g(p, x, u_eff, *rest)

    plan_guard = None
    if args.guard == "speed":
        gcap2 = args.guard_cap**2

        def plan_guard(xs_plan, us_plan):
            # Predicted max planar box speed over the plan's OWN rollout:
            # only plans that would launch the box get damped.
            sp2 = jnp.max(
                jnp.sum(xs_plan[:, nq + 10 : nq + 12] ** 2, axis=-1)
            )
            scale = jnp.where(sp2 > gcap2, args.guard_gamma, 1.0)
            return tau_g[None] + scale * (us_plan - tau_g[None])

    elif args.guard == "overshoot":

        def plan_guard(xs_plan, us_plan):
            # Predicted overshoot: the plan's rollout carries the box PAST
            # the goal along the current push direction.
            b0 = xs_plan[0, nq - 3 : nq - 1]
            d0 = box_goal - b0
            dir0 = d0 / (jnp.linalg.norm(d0) + 1e-6)
            along = jnp.einsum(
                "ti,i->t", xs_plan[:, nq - 3 : nq - 1] - box_goal, dir0
            )
            over = jnp.max(along)
            scale = jnp.where(
                over > args.guard_overshoot, args.guard_gamma, 1.0
            )
            return tau_g[None] + scale * (us_plan - tau_g[None])

    def scenario(x):
        return mpc.ilqr_mpc_rollout(
            dsys_plan.g, running_cost, final_cost, params, x, us0, mpc_steps,
            dt=h, u_lower=-lim, u_upper=lim,
            options=light_options,
            sim_dynamics=sim_g,
            first_options=first_options,
            refresh_every=args.refresh,
            x_bound=50.0,
            plan_guard=plan_guard,
        )

    key = jax.random.PRNGKey(0)
    x0s = jnp.tile(x0[None], (batch, 1))
    x0s = x0s.at[:, nq - 3 : nq - 1].add(
        0.03 * jax.random.normal(key, (batch, 2), dtype)
    )

    rollout = jax.jit(jax.vmap(scenario))
    res = rollout(x0s)
    float(res.xs.sum())

    x0s_b = x0s.at[:, nq - 3].add(1e-6)
    t0 = time.perf_counter()
    res_t = rollout(x0s_b)
    float(res_t.xs.sum())
    wall = time.perf_counter() - t0

    err0 = jnp.linalg.norm(x0s[:, nq - 3 : nq - 1] - box_goal, axis=1)
    err1 = jnp.linalg.norm(res.xs[:, -1, nq - 3 : nq - 1] - box_goal, axis=1)
    n_progress = int(jnp.sum(err1 < err0))
    med_err = float(jnp.median(err1))
    # Tail forensics: how many lanes launched the box (>0.5 m from start)?
    moved = jnp.linalg.norm(
        res.xs[:, -1, nq - 3 : nq - 1] - x0s[:, nq - 3 : nq - 1], axis=1
    )
    n_smash = int(jnp.sum((err1 >= err0) & (moved > 0.5)))

    cfg = (
        f"fixed cap={args.cap}" if args.mode == "fixed"
        else f"brake k={args.k} floor={args.floor}"
    ) + (f" refresh={args.refresh}" if args.refresh else "") + (
        f" hold={args.hold}" if args.hold else "") + (
        f" guard={args.guard}(cap={args.guard_cap},"
        f"os={args.guard_overshoot},g={args.guard_gamma})"
        if args.guard != "off" else "")
    print(
        f"[{cfg} whinge={args.whinge} wvel={args.wvel}] "
        f"progressing {n_progress}/{batch}  median err {med_err:.3f}  "
        f"smashes {n_smash}  solves/s {batch * mpc_steps / wall:.1f}"
    )


if __name__ == "__main__":
    main()
