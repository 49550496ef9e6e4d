"""Benchmark: iiwa contact-implicit MPC solves per second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

This is the BASELINE.json headline metric ("MPC solves/s/chip (iiwa SAP
contact)"): batched receding-horizon iLQR optimizing 7 joint torques THROUGH
the SAP contact dynamics of the iiwa-14 + free-box world (19 dofs, 12
contacts), gradients via the SAP solver's implicit-function-theorem
custom_vjp.  Every counted solve is a *working* solve: the same controller
pushes the box to its goal (examples/iiwa_push_mpc.py).

vs_baseline = value / 1000 — the >= 1 kHz-equivalent north star (the
reference repo publishes no absolute numbers; see BASELINE.md).
"""

import json
import os
import sys
import threading
import time


def _probe_tpu(timeout_s: float = 180.0) -> bool:
    """True if the default backend answers a trivial op within the timeout.

    The tunneled TPU can wedge on a bad kernel; a hung bench is worse than a
    CPU bench, so probe in a daemon thread and fall back if it stalls."""
    result = []

    def probe():
        try:
            import jax.numpy as jnp

            result.append(float(jnp.ones(4).sum()))
        except Exception:
            pass

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    return bool(result)


if __name__ == "__main__" and os.environ.get("DRAKE_TPU_BENCH_CPU") != "1":
    # Retry the probe: right after a TPU worker restart the tunnel can be
    # transiently unresponsive for a couple of minutes — that shouldn't doom
    # the bench to the CPU fallback.
    ok = False
    for attempt in range(3):
        if _probe_tpu():
            ok = True
            break
        time.sleep(60)
    if not ok:
        env = dict(os.environ)
        env["DRAKE_TPU_BENCH_CPU"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = ""  # drop the axon sitecustomize
        os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)

import jax
import jax.numpy as jnp

if os.environ.get("DRAKE_TPU_BENCH_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")


def build_rollout(batch=1024, mpc_steps=30, on_cpu=False, dtype=None):
    """Build the headline program: (rollout_jit, x0s, info).

    Shared with benchmarks/roofline_report.py so the MFU accounting runs
    the EXACT committed headline program.
    """
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "examples"))
    from iiwa_push_mpc import build_world

    from drake_tpu.contact import plant as cplant
    from drake_tpu.contact import sap
    from drake_tpu.control import mpc
    from drake_tpu.models import iiwa
    from drake_tpu.multibody import dynamics as dyn
    from drake_tpu.multibody import kinematics as kin
    from drake_tpu.trajopt import ilqr

    dtype = dtype or jnp.float32
    model, params, scene, side = build_world(dtype)
    nq, nv = model.num_positions, model.num_velocities
    h = 0.04
    dsys = cplant.make_discrete_system(model, params, scene, h)
    # Planning dynamics: fixed-4-iteration scan SAP (no while_loop, so
    # vmapped lanes don't lock-step to the slowest lane); the state advance
    # keeps the fully converged solver.
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
        push_dir = (box_goal - q_box_xy) / (
            jnp.linalg.norm(box_goal - q_box_xy) + 1e-6
        )
        push_point = box_pos - jnp.concatenate(
            [push_dir * (side / 2 + 0.055), jnp.zeros(1, x.dtype)]
        )
        ee_err = jnp.sum((p_ee - push_point) ** 2)
        # Round-3 anti-smash shaping (BASELINE.md round-3 headline study):
        # the round-2 failure tail was NOT unengageable draws — forensics
        # showed 2/3 of failing lanes LAUNCHED the box (>0.5 m) — so the
        # plan is penalized for box momentum (wvel) and for box speed
        # beyond what the push needs (overspeed hinge).
        box_sp2 = jnp.sum(x[nq + 10 : nq + 12] ** 2)  # planar box speed
        return (
            10.0 * box_err
            + 5.0 * ee_err
            + 0.01 * jnp.sum((x[:7] - q_arm) ** 2)
            + 1e-4 * jnp.sum((u - tau_g) ** 2)
            + 1e-4 * jnp.sum(x[nq:] ** 2)
            + 0.02 * jnp.sum(x[nq + 7 : nq + 13] ** 2)
            + 1.0 * jnp.maximum(box_sp2 - 0.25**2, 0.0)
        )

    def final_cost(p, x):
        return 400.0 * jnp.sum((x[nq - 3 : nq - 1] - box_goal) ** 2)

    horizon = 12
    us0 = jnp.tile(tau_g[None], (horizon, 1))
    lim = jnp.asarray(iiwa.EFFORT_LIMITS, dtype)

    # Real-time-iteration schedule (round-2 sweep winner, 998 solves/s):
    # a heavy 4-iteration/3-alpha cold-start solve plans; warm-started fused
    # RTI steps (ilqr.rti_solve: one always-accept Newton step with a free
    # monotonicity guard) track it each period.
    first_options = ilqr.IlqrOptions(
        max_iters=4, use_jacrev=True, alphas=(1.0, 0.25, 0.03)
    )
    light_options = ilqr.IlqrOptions(use_jacrev=True, rti=True)

    # Round-5 EVENT-TRIGGERED plan guard (the lever the round-4 sweep never
    # tried): when a solve's OWN predicted rollout carries the box PAST the
    # goal by > 10 cm along the push direction, that plan's torque deviation
    # (about gravity compensation) is scaled by 0.3 — per-lane, vectorized,
    # zero throughput cost.  Measured (headline_quality_sweep --guard
    # overshoot, same session as the 900/1024 baseline): 900 -> 964/1024
    # progressing (94.1%), median err 0.103 -> 0.087, smashes 65 -> 4,
    # solves/s unchanged (1061.4 -> 1060.8).  Full frontier in BASELINE.md.
    guard_gamma = 0.3
    guard_overshoot = 0.10

    def plan_guard(xs_plan, us_plan):
        b0 = xs_plan[0, nq - 3 : nq - 1]
        d0 = box_goal - b0
        dir0 = d0 / (jnp.linalg.norm(d0) + 1e-6)
        along = jnp.einsum(
            "ti,i->t", xs_plan[:, nq - 3 : nq - 1] - box_goal, dir0
        )
        scale = jnp.where(
            jnp.max(along) > guard_overshoot, guard_gamma, 1.0
        )
        return tau_g[None] + scale * (us_plan - tau_g[None])

    def scenario(x):
        return mpc.ilqr_mpc_rollout(
            dsys_plan.g, running_cost, final_cost, params, x, us0, mpc_steps,
            dt=h, u_lower=-lim, u_upper=lim,
            options=light_options,
            sim_dynamics=dsys.g,
            first_options=first_options,
            # Round-3: catches finite-but-diverged f32 lanes (|x| ~ 1e16
            # without a NaN) that the isfinite lane guard misses.
            x_bound=50.0,
            plan_guard=plan_guard,
        )

    key = jax.random.PRNGKey(0)
    x0s = jnp.tile(x0[None], (batch, 1))
    x0s = x0s.at[:, nq - 3 : nq - 1].add(
        0.03 * jax.random.normal(key, (batch, 2), dtype)
    )

    rollout = jax.jit(jax.vmap(scenario))
    info = {"nq": nq, "box_goal": box_goal, "horizon": horizon}
    return rollout, x0s, info


def main():
    on_cpu = os.environ.get("DRAKE_TPU_BENCH_CPU") == "1"
    # 30 MPC steps: the round-2 frontier winner (1,084.6 solves/s measured,
    # median err 0.135 — same tracking as 20 steps at +9% throughput; the
    # full schedule frontier is tabulated in BASELINE.md).
    batch = 1024 if not on_cpu else 4
    mpc_steps = 30 if not on_cpu else 3
    rollout, x0s, info = build_rollout(batch, mpc_steps, on_cpu)
    nq, box_goal, horizon = info["nq"], info["box_goal"], info["horizon"]

    res = rollout(x0s)
    float(res.xs.sum())  # host readback (block_until_ready is a no-op on the
    # tunneled backend)

    # Timed call on a (trivially) different input: the tunnel caches
    # repeated identical dispatches at small result sizes; perturbing costs
    # nothing and keeps the measurement honest at every scale.
    x0s_b = x0s.at[:, nq - 3].add(1e-6)
    t0 = time.perf_counter()
    res_t = rollout(x0s_b)
    float(res_t.xs.sum())
    wall = time.perf_counter() - t0

    # Controller effectiveness: box moved toward its goal.
    err0 = jnp.linalg.norm(x0s[:, nq - 3 : nq - 1] - box_goal, axis=1)
    err1 = jnp.linalg.norm(res.xs[:, -1, nq - 3 : nq - 1] - box_goal, axis=1)
    n_progress = int(jnp.sum(err1 < err0))
    med_err = float(jnp.median(err1))

    solves_per_s = batch * mpc_steps / wall
    print(
        json.dumps(
            {
                "metric": "iiwa contact-implicit MPC solves/s/chip (SAP, 19-dof "
                f"arm+box, horizon={horizon}, batch={batch}, f32, "
                f"{n_progress}/{batch} progressing, median err {med_err:.3f}"
                + (", CPU FALLBACK - tpu unresponsive" if on_cpu else "")
                + ")",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
