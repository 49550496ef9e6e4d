"""MFU / roofline accounting for the three headline benchmarks.

VERDICT round-4 item 5: every perf number in BASELINE.md is relative
(vs round 1); this harness grounds them absolutely.  For each headline
program — the iiwa contact-MPC rollout (bench.py's EXACT program), the
quadrotor RTI MPC, and the MPM tile-slab substep — it reports:

  * FLOPs + bytes per unit work, straight from XLA's compiled-program
    cost analysis (the compiler's count of the HLO it actually emitted),
  * achieved TFLOP/s as % of TPU v5e f32 peak (MFU),
  * achieved GB/s as % of HBM bandwidth,
  * arithmetic intensity vs the ridge point -> MXU-/HBM-/dispatch-bound.

Reference discipline analog: multibody/benchmarking/README.md:28-40
(controlled-experiment protocol); the roofline is the TPU-native
extension the reference has no concept of.

Run: python benchmarks/roofline_report.py [--skip mpc,quad,mpm]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import _harness

parser = argparse.ArgumentParser()
parser.add_argument("--skip", type=str, default="")
parser.add_argument("--batch", type=int, default=0)
args = parser.parse_args()

if __name__ == "__main__":
    _harness.tpu_or_cpu_fallback()

import jax
import jax.numpy as jnp

if _harness.on_cpu():
    jax.config.update("jax_platforms", "cpu")

from drake_tpu.analysis import roofline


def timed(fn, x, sync):
    out = fn(x)
    sync(out)  # warm-up compile + honest readback sync
    t0 = time.perf_counter()
    out = fn(x)
    sync(out)
    return time.perf_counter() - t0


def report_mpc(cpu):
    from bench import build_rollout

    batch = args.batch or (4 if cpu else 1024)
    steps = 3 if cpu else 30
    rollout, x0s, info = build_rollout(batch, steps, cpu)
    costs = roofline.compiled_costs(rollout, x0s)
    # Timed call on a perturbed input (tunnel caches identical dispatches).
    wall = timed(rollout, x0s, lambda r: float(r.xs.sum()))
    x0s_b = x0s.at[:, 0].add(1e-6)
    wall = timed(rollout, x0s_b, lambda r: float(r.xs.sum()))
    return roofline.roofline_report(
        f"iiwa contact MPC solve (B={batch}, {steps} steps)",
        costs["flops"], costs["bytes"], wall,
        calls_per_unit=batch * steps,
    )


def report_quadrotor(cpu):
    from drake_tpu.control import mpc
    from drake_tpu.models import quadrotor
    from drake_tpu.systems import base as sysbase
    from drake_tpu.trajopt import ilqr

    dtype = jnp.float32
    batch = args.batch or (8 if cpu else 512)
    steps = 3 if cpu else 25
    system = quadrotor.make_system(quadrotor.default_params(dtype))
    params = system.default_params
    dsys = sysbase.discretize(system, 0.02, "rk4")
    u_h = quadrotor.hover_input(params)
    x_goal = jnp.zeros(12, dtype).at[0].set(2.0).at[2].set(1.0)
    obst = jnp.asarray([1.0, 0.0, 0.5], dtype)

    def running_cost(p, x, u, t):
        d2 = jnp.sum((x[:3] - obst) ** 2)
        pen = jnp.maximum(0.0, 0.4**2 - d2) ** 2 * 100.0
        return (0.05 * jnp.sum((u - u_h) ** 2)
                + 0.05 * jnp.sum((x - x_goal) ** 2) + pen)

    def final_cost(p, x):
        return 50.0 * jnp.sum((x - x_goal) ** 2)

    us0 = jnp.tile(u_h[None], (30, 1))

    def scenario(x0):
        return mpc.ilqr_mpc_rollout(
            dsys.g, running_cost, final_cost, params, x0, us0, steps,
            dt=0.02, u_lower=jnp.zeros(4, dtype),
            u_upper=jnp.full(4, 4.0, dtype),
            options=ilqr.IlqrOptions(rti=True),
            first_options=ilqr.IlqrOptions(max_iters=8),
        )

    key = jax.random.PRNGKey(0)
    x0s = jnp.zeros((batch, 12), dtype)
    x0s = x0s.at[:, :3].set(0.2 * jax.random.normal(key, (batch, 3), dtype))
    rollout = jax.jit(jax.vmap(scenario))
    costs = roofline.compiled_costs(rollout, x0s)
    timed(rollout, x0s, lambda r: float(r.xs.sum()))
    wall = timed(rollout, x0s.at[:, 0].add(1e-6),
                 lambda r: float(r.xs.sum()))
    return roofline.roofline_report(
        f"quadrotor RTI MPC solve (B={batch}, {steps} steps)",
        costs["flops"], costs["bytes"], wall,
        calls_per_unit=batch * steps,
    )


def report_mpm(cpu):
    from drake_tpu.mpm import solver as mpm
    from drake_tpu.mpm import tiles

    config = mpm.MpmConfig(
        grid_size=(64, 64, 128), dx=1.0 / 64, dt=1e-4, xla_only=cpu
    )
    state = mpm.make_particle_block(
        config, (0.4, 0.4, 0.5), (0.6, 0.6, 0.7)
    )
    config = config.capacities_for(state.x.shape[0])
    n_sub = 10 if cpu else 200
    run = jax.jit(
        lambda s: tiles.simulate_tiled(config, s, n_sub, resort_every=8)
    )
    costs = roofline.compiled_costs(run, state)
    timed(run, state, lambda o: float(o.x.sum()))
    out = run(state)
    float(out.x.sum())
    wall = timed(run, out, lambda o: float(o.x.sum()))
    return roofline.roofline_report(
        f"MPM tile-slab substep ({state.x.shape[0]} particles)",
        costs["flops"], costs["bytes"], wall,
        calls_per_unit=n_sub,
    )


def main():
    cpu = _harness.on_cpu()
    skip = set(args.skip.split(",")) if args.skip else set()
    reports = []
    for key, fn in (("mpc", report_mpc), ("quad", report_quadrotor),
                    ("mpm", report_mpm)):
        if key in skip:
            continue
        r = fn(cpu)
        reports.append(r)
        print(roofline.format_report(r), file=sys.stderr)
        print(json.dumps(r))
    if reports:
        # One bench-schema summary line: headline MFU (vs_baseline keys it
        # to 1% — any hard MFU "target" would be arbitrary; the value is
        # the honest absolute record).
        r0 = reports[0]
        print(json.dumps({
            "metric": f"headline MFU % of {r0['chip']} f32 peak "
                      f"({r0['name']}, {r0['bound']})"
                      + (", CPU FALLBACK" if cpu else ""),
            "value": round(r0["mfu_pct"], 3),
            "unit": "% peak",
            "vs_baseline": round(r0["mfu_pct"] / 1.0, 3),
        }))


if __name__ == "__main__":
    main()
