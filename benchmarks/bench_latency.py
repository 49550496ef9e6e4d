"""Single-stream MPC solve latency: p50/p90 per solve (BASELINE.json metric).

Times ONE scenario's MPC period end-to-end — one warm-started RTI solve
through the SAP contact dynamics plus the converged-sim state advance —
with a host readback each period (the tunneled TPU's block_until_ready is
a no-op, so the readback IS the sync).  This is the real-time-control
number: a 1 kHz loop needs p50 < 1 ms on-device; the tunnel adds ~25-50 ms
of readback, reported separately via the batch-amortized column.

Prints one JSON line.  Run: python benchmarks/bench_latency.py [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--repeats", type=int, default=50)
parser.add_argument(
    "--chain", type=int, default=0,
    help="chain N periods inside ONE jitted scan and report wall/N — "
         "amortizes dispatch+readback to a single occurrence, the honest "
         "per-solve latency through a high-latency tunnel (BASELINE.md "
         "single-stream recipe)",
)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from iiwa_push_mpc import build_world

from drake_tpu.contact import plant as cplant
from drake_tpu.contact import sap
from drake_tpu.models import iiwa
from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody import kinematics as kin
from drake_tpu.trajopt import ilqr


def main():
    dtype = jnp.float32
    model, params, scene, side = build_world(dtype)
    nq, nv = model.num_positions, model.num_velocities
    h = 0.04
    dsys = cplant.make_discrete_system(model, params, scene, h)
    sp_plan = sap.SapParameters(unroll_iterations=4, line_search_points=12)
    dsys_plan = cplant.make_discrete_system(
        model, params, scene, h, sap_params=sp_plan)

    q_arm = iiwa.home_position(dtype)
    q0 = jnp.concatenate(
        [q_arm, jnp.asarray([1, 0, 0, 0, 0.62, 0.0, side / 2], dtype)])
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])
    box_goal = jnp.asarray([0.78, 0.15], dtype)
    tau_g = dyn.bias_forces(model, params, q0, jnp.zeros(nv, dtype))[:7]
    ee_body = model.body_index("link7")

    def running_cost(p, x, u, t):
        q_box_xy = x[nq - 3 : nq - 1]
        box_err = jnp.sum((q_box_xy - box_goal) ** 2)
        _, p_WB = kin.forward_kinematics(model, p, x[:nq])
        ee_err = jnp.sum((p_WB[ee_body] - jnp.concatenate(
            [q_box_xy, jnp.zeros(1, x.dtype)])) ** 2)
        return (10.0 * box_err + 5.0 * ee_err
                + 1e-4 * jnp.sum((u - tau_g) ** 2))

    def final_cost(p, x):
        return 400.0 * jnp.sum((x[nq - 3 : nq - 1] - box_goal) ** 2)

    horizon = 12
    us0 = jnp.tile(tau_g[None], (horizon, 1))
    lim = jnp.asarray(iiwa.EFFORT_LIMITS, dtype)

    @jax.jit
    def period(x, us_warm):
        """One MPC period: warm RTI solve + converged sim advance."""
        res = ilqr.rti_solve(
            dsys_plan.g, running_cost, final_cost, params, x, us_warm,
            dt=h, u_lower=-lim, u_upper=lim)
        x_next = dsys.g(params, x, res.us[0], 0.0)
        us_next = jnp.concatenate([res.us[1:], res.us[-1:]], axis=0)
        return x_next, us_next

    if args.chain > 0:
        N = args.chain

        @jax.jit
        def chained(x, us):
            def body(carry, _):
                xc, uc = carry
                return period(xc, uc), None

            (xf, uf), _ = jax.lax.scan(body, (x, us), None, length=N)
            return xf, uf

        xf, uf = chained(x0, us0)  # compile
        float(xf.sum())
        t0 = time.perf_counter()
        xf2, _ = chained(xf, uf)  # timed on DIFFERENT inputs (tunnel cache)
        float(xf2.sum())
        per = (time.perf_counter() - t0) / N * 1e3
        print(json.dumps({
            "metric": "iiwa contact MPC single-stream solve latency "
                      f"(chained x{N}, dispatch+readback amortized; "
                      f"backend={jax.default_backend()})",
            "value": round(per, 3),
            "unit": "ms",
            "vs_baseline": round(1.0 / max(per, 1e-9), 3),
        }))
        return

    x, us = x0, us0
    x, us = period(x, us)  # compile
    float(x.sum())

    lat = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        x, us = period(x, us)
        float(x.sum())  # host readback = sync on the tunneled backend
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    p50, p90 = float(np.percentile(lat, 50)), float(np.percentile(lat, 90))
    print(json.dumps({
        "metric": "iiwa contact MPC single-stream solve latency p50 "
                  f"(p90={p90:.1f} ms, includes host readback; "
                  f"backend={jax.default_backend()})",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(1.0 / max(p50, 1e-9), 3),  # solves/ms vs 1 kHz
    }))


if __name__ == "__main__":
    main()
