"""Weak-scaling harness: batched contact MPC over a device mesh.

Shards the flagship iiwa+box SAP contact step over 1/2/4/8 devices with a
CONSTANT per-device batch (weak scaling) and reports throughput and
efficiency vs the single-device run.  On this machine it runs on the
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) —
the sharding program is exactly what executes on a real multi-chip slice.

CAVEAT on the numbers here: the 8 "devices" share ONE physical CPU, so
the virtual-mesh efficiency measures host core contention, NOT
interconnect behavior.  The batch-sharded program contains ZERO
cross-device collectives (check the jaxpr: no psum/all-gather), so on
real chips weak scaling is communication-free; this harness exists to
(a) prove the sharded program compiles and executes at every mesh size
and (b) be the measurement recipe to run on real hardware.  Emits one
JSON line per mesh size plus a summary line in bench.py's schema.

Run:  python benchmarks/weak_scaling.py [--per-device 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

parser = argparse.ArgumentParser()
parser.add_argument("--per-device", type=int, default=32)
parser.add_argument("--steps", type=int, default=20)
args = parser.parse_args()

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iiwa_push_mpc import build_world

from drake_tpu.contact import plant as cplant
from drake_tpu.models import iiwa
from drake_tpu.multibody import dynamics as dyn


def main():
    dtype = jnp.float32
    model, params, scene, side = build_world(dtype)
    nq, nv = model.num_positions, model.num_velocities
    dsys = cplant.make_discrete_system(model, params, scene, 0.04)
    q_arm = iiwa.home_position(dtype)
    q0 = jnp.concatenate(
        [q_arm, jnp.asarray([1, 0, 0, 0, 0.62, 0.0, side / 2], dtype)]
    )
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])
    tau_g = dyn.bias_forces(model, params, q0, jnp.zeros(nv, dtype))[:7]

    devices = jax.devices()
    results = {}
    for n_dev in (1, 2, 4, 8):
        if n_dev > len(devices):
            break
        batch = args.per_device * n_dev
        mesh = Mesh(devices[:n_dev], ("batch",))
        shard = NamedSharding(mesh, P("batch"))
        key = jax.random.PRNGKey(0)
        x0s = jnp.tile(x0[None], (batch, 1))
        x0s = x0s.at[:, nq - 3 : nq - 1].add(
            0.03 * jax.random.normal(key, (batch, 2), dtype)
        )
        x0s = jax.device_put(x0s, shard)
        us = jax.device_put(
            jnp.tile(tau_g[None], (batch, 1)), shard
        )

        @jax.jit
        def roll(xs, uu):
            def body(x, _):
                x2 = jax.vmap(lambda xi, ui: dsys.g(params, xi, ui, 0.0))(
                    x, uu
                )
                return x2, None

            return jax.lax.scan(body, xs, None, length=args.steps)[0]

        out = roll(x0s, us)
        float(out.sum())  # warm + sync
        t0 = time.perf_counter()
        out = roll(x0s, us)
        float(out.sum())
        wall = time.perf_counter() - t0
        sps = batch * args.steps / wall
        results[n_dev] = sps
        eff = sps / (results[1] * n_dev)
        print(
            json.dumps(
                {
                    "metric": f"sharded SAP contact steps/s ({n_dev} dev, "
                    f"batch {batch})",
                    "value": round(sps, 1),
                    "unit": "steps/s",
                    "vs_baseline": round(eff, 3),
                }
            )
        )
    if 8 in results:
        print(
            json.dumps(
                {
                    "metric": "weak-scaling efficiency at 8 devices "
                    "(virtual CPU mesh; >=0.8 is the 2-host bar)",
                    "value": round(results[8] / (results[1] * 8), 3),
                    "unit": "efficiency",
                    "vs_baseline": round(
                        results[8] / (results[1] * 8) / 0.8, 3
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
