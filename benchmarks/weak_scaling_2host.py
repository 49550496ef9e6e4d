"""Multi-PROCESS (2-host) weak-scaling harness for the flagship contact step.

The reference is a single-process library (its only distributed piece is
LCM message passing, reference: lcm/drake_lcm.h:19); SURVEY.md §2.9 and
BASELINE.md's north star (">=80% weak-scaling efficiency at 2 hosts")
prescribe a REAL multi-process path: `jax.distributed.initialize` + a
global mesh spanning processes.  This harness runs that path hermetically
on one machine: each process gets K virtual CPU devices and cross-process
collectives ride the Gloo transport — the identical SPMD program XLA
would partition over DCN between real hosts.

Two stages per worker:

  A. scenario-parallel weak scaling: the iiwa+box SAP contact step,
     per-process batch CONSTANT, batch axis sharded over the global
     (cross-process) mesh; throughput per process should stay flat from
     1 -> 2 processes (the program has no cross-scenario collectives).
  B. cross-process TP-SAP: the same contact problem's constraint rows
     sharded over the global mesh; the Newton gradient/Hessian psum
     reductions CROSS THE PROCESS BOUNDARY, validated against the dense
     single-device solve.

Launcher mode (default) spawns the 1-process and 2-process runs and
reports weak-scaling efficiency in bench.py's JSON schema:

    python benchmarks/weak_scaling_2host.py [--per-process 16 --steps 10]

Worker mode (spawned):

    python benchmarks/weak_scaling_2host.py --worker --process-id 0 \
        --num-processes 2 --devices-per-process 4 --port 12360
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

parser = argparse.ArgumentParser()
parser.add_argument("--worker", action="store_true")
parser.add_argument("--process-id", type=int, default=0)
parser.add_argument("--num-processes", type=int, default=1)
parser.add_argument("--devices-per-process", type=int, default=4)
parser.add_argument("--port", type=int, default=12360)
parser.add_argument("--per-process", type=int, default=16)
parser.add_argument("--steps", type=int, default=10)
parser.add_argument("--tiny", action="store_true",
                    help="dryrun mode: minimal shapes, correctness only")
args = parser.parse_args()


def worker():
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "examples"))

    from drake_tpu.parallel import distributed as dist

    dist.initialize(
        f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
        local_virtual_devices=args.devices_per_process,
    )
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from iiwa_push_mpc import build_world

    from drake_tpu.contact import plant as cplant
    from drake_tpu.contact import sap
    from drake_tpu.models import iiwa
    from drake_tpu.multibody import dynamics as dyn

    assert jax.process_count() == args.num_processes
    mesh = dist.global_mesh("batch")
    n_global = len(jax.devices())
    lead = args.process_id == 0

    dtype = jnp.float32
    model, params, scene, side = build_world(dtype)
    nq, nv = model.num_positions, model.num_velocities
    dsys = cplant.make_discrete_system(model, params, scene, 0.04)
    q0 = np.concatenate(
        [
            np.asarray(iiwa.home_position(dtype)),
            np.asarray([1, 0, 0, 0, 0.62, 0.0, side / 2], np.float32),
        ]
    )
    x0 = np.concatenate([q0, np.zeros(nv, np.float32)])
    tau_g = np.asarray(
        dyn.bias_forces(
            model, params, jnp.asarray(q0), jnp.zeros(nv, dtype)
        )[:7]
    )

    # ---- stage A: scenario-parallel weak scaling --------------------------
    B_local = 4 if args.tiny else args.per_process
    steps = 1 if args.tiny else args.steps
    rng = np.random.default_rng(args.process_id)
    x0s_local = np.tile(x0[None], (B_local, 1)).astype(np.float32)
    x0s_local[:, nq - 3 : nq - 1] += 0.03 * rng.standard_normal(
        (B_local, 2)
    ).astype(np.float32)
    us_local = np.tile(tau_g[None], (B_local, 1)).astype(np.float32)
    x0s = dist.shard_local_batch(jnp.asarray(x0s_local), mesh)
    us = dist.shard_local_batch(jnp.asarray(us_local), mesh)
    B_global = B_local * args.num_processes

    @jax.jit
    def roll(xs, uu):
        def body(x, _):
            x2 = jax.vmap(lambda xi, ui: dsys.g(params, xi, ui, 0.0))(x, uu)
            return x2, None

        return jax.lax.scan(body, xs, None, length=steps)[0]

    out = roll(x0s, us)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = roll(x0s, us)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    total = dist.process_sum(out[:, :1] * 0 + 1.0, mesh)  # cross-proc psum
    assert float(total) == float(B_global), (
        f"cross-process psum wrong: {float(total)} != {B_global}"
    )
    sps = B_global * steps / wall
    if lead:
        print(
            json.dumps(
                {
                    "metric": (
                        f"2host stage A: contact steps/s "
                        f"({args.num_processes} proc x "
                        f"{args.devices_per_process} dev, "
                        f"batch {B_global})"
                    ),
                    "value": round(sps, 1),
                    "unit": "steps/s",
                    "procs": args.num_processes,
                    "steps_per_s": sps,
                }
            ),
            flush=True,
        )

    # ---- stage B: TP-SAP with psum crossing the process boundary ----------
    from drake_tpu.parallel.tp_sap import solve_sap_sharded

    sp = sap.SapParameters(max_iterations=30)
    q_c = jnp.asarray(q0).at[nq - 3].add(-0.04)
    v_c = jnp.zeros(nv, dtype)
    data, _ = sap.assemble(
        model, params, scene, q_c, v_c, jnp.zeros(nv, dtype), 0.04,
        sap.SapParameters(),
    )
    data = jax.tree_util.tree_map(np.asarray, data)
    tp_mesh = Mesh(np.asarray(jax.devices()), ("c",))
    sol_tp = solve_sap_sharded(data, v_c, tp_mesh, iterations=12)
    v_tp = np.asarray(
        jax.device_get(
            jax.jit(lambda v: v, out_shardings=NamedSharding(tp_mesh, P()))(
                sol_tp.v
            )
        )
    )
    sol_ref = sap.solve_sap(
        jax.tree_util.tree_map(jnp.asarray, data), v_c, sp
    )
    err = float(np.max(np.abs(v_tp - np.asarray(sol_ref.v))))
    assert np.all(np.isfinite(v_tp)), "non-finite cross-process TP-SAP"
    assert err < 1e-3, f"cross-process TP-SAP vs dense mismatch: {err}"
    if lead:
        print(
            json.dumps(
                {
                    "metric": (
                        f"2host stage B: TP-SAP constraint rows sharded over "
                        f"{n_global} devices across "
                        f"{args.num_processes} processes"
                    ),
                    "value": err,
                    "unit": "|v_tp - v_dense|",
                }
            ),
            flush=True,
        )
        print("WORKER_OK", flush=True)


def spawn_run(num_processes, devices_per_process, port, extra):
    """Spawn num_processes workers; return process-0 stdout."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no axon TPU in workers
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(num_processes):
        cmd = [
            sys.executable, os.path.abspath(__file__), "--worker",
            "--process-id", str(pid),
            "--num-processes", str(num_processes),
            "--devices-per-process", str(devices_per_process),
            "--port", str(port),
        ] + extra
        procs.append(
            subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True, cwd=REPO,
            )
        )
    outs = []
    for p in procs:
        try:
            out, errtxt = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError("2host worker timed out")
        outs.append((p.returncode, out, errtxt))
    for rc, out, errtxt in outs:
        if rc != 0:
            raise RuntimeError(
                f"worker failed rc={rc}\nstdout:\n{out}\nstderr:\n"
                + errtxt[-4000:]
            )
    lead_out = outs[0][1]
    assert "WORKER_OK" in lead_out, f"no WORKER_OK:\n{lead_out}"
    return lead_out


def launcher():
    extra = ["--per-process", str(args.per_process), "--steps", str(args.steps)]
    if args.tiny:
        extra.append("--tiny")
    results = {}
    for nproc in (1, 2):
        out = spawn_run(nproc, args.devices_per_process, args.port + nproc, extra)
        for line in out.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
                print(json.dumps(rec))
                if "steps_per_s" in rec:
                    results[nproc] = rec["steps_per_s"]
    if not args.tiny and 1 in results and 2 in results:
        eff = results[2] / (2.0 * results[1])
        print(
            json.dumps(
                {
                    "metric": (
                        "weak-scaling efficiency 1->2 processes "
                        "(virtual CPU devices + Gloo; measures host "
                        "contention — program is collective-free on the "
                        "scenario axis, so real-DCN efficiency ~1.0)"
                    ),
                    "value": round(eff, 3),
                    "unit": "efficiency",
                    "vs_baseline": round(eff / 0.8, 3),
                }
            )
        )


if __name__ == "__main__":
    if args.worker:
        worker()
    else:
        launcher()
