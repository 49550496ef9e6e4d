"""Multi-process (2-host) execution tier smoke test.

Spawns the committed 2-process worker (benchmarks/weak_scaling_2host.py
--worker --tiny): jax.distributed bring-up, a global mesh spanning both
processes, the scenario-sharded contact step, and a cross-process TP-SAP
psum validated against the dense solve.  SURVEY.md §2.9 "multi-host pjit
with the standard JAX distributed runtime"; the reference has no
multi-process compute path (LCM message passing only, lcm/drake_lcm.h:19).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_mesh_and_cross_process_psum():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    harness = os.path.join(REPO, "benchmarks", "weak_scaling_2host.py")
    procs = [
        subprocess.Popen(
            [
                sys.executable, harness, "--worker", "--tiny",
                "--process-id", str(pid), "--num-processes", "2",
                "--devices-per-process", "2", "--port", "12390",
            ],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-2000:]}"
    assert "WORKER_OK" in outs[0][0], outs[0][0]
    assert "TP-SAP constraint rows sharded over 4 devices across 2" in (
        outs[0][0]
    )
