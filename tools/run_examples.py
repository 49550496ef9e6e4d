"""Example-fleet smoke runner: every example end-to-end on CPU.

The reference treats example binaries as integration tests (SURVEY §4:
acrobot BUILD runs swing-up and checks the final state).  This harness is
that gate for drake_tpu: each example runs with --cpu (+ fast flags where
the default is long) under a timeout; an example FAILS on nonzero exit,
timeout, or a FAILURE line in its output.

Usage: python tools/run_examples.py [name-substring ...]
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EX = os.path.join(ROOT, "examples")

# Per-example extra args (keep CPU runtime minutes, not tens of minutes).
ARGS = {
    "mpm_cloth_demo.py": ["--frames", "6", "--substeps-per-frame", "400"],
    "mpm_three_clothes.py": ["--frames", "8", "--substeps-per-frame",
                             "400", "--res", "10"],
    "coupled_mpm_mpc.py": ["--steps", "25"],
}
# cubic_polynomial_roa has no --cpu flag (pure f64 host math already).
NO_CPU_FLAG = {"cubic_polynomial_roa.py"}
TIMEOUT = {"default": 1200}


def main():
    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    names = sorted(
        f for f in os.listdir(EX)
        if f.endswith(".py") and not f.startswith("_")
    )
    if filters:
        names = [n for n in names if any(s in n for s in filters)]
    results = []
    for name in names:
        cmd = [sys.executable, os.path.join(EX, name)]
        if name not in NO_CPU_FLAG:
            cmd.append("--cpu")
        cmd += ARGS.get(name, [])
        t0 = time.time()
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True,
                timeout=TIMEOUT.get(name, TIMEOUT["default"]), cwd=ROOT,
            )
            out = proc.stdout + proc.stderr
            failed = proc.returncode != 0 or "FAILURE" in out
            status = "FAIL" if failed else "ok"
            detail = ""
            if failed:
                detail = " | " + " / ".join(out.strip().splitlines()[-3:])
        except subprocess.TimeoutExpired:
            status, detail = "TIMEOUT", ""
        wall = time.time() - t0
        results.append((name, status, wall))
        print(f"{status:8s} {wall:7.1f}s  {name}{detail}", flush=True)
    bad = [r for r in results if r[1] != "ok"]
    print(f"\n{len(results) - len(bad)}/{len(results)} examples pass")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
