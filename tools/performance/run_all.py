#!/usr/bin/env python3
"""Benchmark-suite runner (the reference's tools/performance/benchmark_tool.py
+ multibody/benchmarking README run protocol, SURVEY §2.8).

Runs every harness in benchmarks/bench_*.py plus the headline bench.py,
each as a subprocess under a timeout, collects the one-line JSON each emits
(the bench.py schema: metric/value/unit/vs_baseline), and writes an
aggregate report.

The reference pins CPU governor + affinity for controlled experiments; the
TPU analogue here is serialization (one harness at a time, the chip is
exclusive through the tunnel) and the per-harness TPU probe with CPU
fallback already built into benchmarks/_harness.py.

Usage:
  python tools/performance/run_all.py [--timeout 550] [--out report.json]
  python tools/performance/run_all.py --cpu     # force CPU (hermetic)
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent.parent


def run_one(path: pathlib.Path, timeout: float, env) -> dict:
    try:
        proc = subprocess.run(
            [sys.executable, str(path)],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=env,
            cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        return {"harness": path.name, "error": f"timeout after {timeout}s"}
    record = {"harness": path.name, "rc": proc.returncode}
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                record.update(json.loads(line))
                return record
            except json.JSONDecodeError:
                continue
    record["error"] = "no JSON line in output"
    record["tail"] = proc.stdout[-400:] + proc.stderr[-400:]
    return record


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=550.0)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true", help="force CPU fallback")
    args = ap.parse_args()

    env = dict(os.environ)
    if args.cpu:
        env["DRAKE_TPU_BENCH_CPU"] = "1"

    harnesses = [ROOT / "bench.py"] + sorted((ROOT / "benchmarks").glob("bench_*.py"))
    report = []
    for path in harnesses:
        print(f"-- {path.name}", file=sys.stderr)
        record = run_one(path, args.timeout, env)
        print(json.dumps(record))
        report.append(record)

    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(report, indent=1))
    bad = [r for r in report if "error" in r or r.get("rc")]
    print(f"# {len(report) - len(bad)}/{len(report)} harnesses produced metrics",
          file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
