"""Shared benchmark harness: TPU probe w/ CPU fallback + one-line JSON.

Every file in benchmarks/ emits exactly one JSON line in bench.py's schema
({"metric", "value", "unit", "vs_baseline"}) so BASELINE.md numbers stay
reproducible from committed harnesses (the reference keeps the analogous
suite in multibody/benchmarking/, run protocol README:28-40).
"""

import json
import os
import sys
import threading
import time


def tpu_or_cpu_fallback(env_flag: str = "DRAKE_TPU_BENCH_CPU") -> None:
    """Probe the default backend; re-exec onto CPU if the TPU is wedged.

    Must be called before importing jax at module scope of the bench (the
    same self-protection bench.py uses: a wedged tunnel would otherwise hang
    the whole suite).
    """
    if os.environ.get(env_flag) == "1":
        return

    result = []

    def probe():
        try:
            import jax.numpy as jnp

            result.append(float(jnp.ones(4).sum()))
        except Exception:
            pass

    ok = False
    for _ in range(3):
        th = threading.Thread(target=probe, daemon=True)
        th.start()
        th.join(180.0)
        if result:
            ok = True
            break
        time.sleep(60)
    if not ok:
        env = dict(os.environ)
        env[env_flag] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = ""  # drop the axon sitecustomize
        os.execve(sys.executable, [sys.executable] + sys.argv, env)


def on_cpu(env_flag: str = "DRAKE_TPU_BENCH_CPU") -> bool:
    return os.environ.get(env_flag) == "1"


def emit(metric: str, value: float, unit: str, baseline: float) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": unit,
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )
