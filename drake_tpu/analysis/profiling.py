"""Profiling utilities: jax profiler traces + staged timing.

The reference's performance tier is google-benchmark fixtures plus a
controlled-experiment runner (tools/performance/, SURVEY §5).  The TPU
equivalents here:

  - `trace(path)`: context manager capturing a jax profiler trace
    (open with TensorBoard / xprof; includes XLA HLO cost breakdowns);
  - `time_fn`: compile-aware wall timing with HOST READBACK sync — on the
    tunneled TPU `block_until_ready` does not block, so every timing sums
    the outputs to host (the project-wide timing discipline);
  - `staged`: label -> timing dict accumulation for pipeline breakdowns.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(out) -> float:
    """Force device->host readback of every leaf (the only reliable sync
    on the tunneled backend)."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(out):
        total += float(jnp.asarray(leaf).sum())
    return total


def time_fn(fn: Callable, *args, repeats: int = 3) -> Dict[str, float]:
    """Returns {'compile_s', 'run_s'} for fn(*args): first call timed as
    compile+run, subsequent calls averaged."""
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
        _sync(out)
    run_s = (time.perf_counter() - t0) / repeats
    return {"compile_s": compile_s, "run_s": run_s}


class Staged:
    """Accumulate labeled stage timings (pipeline breakdown reports)."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, label: str):
        t0 = time.perf_counter()
        yield
        self.times[label] = self.times.get(label, 0.0) + (
            time.perf_counter() - t0
        )

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [
            f"  {k:<32s} {v * 1e3:9.2f} ms ({100 * v / max(total, 1e-12):4.1f}%)"
            for k, v in sorted(
                self.times.items(), key=lambda kv: -kv[1]
            )
        ]
        return "\n".join(lines + [f"  {'TOTAL':<32s} {total * 1e3:9.2f} ms"])
