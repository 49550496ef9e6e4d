"""Runtime statistics & benchmarking utilities.

Re-derivation of the reference's observability surface (reference:
systems/analysis/simulator_print_stats.h PrintSimulatorStatistics;
multibody/contact_solvers/sap/sap_solver.h:176-185 SapSolverStats;
tools/performance/fixture_common.h benchmark statistics;
systems/analysis/realtime_rate_calculator.h).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np


@dataclasses.dataclass
class SolverStats:
    """Per-solve counters (the SapSolverStats shape)."""

    iterations: int = 0
    residual: float = 0.0
    converged: bool = False
    wall_time_s: float = 0.0

    def __str__(self):
        return (
            f"iterations={self.iterations} residual={self.residual:.2e} "
            f"converged={self.converged} wall={self.wall_time_s * 1e3:.2f}ms"
        )


@dataclasses.dataclass
class SimulatorStatistics:
    """Aggregate rollout counters (PrintSimulatorStatistics analog)."""

    num_steps: int = 0
    sim_time: float = 0.0
    wall_time_s: float = 0.0

    @property
    def realtime_rate(self) -> float:
        return self.sim_time / self.wall_time_s if self.wall_time_s > 0 else 0.0

    @property
    def steps_per_second(self) -> float:
        return self.num_steps / self.wall_time_s if self.wall_time_s > 0 else 0.0

    def print(self):
        print(
            f"steps={self.num_steps} sim_time={self.sim_time:.3f}s "
            f"wall={self.wall_time_s:.3f}s realtime_rate={self.realtime_rate:.2f}x "
            f"steps/s={self.steps_per_second:.0f}"
        )


def timed_rollout(fn: Callable, *args, sim_time: float, num_steps: int):
    """Run a jitted rollout, returning (result, SimulatorStatistics)."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    return out, SimulatorStatistics(
        num_steps=num_steps, sim_time=sim_time, wall_time_s=wall
    )


class Benchmark:
    """Controlled-repetition micro-benchmark (fixture_common.h role).

    Reports min/median/max over repetitions, separating the first (compile)
    call — the google-benchmark AddMinMaxStatistics analog.
    """

    def __init__(self, name: str, repetitions: int = 10):
        self.name = name
        self.repetitions = repetitions

    def run(self, fn: Callable, *args) -> Dict[str, float]:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0

        times: List[float] = []
        for _ in range(self.repetitions):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        stats = {
            "name": self.name,
            "first_call_s": compile_s,
            "min_s": float(np.min(times)),
            "median_s": float(np.median(times)),
            "max_s": float(np.max(times)),
            "reps": self.repetitions,
        }
        return stats

    @staticmethod
    def print(stats: Dict[str, float]):
        print(
            f"[{stats['name']}] first={stats['first_call_s'] * 1e3:.1f}ms "
            f"min={stats['min_s'] * 1e3:.3f}ms median={stats['median_s'] * 1e3:.3f}ms "
            f"max={stats['max_s'] * 1e3:.3f}ms (n={stats['reps']})"
        )


class VectorLog:
    """Port-trajectory recorder (systems/primitives/vector_log_sink.h role).

    With scan-based simulation whole trajectories come back as arrays; this
    wrapper adds the sample-time bookkeeping and npz export."""

    def __init__(self):
        self._times: List[float] = []
        self._values: List[np.ndarray] = []

    def log(self, t: float, value):
        self._times.append(float(t))
        self._values.append(np.asarray(value))

    def log_trajectory(self, ts, values):
        for t, v in zip(np.asarray(ts), np.asarray(values)):
            self.log(float(t), v)

    @property
    def sample_times(self) -> np.ndarray:
        return np.asarray(self._times)

    @property
    def data(self) -> np.ndarray:
        return np.stack(self._values) if self._values else np.zeros((0,))

    def save(self, path: str):
        np.savez(path, t=self.sample_times, x=self.data)
