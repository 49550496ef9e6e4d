"""Roofline / MFU accounting for benchmark programs.

The reference ships controlled-experiment *discipline* for its
benchmarks (reference: multibody/benchmarking/README.md:28-40 — CPU
governor, affinity, min/max stats) but no notion of hardware utilization.
On TPU the honest absolute yardstick is the roofline: FLOPs executed vs
the MXU peak and bytes moved vs HBM bandwidth.  This module computes
both for any jitted program straight from XLA's own compiled-program
cost analysis (``Compiled.cost_analysis()`` — the compiler's flop/byte
count of the HLO it actually emitted), so every benchmark can report

  * model FLOP utilization (MFU, % of chip peak for the dtype),
  * achieved HBM bandwidth (% of peak),
  * arithmetic intensity vs the machine ridge point -> a bound
    classification (MXU-bound / HBM-bound / dispatch-bound).

Peaks are the published TPU v5e (v5 lite) numbers; override via
``Peaks`` for other chips.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class Peaks:
    """Published per-chip peaks (TPU v5e defaults)."""

    flops_bf16: float = 197e12  # MXU bf16 FLOP/s
    flops_f32: float = 98.5e12  # f32 via MXU passes ~ half bf16
    hbm_bytes_per_s: float = 819e9  # HBM bandwidth
    name: str = "TPU v5e"


V5E = Peaks()


def compiled_costs(jitted_fn, *args, **kwargs) -> dict:
    """{'flops', 'bytes'} of the compiled program (XLA cost analysis)."""
    compiled = jitted_fn.lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }


def roofline_report(
    name: str,
    flops_per_call: float,
    bytes_per_call: float,
    seconds_per_call: float,
    dtype: str = "f32",
    peaks: Peaks = V5E,
    calls_per_unit: float = 1.0,
) -> dict:
    """MFU/bandwidth/bound classification for one benchmark program.

    ``calls_per_unit`` converts program-level costs to the reported unit
    (e.g. a program that runs 20 MPC solves per call -> 20).
    """
    flops = flops_per_call / calls_per_unit
    bts = bytes_per_call / calls_per_unit
    secs = seconds_per_call / calls_per_unit
    peak = peaks.flops_bf16 if dtype == "bf16" else peaks.flops_f32
    achieved_flops = flops / secs if secs > 0 else 0.0
    achieved_bw = bts / secs if secs > 0 else 0.0
    mfu = achieved_flops / peak
    hbm_frac = achieved_bw / peaks.hbm_bytes_per_s
    intensity = flops / bts if bts > 0 else float("inf")
    ridge = peak / peaks.hbm_bytes_per_s  # FLOP/byte at the roofline knee
    # Bound classification: whichever ceiling the program runs closest to;
    # if it is far from BOTH (<15%), the chip is starved — dispatch/
    # latency-bound (the common case for tiny-shape robotics programs).
    if mfu < 0.15 and hbm_frac < 0.15:
        bound = "dispatch-bound"
    elif intensity >= ridge:
        bound = "MXU-bound"
    else:
        bound = "HBM-bound"
    return {
        "name": name,
        "chip": peaks.name,
        "dtype": dtype,
        "flops_per_unit": flops,
        "bytes_per_unit": bts,
        "seconds_per_unit": secs,
        "achieved_tflops": achieved_flops / 1e12,
        "mfu_pct": 100.0 * mfu,
        "achieved_gb_per_s": achieved_bw / 1e9,
        "hbm_pct": 100.0 * hbm_frac,
        "arithmetic_intensity": intensity,
        "ridge_intensity": ridge,
        "bound": bound,
    }


def format_report(r: dict) -> str:
    return (
        f"{r['name']}: {r['flops_per_unit'] / 1e6:.2f} MFLOP/unit, "
        f"{r['bytes_per_unit'] / 1e6:.2f} MB/unit, "
        f"{r['seconds_per_unit'] * 1e3:.3f} ms/unit -> "
        f"{r['achieved_tflops']:.3f} TFLOP/s "
        f"({r['mfu_pct']:.2f}% {r['dtype']} peak), "
        f"{r['achieved_gb_per_s']:.1f} GB/s "
        f"({r['hbm_pct']:.1f}% HBM), "
        f"AI {r['arithmetic_intensity']:.1f} vs ridge "
        f"{r['ridge_intensity']:.0f} FLOP/B => {r['bound']}"
    )
