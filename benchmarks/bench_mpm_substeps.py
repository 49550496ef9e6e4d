"""MPM elastic-block substeps/s (BASELINE.md row 3).

--scale N grows the particle block (1 = the 17.6k round-1 config; 2 =
~140k particles) with capacity autosizing, for the >100k-particle
dispatch-crossover re-evaluation; --fused times mpm_substep_blocked (the
one-sort fully blocked pipeline) instead of the default stencil-G2P path.

17.6k particles on a 64x64x128 grid, the blocked sort + Pallas DMA/MXU P2G
pipeline (the CUDA particle_to_grid_kernel role,
reference multibody/gpu_mpm/cuda_mpm_kernels.cuh:419).  Times a 50-substep
lax.scan, asserts zero capacity overflow.  vs_baseline is the ratio to the
round-1 measured 78 substeps/s (v5e 1 chip, f32).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _harness

import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--scale", type=float, default=1.0)
parser.add_argument("--fused", action="store_true")
parser.add_argument("--substeps", type=int, default=0)
args = parser.parse_args()

if __name__ == "__main__":
    _harness.tpu_or_cpu_fallback()

import jax
import jax.numpy as jnp

if _harness.on_cpu():
    jax.config.update("jax_platforms", "cpu")


def main():
    from drake_tpu.mpm import solver as mpm

    cpu = _harness.on_cpu()
    config = mpm.MpmConfig(
        grid_size=(64, 64, 128), dx=1.0 / 64, dt=1e-4, xla_only=cpu
    )
    # --scale grows the block isotropically around its center
    half = 0.1 * args.scale
    cz = 0.6
    lo = (0.5 - half, 0.5 - half, cz - half)
    hi = (0.5 + half, 0.5 + half, cz + half)
    state = mpm.make_particle_block(config, lo, hi)
    # Size the active-block capacity for the scene (P2G cost is linear in
    # this capacity — see capacities_for and benchmarks/profile_mpm.py).
    config = config.capacities_for(state.x.shape[0])
    n_sub = args.substeps or (10 if cpu else 50)
    substep = mpm.mpm_substep_blocked if args.fused else mpm.mpm_substep

    @jax.jit
    def run(s):
        def body(s, _):
            s = substep(config, s)
            return s, s.dropped

        return jax.lax.scan(body, s, None, length=n_sub)

    out, dropped = run(state)
    float(out.x.sum())
    t0 = time.perf_counter()
    out, dropped = run(state)
    float(out.x.sum())
    wall = time.perf_counter() - t0

    assert int(jnp.max(dropped)) == 0, "capacity overflow (dropped > 0)"
    assert bool(jnp.all(jnp.isfinite(out.x))), "non-finite particles"

    _harness.emit(
        f"MPM elastic block substeps/s ({state.x.shape[0]} particles, "
        "64x64x128 grid, "
        + ("fused blocked pipeline, " if args.fused else "")
        + ("XLA scatter, CPU FALLBACK" if cpu else "blocked Pallas P2G")
        + ")",
        n_sub / wall,
        "substeps/s",
        78.0,
    )


if __name__ == "__main__":
    main()
