"""MPM elastic-block substeps/s (BASELINE.md row 3).

Default path: the round-3 tile-slab pipeline (mpm/tiles.py — channel-major
plane state, factorized weights, 8^3 windows, sort amortized over
--resort substeps).  --stencil times the round-2 stencil-G2P path;
--fused times mpm_substep_blocked (the one-sort blocked pipeline).

--scale N grows the particle block (1 = the 17.6k round-1 config; 2 =
~133k particles) with capacity autosizing.

17.6k particles on a 64x64x128 grid (the CUDA pipeline role, reference
multibody/gpu_mpm/cuda_mpm_solver.cu:18-154).  Times a lax.scan rollout,
asserts zero capacity overflow.  The timed call runs on the WARM-UP
call's output, never on a repeated identical input — the TPU tunnel
caches identical dispatches, which silently fakes arbitrarily high rates.
vs_baseline is the ratio to the round-1 measured 78 substeps/s (v5e 1
chip, f32).
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
parser.add_argument("--stencil", action="store_true")
parser.add_argument("--resort", type=int, default=8)
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
    n_sub = args.substeps or (10 if cpu else 200)

    if args.fused or args.stencil:
        substep = mpm.mpm_substep_blocked if args.fused else mpm.mpm_substep

        @jax.jit
        def run(s):
            def body(s, _):
                s = substep(config, s)
                return s, s.dropped

            return jax.lax.scan(body, s, None, length=n_sub)[0]

        label = "fused blocked pipeline" if args.fused else "stencil G2P"
    else:
        from drake_tpu.mpm import tiles

        run = jax.jit(
            lambda s: tiles.simulate_tiled(
                config, s, n_sub, resort_every=args.resort
            )
        )
        label = f"tile-slab pipeline, resort_every={args.resort}"

    out = run(state)
    float(out.x.sum())  # warm-up + honest sync
    t0 = time.perf_counter()
    out = run(out)  # timed call on a DIFFERENT input (tunnel caching)
    float(out.x.sum())
    wall = time.perf_counter() - t0

    assert int(out.dropped) == 0, "capacity overflow (dropped > 0)"
    assert bool(jnp.all(jnp.isfinite(out.x))), "non-finite particles"

    _harness.emit(
        f"MPM elastic block substeps/s ({state.x.shape[0]} particles, "
        f"64x64x128 grid, {label}"
        + (", CPU FALLBACK" if cpu else "")
        + ")",
        n_sub / wall,
        "substeps/s",
        78.0,
    )


if __name__ == "__main__":
    main()
