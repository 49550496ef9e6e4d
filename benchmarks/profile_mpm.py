"""Per-stage MPM substep profile at a given particle scale.

Times each pipeline stage as its own jitted program (P2G blocked, grid
update, stencil G2P, full substep) and sweeps `max_active_blocks` — the
P2G block-matmul and DMA cost scales with the ACTIVE-BLOCK CAPACITY, not
the particle count, so an oversized capacity burns linear time
(cuda_mpm_solver.cu sizes its touched-block list exactly;
gather_touched_grid_kernel :546).

Run:  python benchmarks/profile_mpm.py [--scale 2] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import _harness

parser = argparse.ArgumentParser()
parser.add_argument("--scale", type=float, default=2.0)
parser.add_argument("--substeps", type=int, default=20)
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

if args.cpu:
    os.environ["DRAKE_TPU_BENCH_CPU"] = "1"
if __name__ == "__main__":
    _harness.tpu_or_cpu_fallback()

import jax
import jax.numpy as jnp

if _harness.on_cpu():
    jax.config.update("jax_platforms", "cpu")


def timeit(fn, *a, reps=3):
    out = fn(*a)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).reshape(-1)[0]), out
    )
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
        jax.tree_util.tree_map(
            lambda x: float(jnp.asarray(x).reshape(-1)[0]), out
        )
    return (time.perf_counter() - t0) / reps


def main():
    from drake_tpu.mpm import solver as mpm

    cpu = _harness.on_cpu()
    config = mpm.MpmConfig(
        grid_size=(64, 64, 128), dx=1.0 / 64, dt=1e-4, xla_only=cpu
    )
    half = 0.1 * args.scale
    lo = (0.5 - half, 0.5 - half, 0.6 - half)
    hi = (0.5 + half, 0.5 + half, 0.6 + half)
    state = mpm.make_particle_block(config, lo, hi)
    n = state.x.shape[0]
    config = config.capacities_for(n)
    print(f"particles={n}  A={config.max_active_blocks}  "
          f"PMAX={config.block_capacity}  backend={jax.default_backend()}")

    # Stage timings (each its own program; boundaries force materialization
    # so the sum exceeds the fused substep — useful for RATIOS).
    p2g = jax.jit(lambda s: mpm.particle_to_grid(config, s))
    grid = p2g(state)
    t_p2g = timeit(p2g, state)
    upd = jax.jit(lambda g: mpm.update_grid(config, g))
    gv = upd(grid)
    t_upd = timeit(upd, grid)
    g2p = jax.jit(lambda s, v: mpm.grid_to_particle(config, s, v))
    t_g2p = timeit(g2p, state, gv)

    n_sub = args.substeps

    def loop(cfg):
        @jax.jit
        def run(s):
            def body(ss, _):
                ss = mpm.mpm_substep(cfg, ss)
                return ss, ss.dropped

            return jax.lax.scan(body, s, None, length=n_sub)

        return run

    run = loop(config)
    out, dropped = run(state)
    drop0 = int(jnp.max(dropped))
    t_sub = timeit(run, state) / n_sub
    print(f"  P2G blocked : {t_p2g * 1e3:8.2f} ms")
    print(f"  grid update : {t_upd * 1e3:8.2f} ms")
    print(f"  G2P stencil : {t_g2p * 1e3:8.2f} ms")
    print(f"  full substep: {t_sub * 1e3:8.2f} ms  "
          f"({1.0 / t_sub:,.1f} substeps/s, dropped={drop0})")

    # Active-block capacity sweep: how much of P2G is capacity-linear.
    import dataclasses as dc

    for A in (8192, 4096, 2048, 1024, 512):
        if A > config.max_active_blocks:
            continue
        cfg = dc.replace(config, max_active_blocks=A)
        run = loop(cfg)
        try:
            out, dropped = run(state)
            dmax = int(jnp.max(dropped))
            t = timeit(run, state) / n_sub
            print(f"  A={A:5d}: {t * 1e3:8.2f} ms/substep "
                  f"({1.0 / t:,.1f}/s) dropped={dmax}")
        except Exception as e:  # worker fault etc.
            print(f"  A={A:5d}: FAILED ({type(e).__name__})")
            break


if __name__ == "__main__":
    main()
