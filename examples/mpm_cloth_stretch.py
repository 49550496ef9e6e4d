"""Cloth stretch: two kinematic pinches pull a sheet taut, then release.

Reference: the fork's stretch scenario (BASELINE config 5 "allegro hand +
MPM deformable object (stretch)"; examples/multibody/deformable/ demos) —
grippers stretch a codimensional MPM cloth, exercising the in-plane
elasticity and the return mapping (mpm/cloth.py project_strain role:
cloth resists stretch elastically, yields at the shear/normal limits).

Both edge strips of the sheet are scripted Dirichlet constraints pulled
apart horizontally in midair, held, then released to fall.

Checks: the sheet extends under tension (but less than the commanded pull
— the middle necks in, it does not tear), sag vanishes when taut, and
after release the cloth recovers elastically (extent shrinks) and goes
into free fall.

Run:  python examples/mpm_cloth_stretch.py [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from drake_tpu.mpm import cloth
    from drake_tpu.mpm import solver as mpm

    F32 = jnp.float32

    cfg = cloth.ClothConfig()
    grid = mpm.MpmConfig(
        grid_size=(32, 32, 32), dx=1.0 / 32, dt=5e-5, wall_width=2
    )
    z0 = 0.55
    nx = 16
    c = cloth.make_grid_cloth(cfg, nx, nx, origin=(0.3, 0.3, z0),
                              size=(0.4, 0.4))
    left = jnp.asarray(np.where(np.asarray(c.x[:, 0]) < 0.31)[0])
    right = jnp.asarray(np.where(np.asarray(c.x[:, 0]) > 0.69)[0])
    xl0, xr0 = c.x[left], c.x[right]

    pull = 0.08  # each side moves outward by this much (40% strain cmd)
    pull_T = 6000
    hold_T = 4000
    drop_T = 2000

    def edges_at(k):
        s = jnp.clip(k / pull_T, 0.0, 1.0)
        v = pull / (pull_T * grid.dt)
        dl = jnp.asarray([-pull, 0.0, 0.0], F32) * s
        dr = jnp.asarray([pull, 0.0, 0.0], F32) * s
        vl = jnp.asarray([-v, 0.0, 0.0], F32)
        vr = jnp.asarray([v, 0.0, 0.0], F32)
        return xl0 + dl, xr0 + dr, vl, vr

    def substep(state, k, pinned):
        state, _ = cloth.cloth_substep(grid, cfg, state)
        if pinned:
            pl, pr, vl, vr = edges_at(k)
            x = state.x.at[left].set(pl).at[right].set(pr)
            v = state.v.at[left].set(
                jnp.tile(vl[None], (left.shape[0], 1))
            ).at[right].set(jnp.tile(vr[None], (right.shape[0], 1)))
            state = state.replace(x=x, v=v)
        return state

    @jax.jit
    def run_pinned(state, k0, n):
        return jax.lax.fori_loop(
            k0, k0 + n, lambda k, s: substep(s, k, True), state)

    @jax.jit
    def run_free(state, n):
        return jax.lax.fori_loop(
            0, n, lambda k, s: substep(s, k, False), state)

    state = c
    t0 = time.perf_counter()
    state = run_pinned(state, 0, pull_T)
    x_taut = np.asarray(state.x)
    extent_taut = x_taut[:, 0].max() - x_taut[:, 0].min()
    sag_taut = z0 - x_taut[:, 2].min()
    print(f"taut: x-extent {extent_taut:.3f} (rest 0.40, commanded "
          f"{0.40 + 2*pull:.2f}); sag {sag_taut:.4f} m")

    state = run_pinned(state, pull_T, hold_T)
    x_held = np.asarray(state.x)
    mid = x_held[(x_held[:, 0] > 0.45) & (x_held[:, 0] < 0.55)]
    neck = mid[:, 1].max() - mid[:, 1].min() if len(mid) else 0.4
    print(f"held: mid-strip y-width {neck:.3f} (rest 0.40 — necking)")

    state = run_free(state, drop_T)
    x_free = np.asarray(state.x)
    extent_free = x_free[:, 0].max() - x_free[:, 0].min()
    vz = float(np.mean(np.asarray(state.v)[:, 2]))
    wall = time.perf_counter() - t0
    total = pull_T + hold_T + drop_T
    print(f"released: x-extent {extent_free:.3f}; mean vz {vz:.3f} m/s")
    print(f"{total} substeps in {wall:.1f}s -> {total/wall:.0f} substeps/s")

    assert np.all(np.isfinite(x_free)), "cloth blew up"
    assert extent_taut > 0.48, "sheet did not stretch"
    assert sag_taut < 0.08, "taut sheet should not sag much"
    assert neck < 0.40, "no necking: in-plane coupling missing"
    assert extent_free < extent_taut - 0.005, "no elastic recovery"
    assert vz < -0.3, "released cloth should be falling"
    print("CLOTH STRETCH OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
