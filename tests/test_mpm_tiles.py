"""Tile-slab MPM pipeline tests (drake_tpu/mpm/tiles.py).

The TPU fast path for particle-grid transfers: channel-major plane state,
factorized B-spline weights, 8^3 windows over 4^3-cell blocks, sort
amortization.  Validated here against the stencil reference substep
(solver.mpm_substep) — the two pipelines implement the same MLS-MPM math
(reference: multibody/gpu_mpm/cuda_mpm_solver.cu:18-154) in different data
layouts, so they must agree to f32 roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.mpm import solver as mpm
from drake_tpu.mpm import tiles

F32 = jnp.float32


@pytest.fixture(scope="module")
def config():
    return mpm.MpmConfig(
        grid_size=(32, 32, 32), dx=1.0 / 32, dt=2e-4, max_active_blocks=64
    )


@pytest.fixture(scope="module")
def block(config):
    state = mpm.make_particle_block(config, (0.3, 0.3, 0.5), (0.5, 0.5, 0.7))
    # A nonzero velocity field stresses the APIC/affine paths.
    v = 0.2 * jnp.sin(7.0 * state.x)
    return state.replace(v=v.astype(F32))


class TestSortRoundTrip:
    def test_sort_unsort_identity(self, config, block):
        ss = tiles.sort_to_tiles(config, block)
        back = tiles.tiles_to_state(ss, block)
        np.testing.assert_array_equal(np.asarray(back.x), np.asarray(block.x))
        np.testing.assert_array_equal(np.asarray(back.v), np.asarray(block.v))
        np.testing.assert_array_equal(np.asarray(back.F), np.asarray(block.F))
        assert int(ss.dropped) == 0

    def test_tile_maps_consistent(self, config, block):
        ss = tiles.sort_to_tiles(config, block)
        counts = np.asarray(ss.counts)
        tile_count = np.asarray(ss.tile_count)
        a_of_tile = np.asarray(ss.a_of_tile)
        # Per-block particle counts equal the sum of their tiles' row counts.
        for a in range(counts.shape[0]):
            assert tile_count[a_of_tile == a].sum() == counts[a]
        assert tile_count.sum() == block.x.shape[0]

    def test_capacity_overflow_reported(self, config, block):
        import dataclasses

        tiny = dataclasses.replace(config, max_active_blocks=2)
        ss = tiles.sort_to_tiles(tiny, block)
        assert int(ss.dropped) > 0  # REPORTED, not silent


class TestSubstepParity:
    def test_single_substep_matches_reference(self, config, block):
        ref = mpm.mpm_substep(config, block)
        out = tiles.tile_substep(config, block)
        np.testing.assert_allclose(
            np.asarray(out.x), np.asarray(ref.x), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out.v), np.asarray(ref.v), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.F), np.asarray(ref.F), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out.C), np.asarray(ref.C), atol=1e-3
        )
        assert int(out.dropped) == 0

    def test_multi_substep_amortized_sort(self, config, block):
        """8 substeps with one sort (resort_every=8) match 8 reference
        substeps — the one-cell drift tolerance of the 8^3 window."""
        ref = block
        for _ in range(8):
            ref = mpm.mpm_substep(config, ref)
        out = jax.jit(
            lambda s: tiles.simulate_tiled(config, s, 8, resort_every=8)
        )(block)
        np.testing.assert_allclose(
            np.asarray(out.x), np.asarray(ref.x), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.v), np.asarray(ref.v), atol=1e-3
        )
        assert int(out.dropped) == 0

    def test_grid_op_dense_path_matches_window_path(self, config, block):
        """An identity grid_op routes through the dense-grid assembly
        (halo_to_dense -> update -> dense_windows) and must reproduce the
        pure window path (to f32 roundoff — the two assemble halo sums in
        different orders)."""
        a = tiles.tile_substep(config, block)
        b = tiles.tile_substep(config, block, grid_op=lambda v, m: v)
        np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v), atol=1e-6)
        # C is dxi2-scaled (4/dx^2 ~ 4e3), which amplifies halo roundoff.
        np.testing.assert_allclose(np.asarray(a.C), np.asarray(b.C), atol=1e-3)

    def test_grid_op_receives_dense_fields(self, config, block):
        """grid_op sees (nx,ny,nz,3) velocity and (nx,ny,nz) mass with the
        full particle mass on the grid."""
        seen = {}

        def op(vel, mass):
            seen["vel_shape"] = vel.shape
            seen["mass_total"] = mass.sum()
            return vel

        tiles.tile_substep(config, block, grid_op=op)
        assert seen["vel_shape"] == (32, 32, 32, 3)
        np.testing.assert_allclose(
            float(seen["mass_total"]), float(block.mass.sum()), rtol=1e-5
        )

    def test_mass_conserved_over_rollout(self, config, block):
        out = jax.jit(
            lambda s: tiles.simulate_tiled(config, s, 16, resort_every=4)
        )(block)
        assert int(out.dropped) == 0
        assert bool(jnp.all(jnp.isfinite(out.x)))
        np.testing.assert_allclose(
            float(out.mass.sum()), float(block.mass.sum()), rtol=1e-6
        )


class TestStaleness:
    def test_stale_particles_reported_not_silent(self, config, block):
        """Forcing a >1-cell drift between sorts trips the staleness counter
        instead of silently dropping B-spline taps."""
        fast = block.replace(
            v=jnp.full_like(block.v, 3.0 * config.dx / config.dt)
        )
        ss = tiles.sort_to_tiles(config, fast)
        ss = tiles.resident_substep(config, ss)  # x += 3 dx: still fine
        ss = tiles.resident_substep(config, ss)  # 6 dx: beyond the window
        assert int(ss.dropped) > 0
