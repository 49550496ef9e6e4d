"""Tiled implicit grid contact tests (mpm/tiles_contact.py).

The block-space Newton must reproduce the dense-grid solve
(mpm/grid_contact.py, itself validated against momentum balance and the
stiction acceptance bar in test_grid_contact.py) to f32 roundoff, and hold
the same stiction regime on the tile pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.contact.coupled_plant import CoupledState, CoupledWorld
from drake_tpu.geometry import shapes as sh
from drake_tpu.mpm import coupling as cpl
from drake_tpu.mpm import grid_contact as gc
from drake_tpu.mpm import solver as mpm
from drake_tpu.mpm import tiles
from drake_tpu.mpm import tiles_contact as tc

F32 = jnp.float32
Z0 = 0.25


def _ground(dtype=F32):
    return cpl.RigidGeom(
        shape=sh.HalfSpace(), body_index=-1,
        R_WG=jnp.eye(3, dtype=dtype),
        p_WG=jnp.asarray([0.0, 0.0, Z0], dtype),
        p_WB=jnp.zeros(3, dtype), V_WB=jnp.zeros(6, dtype),
    )


def _block_on_ground(gravity=(0.0, 0.0, -9.81), dt=5e-4):
    cfg = mpm.MpmConfig(
        grid_size=(32, 32, 32), dx=1.0 / 32, dt=dt, wall_width=0,
        gravity=gravity, youngs_modulus=5e4, max_active_blocks=64,
    )
    state = mpm.make_particle_block(
        cfg, (0.4, 0.4, Z0 - 0.002), (0.6, 0.6, Z0 + 0.078), jitter_seed=None
    )
    return cfg, state


def _run_tiled(cfg, params, state, geoms, n):
    @jax.jit
    def go(s):
        ss = tiles.sort_to_tiles(cfg, s)

        def body(carry, _):
            ss_, acc = carry
            ss_, imp = tc.resident_substep_contact(cfg, params, ss_, geoms)
            return (ss_, acc + imp), None

        (ss, acc), _ = jax.lax.scan(
            body, (ss, jnp.zeros((len(geoms), 6), F32)), None, length=n
        )
        return tiles.tiles_to_state(ss, s), acc

    return go(state)


class TestTiledContactParity:
    def test_matches_dense_solve_with_engagement(self):
        """80 substeps of a settling block with a sliding component: states
        and accumulated rigid impulses must match the dense solve."""
        cfg, state = _block_on_ground()
        state = state.replace(v=state.v.at[:, 0].add(0.2))
        params = gc.GridContactParams(
            stiffness=5e5, damping=500.0, friction=0.5
        )
        geoms = (_ground(),)
        n = 80

        @jax.jit
        def dense(s):
            def body(carry, _):
                s_, acc = carry
                s_, imp = gc.coupled_substep_implicit(cfg, params, s_, geoms)
                return (s_, acc + imp), None

            return jax.lax.scan(
                body, (s, jnp.zeros((1, 6), F32)), None, length=n
            )[0]

        sd, accd = dense(state)
        st, acct = _run_tiled(cfg, params, state, geoms, n)
        np.testing.assert_allclose(
            np.asarray(st.x), np.asarray(sd.x), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(st.v), np.asarray(sd.v), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(acct), np.asarray(accd), atol=2e-3
        )
        assert int(st.dropped) == 0

    def test_stiction_on_incline(self):
        """The tiled Newton holds the stiction regime of
        test_grid_contact.py:100 (tan(theta)=0.3 < mu=0.6 at k*dt the
        penalty model cannot run)."""
        g_tilt = (0.3 * 9.81, 0.0, -9.81)
        cfg, state0 = _block_on_ground(gravity=g_tilt, dt=1e-3)
        params = gc.GridContactParams(
            stiffness=2e7, damping=100.0, friction=0.6
        )
        com0 = jnp.mean(state0.x, axis=0)
        s, _ = _run_tiled(cfg, params, state0, (_ground(),), 300)
        assert bool(jnp.all(jnp.isfinite(s.x)))
        drift_xy = float(
            jnp.linalg.norm(jnp.mean(s.x[:, :2], axis=0) - com0[:2])
        )
        assert drift_xy < 0.01, drift_xy
        assert float(jnp.abs(s.v).max()) < 0.2


class TestCoupledWorldTiled:
    def test_tiled_default_matches_dense_implicit(self):
        """CoupledWorld(contact_model='implicit') defaults to the tiled
        pipeline; a free rigid ball under a falling MPM block must track the
        dense fallback (rigid state AND particles)."""
        from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
        from drake_tpu.multibody.model import FLOATING, ModelBuilder

        b = ModelBuilder()
        m_ball, r_ball = 0.5, 0.08
        b.add_body(
            "ball", parent=None, joint_type=FLOATING, mass=m_ball,
            inertia_com=np.eye(3) * 0.4 * m_ball * r_ball**2,
        )
        model, params = b.build(F32)
        scene = CollisionScene.build([
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=0.5),
            CollisionGeometry(name="ball", body=0, shape=sh.Sphere(r_ball),
                              friction=0.5, stiffness=1e6, dissipation=0.1),
        ])
        grid = mpm.MpmConfig(
            grid_size=(32, 32, 32), dx=1.0 / 32, dt=5e-4, wall_width=0,
            youngs_modulus=5e4,
        )
        kw = dict(
            model=model, scene=scene, mpm_config=grid,
            contact_params=cpl.MpmContactParams(
                stiffness=1e5, damping=200.0, friction=0.4
            ),
            coupled_geometries=(0, 1), substeps_per_step=20, time_step=1e-2,
            contact_model="implicit",
        )
        world_t = CoupledWorld(**kw, tiled=True)
        world_d = CoupledWorld(**kw, tiled=False)
        q0 = jnp.asarray([1, 0, 0, 0, 0.5, 0.5, r_ball], F32)
        particles = mpm.make_particle_block(
            grid, (0.45, 0.45, 0.25), (0.55, 0.55, 0.32)
        )
        st0 = CoupledState(
            rigid=jnp.concatenate([q0, jnp.zeros(6, F32)]),
            particles=particles,
        )
        out_t = jax.jit(lambda s: world_t.simulate(params, s, 10))(st0)
        out_d = jax.jit(lambda s: world_d.simulate(params, s, 10))(st0)
        np.testing.assert_allclose(
            np.asarray(out_t.rigid), np.asarray(out_d.rigid), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_t.particles.x), np.asarray(out_d.particles.x),
            atol=1e-4,
        )
        assert int(out_t.particles.dropped) == 0


class TestContactRowCompaction:
    def test_compacted_solve_matches_full_rows(self):
        """Opt-in contact-row compaction (max_contact_rows=-1 auto) is
        bit-compatible with the full-row tile solve within f32 tolerance,
        and reports zero overflow when the capacity holds."""
        cfg, state = _block_on_ground()
        state = state.replace(v=state.v.at[:, 0].add(0.15))
        geoms = (_ground(),)
        p_full = gc.GridContactParams(
            stiffness=5e5, damping=500.0, friction=0.5
        )
        p_comp = gc.GridContactParams(
            stiffness=5e5, damping=500.0, friction=0.5,
            max_contact_rows=-1,
        )
        n = 40
        sf, accf = _run_tiled(cfg, p_full, state, geoms, n)
        sc, accc = _run_tiled(cfg, p_comp, state, geoms, n)
        np.testing.assert_allclose(
            np.asarray(sc.x), np.asarray(sf.x), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(accc), np.asarray(accf), atol=2e-3
        )
        assert int(sc.dropped) == 0
