"""Codimensional cloth MPM tests.

Validates the energy model against closed forms and the coupled drape
behavior (the reference only smoke-tests its cloth pipeline —
gpu_mpm/cuda_mpm_test.cc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.geometry import shapes as sh
from drake_tpu.mpm import cloth
from drake_tpu.mpm import coupling as cpl
from drake_tpu.mpm import solver as mpm

F32 = jnp.float32


@pytest.fixture(scope="module")
def patch():
    cfg = cloth.ClothConfig()
    c = cloth.make_grid_cloth(cfg, 10, 10, origin=(0.3, 0.3, 0.6), size=(0.4, 0.4))
    return cfg, c


class TestClothElasticity:
    def test_rest_energy_zero(self, patch):
        cfg, c = patch
        E = float(cloth.elastic_energy(cfg, c.x, c.faces, c.Dm_inv, c.area))
        assert abs(E) < 1e-8

    def test_rigid_motion_energy_invariant(self, patch):
        """Rotating + translating the cloth leaves the energy at zero."""
        from drake_tpu.math import rotations as rot

        cfg, c = patch
        R = rot.rpy_to_rotation(jnp.asarray([0.3, -0.2, 0.5], F32))
        x_moved = c.x @ R.T + jnp.asarray([0.1, -0.2, 0.05], F32)
        E = float(cloth.elastic_energy(cfg, x_moved, c.faces, c.Dm_inv, c.area))
        assert abs(E) < 1e-5  # f32 roundoff through the QR

    def test_uniform_stretch_energy_matches_closed_form(self, patch):
        """Uniaxial in-plane stretch s: psi = mu (s-1)^2 + lam/2 (s-1)^2 per
        unit volume (other principal stretch stays 1)."""
        cfg, c = patch
        mu, lam = cfg.lame_2d
        s = 1.15
        x_str = c.x.at[:, 0].mul(s)
        E = float(cloth.elastic_energy(cfg, x_str, c.faces, c.Dm_inv, c.area))
        vol = float(jnp.sum(c.area)) * cfg.thickness
        expected = (mu * (s - 1) ** 2 + 0.5 * lam * (s - 1) ** 2) * vol
        np.testing.assert_allclose(E, expected, rtol=1e-4)

    def test_forces_restore_and_are_gradient_consistent(self, patch):
        cfg, c = patch
        x_str = c.x.at[:, 0].mul(1.1)
        f = cloth.vertex_forces(cfg, c.replace(x=x_str))
        # Finite-difference check of one component.
        eps = 1e-3

        def energy(x):
            return cloth.elastic_energy(cfg, x, c.faces, c.Dm_inv, c.area)

        # Use a corner vertex: interior vertices have balanced (zero) net
        # force under uniform stretch.
        k = 0
        e_plus = energy(x_str.at[k, 0].add(eps))
        e_minus = energy(x_str.at[k, 0].add(-eps))
        fd = -(float(e_plus) - float(e_minus)) / (2 * eps)
        assert abs(float(f[k, 0])) > 1e-3
        np.testing.assert_allclose(float(f[k, 0]), fd, rtol=5e-2)

    def test_gradient_finite_at_rest(self, patch):
        """The rest state must have exactly zero (finite!) forces — the
        (s1 - s2) sqrt formulation blows up here."""
        cfg, c = patch
        f = cloth.vertex_forces(cfg, c)
        assert bool(jnp.all(jnp.isfinite(f)))
        np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-5)


class TestClothDynamics:
    def test_drape_over_sphere(self, patch):
        cfg, c = patch
        grid = mpm.MpmConfig(
            grid_size=(32, 32, 32), dx=1.0 / 32, dt=5e-5, wall_width=0
        )
        sphere = cpl.RigidGeom(
            shape=sh.Sphere(0.12), body_index=0,
            R_WG=jnp.eye(3, dtype=F32),
            p_WG=jnp.asarray([0.5, 0.5, 0.35], F32),
            p_WB=jnp.asarray([0.5, 0.5, 0.35], F32),
            V_WB=jnp.zeros(6, F32),
        )
        params = cpl.MpmContactParams(stiffness=3e4, damping=30.0, friction=0.4)
        sim = jax.jit(
            lambda s, n: cloth.simulate_cloth(grid, cfg, s, n, [sphere], params),
            static_argnums=1,
        )
        out, acc = sim(c, 4000)
        assert bool(jnp.all(jnp.isfinite(out.x)))
        # Cloth center rests on top of the sphere (z ~ 0.47), edges drape below.
        zc = float(out.x[:, 2].max())
        assert 0.4 < zc < 0.55
        assert float(out.x[:, 2].min()) < 0.4
        # Support force points down on the sphere.
        assert float(acc[0, 5]) < 0.0


class TestMergeAndMesh:
    def test_merge_preserves_energy_and_mass(self):
        """merge_cloths is exactly the direct sum: total mass adds, elastic
        energy of the merged (deformed) state equals the sum of parts."""
        cfg = cloth.ClothConfig()
        a = cloth.make_grid_cloth(cfg, 6, 6, origin=(0.2, 0.2, 0.5),
                                  size=(0.2, 0.2))
        b = cloth.make_grid_cloth(cfg, 5, 7, origin=(0.5, 0.4, 0.7),
                                  size=(0.25, 0.3))
        m = cloth.merge_cloths(a, b)
        assert m.x.shape[0] == a.x.shape[0] + b.x.shape[0]
        np.testing.assert_allclose(
            float(m.mass.sum()), float(a.mass.sum() + b.mass.sum()),
            rtol=1e-6)

        def stretch(c, s):
            return c.replace(x=c.x * jnp.asarray([s, 1.0, 1.0], F32))

        ea = cloth.elastic_energy(cfg, stretch(a, 1.07).x, a.faces,
                                  a.Dm_inv, a.area)
        eb = cloth.elastic_energy(cfg, stretch(b, 1.07).x, b.faces,
                                  b.Dm_inv, b.area)
        em = cloth.elastic_energy(cfg, stretch(m, 1.07).x, m.faces,
                                  m.Dm_inv, m.area)
        np.testing.assert_allclose(float(em), float(ea + eb), rtol=1e-5)

    def test_mesh_cloth_matches_grid_cloth(self):
        """make_cloth_from_mesh on the grid's own verts/faces reproduces
        make_grid_cloth exactly (the refactor is behavior-preserving)."""
        cfg = cloth.ClothConfig()
        g = cloth.make_grid_cloth(cfg, 7, 7, origin=(0.3, 0.3, 0.6),
                                  size=(0.4, 0.4))
        m = cloth.make_cloth_from_mesh(cfg, np.asarray(g.x),
                                       np.asarray(g.faces))
        np.testing.assert_array_equal(np.asarray(g.faces), np.asarray(m.faces))
        np.testing.assert_allclose(np.asarray(g.mass), np.asarray(m.mass),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g.Dm_inv), np.asarray(m.Dm_inv),
                                   rtol=1e-5)


class TestClothImplicitContact:
    def test_drape_on_sphere_implicit_matches_weight(self):
        """Cloth draped over an anchored sphere with the IMPLICIT grid
        contact (cloth_substep contact_model='implicit'): stays finite,
        stays on top, and the accumulated normal impulse approaches the
        sheet's weight impulse once settled."""
        from drake_tpu.mpm import cloth as clothmod
        from drake_tpu.mpm import coupling as cpl
        from drake_tpu.mpm import solver as mpm

        F32 = jnp.float32
        grid = mpm.MpmConfig(
            grid_size=(32, 32, 32), dx=1.0 / 32, dt=1e-4, wall_width=0
        )
        cfg = clothmod.ClothConfig()
        sheet = clothmod.make_grid_cloth(
            cfg, 9, 9, origin=(0.42, 0.42, 0.36), size=(0.16, 0.16)
        )
        ball = cpl.RigidGeom(
            shape=sh.Sphere(0.1), body_index=-1,
            R_WG=jnp.eye(3, dtype=F32),
            p_WG=jnp.asarray([0.5, 0.5, 0.25], F32),
            p_WB=jnp.asarray([0.5, 0.5, 0.25], F32),
            V_WB=jnp.zeros(6, F32),
        )
        params = cpl.MpmContactParams(
            stiffness=1e5, damping=20.0, friction=0.5
        )
        n_sub = 1500
        state, acc = jax.jit(
            lambda s: clothmod.simulate_cloth(
                grid, cfg, s, n_sub, (ball,), params,
                contact_model="implicit",
            )
        )(sheet)
        assert bool(jnp.all(jnp.isfinite(state.x)))
        # Sheet center rests on the ball top (0.35), not fallen through.
        zc = float(state.x[:, 2].max())
        assert zc > 0.33, zc
        # Ball receives a downward impulse (weight transfer).
        assert float(acc[0, 5]) < 0.0
