"""Hydroelastic patch-contact tests.

The analytic hydroelastic law for a compliant sphere (modulus E, radius R)
on a rigid plane at penetration d is F = pi E d^2 (pressure p = E depth/R
integrated over the cap; the 1/R cancels) — QUADRATIC in d, unlike point
contact.  The quadrature patch (geometry/scene.py _hydro_sphere_halfspace)
must reproduce it, and the plant must settle at the analytic equilibrium
penetration d* = sqrt(m g / (pi E)).
Reference: geometry/query_object.h:385 ComputeContactSurfaces +
multibody/hydroelastics/.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import ModelBuilder

F64 = jnp.float64
R_SPH = 0.1
E_MOD = 2e5


def _world(rings=2):
    b = ModelBuilder()
    b.add_body(
        "ball", parent=None, joint_type="floating", mass=1.0,
        inertia_com=np.eye(3) * (0.4 * R_SPH**2),
    )
    model, params = b.build(F64)
    geoms = [
        CollisionGeometry(
            name="ball", body=0, shape=sh.Sphere(R_SPH),
            friction=0.5, dissipation=0.05,
            hydroelastic_modulus=E_MOD, hydro_rings=rings,
        ),
        CollisionGeometry(
            name="ground", body=-1, shape=sh.HalfSpace(),
            friction=0.5, stiffness=1e10, dissipation=0.05,
        ),
    ]
    return model, params, CollisionScene.build(geoms)


class TestQuadrature:
    def test_patch_force_matches_analytic(self):
        """Static quadrature check: sum E (A_i/R) max(-phi_i, 0) over the
        patch ~= pi E d^2 / R for a range of penetrations."""
        model, params, scene = _world(rings=3)
        for d in (0.01, 0.02, 0.03):
            q = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, R_SPH - d], F64)
            contact = scene.query(model, params, q)
            pen = jnp.maximum(-contact.phi, 0.0)
            F = float(jnp.sum(contact.stiffness * pen))
            F_exact = np.pi * E_MOD * d * d
            np.testing.assert_allclose(F, F_exact, rtol=0.15, err_msg=str(d))

    def test_patch_count_and_layout(self):
        model, params, scene = _world(rings=2)
        assert scene.num_contacts == 1 + 6 + 12
        q = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, R_SPH - 0.01], F64)
        contact = scene.query(model, params, q)
        # Center point deepest; all normals up.
        assert float(contact.phi[0]) == float(contact.phi.min())
        np.testing.assert_allclose(
            np.asarray(contact.n_W[:, 2]), 1.0, atol=1e-12
        )


class TestHydroPlant:
    def test_settles_at_analytic_penetration(self):
        # Finer quadrature: the equilibrium penetration (~4 mm) only
        # engages the innermost cells, so resolution matters here.
        model, params, scene = _world(rings=4)
        dsys = cplant.make_discrete_system(model, params, scene, 2e-3)
        x = model.default_state(F64)
        x = x.at[6].set(R_SPH)  # just touching
        step = jax.jit(lambda xx: dsys.g(params, xx, jnp.zeros(0, F64)))
        for _ in range(800):
            x = step(x)
        assert float(jnp.max(jnp.abs(x[7:]))) < 1e-4  # settled
        d_star = float(R_SPH - x[6])
        d_exact = np.sqrt(1.0 * 9.81 / (np.pi * E_MOD))
        np.testing.assert_allclose(d_star, d_exact, rtol=0.15)

    def test_torsional_friction_from_patch(self):
        """A sphere spinning about the VERTICAL axis decelerates: the
        patch's distributed friction produces a torsional moment that a
        single contact point fundamentally cannot (zero moment arm)."""
        model, params, scene = _world(rings=2)
        dsys = cplant.make_discrete_system(model, params, scene, 1e-3)
        d0 = np.sqrt(9.81 / (np.pi * E_MOD))
        x = model.default_state(F64)
        x = x.at[6].set(R_SPH - d0)
        w0 = 10.0
        x = x.at[7 + 2].set(w0)  # wz: pure spin in place
        step = jax.jit(lambda xx: dsys.g(params, xx, jnp.zeros(0, F64)))
        for _ in range(500):
            x = step(x)
        wz = float(x[7 + 2])
        assert wz < 0.9 * w0  # torsional friction bites
        # Point-contact control: the same scene WITHOUT hydroelastic
        # cannot decelerate the spin.
        from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
        geoms_pt = [
            CollisionGeometry(
                name="ball", body=0, shape=sh.Sphere(R_SPH),
                friction=0.5, stiffness=np.pi * E_MOD * 2 * d0,
                dissipation=0.05,
            ),
            CollisionGeometry(
                name="ground", body=-1, shape=sh.HalfSpace(),
                friction=0.5, stiffness=1e10, dissipation=0.05,
            ),
        ]
        scene_pt = CollisionScene.build(geoms_pt)
        dsys_pt = cplant.make_discrete_system(model, params, scene_pt, 1e-3)
        x2 = model.default_state(F64).at[6].set(R_SPH - d0)
        x2 = x2.at[7 + 2].set(w0)
        step2 = jax.jit(lambda xx: dsys_pt.g(params, xx, jnp.zeros(0, F64)))
        for _ in range(500):
            x2 = step2(x2)
        wz_pt = float(x2[7 + 2])
        assert wz_pt > 0.99 * w0  # point contact: spin survives


class TestHydroBox:
    """Compliant box on rigid ground: elastic-foundation pressure
    p = E depth / h_z integrates to F = E A d / h_z for a flat-resting
    box (A the bottom-face area, h_z the half-height)."""

    SIZE = (0.2, 0.3, 0.1)

    def _world(self, rings=1):
        b = ModelBuilder()
        b.add_body(
            "box", parent=None, joint_type="floating", mass=1.0,
            inertia_com=np.diag([3e-3, 2e-3, 4e-3]),
        )
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(
                name="box", body=0, shape=sh.Box(self.SIZE),
                friction=0.5, dissipation=0.1,
                hydroelastic_modulus=E_MOD, hydro_rings=rings,
            ),
            CollisionGeometry(
                name="ground", body=-1, shape=sh.HalfSpace(),
                friction=0.5, stiffness=1e10, dissipation=0.1,
            ),
        ]
        return model, params, CollisionScene.build(geoms)

    def test_patch_count(self):
        model, params, scene = self._world(rings=1)
        assert scene.num_contacts == 6 * 4  # 2x2 grid per face

    def test_flat_rest_force_is_exact(self):
        model, params, scene = self._world(rings=2)
        hz = self.SIZE[2] / 2
        area = self.SIZE[0] * self.SIZE[1]
        # Depths below hz/n keep the side-face points out of contact.
        for d in (1e-3, 5e-3, 1e-2):
            q = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, hz - d], F64)
            contact = scene.query(model, params, q)
            pen = jnp.maximum(-contact.phi, 0.0)
            F = float(jnp.sum(contact.stiffness * pen))
            # Uniform depth over the bottom face: quadrature is EXACT.
            np.testing.assert_allclose(
                F, E_MOD * area * d / hz, rtol=1e-9, err_msg=str(d)
            )

    def test_settles_at_foundation_depth(self):
        # A genuinely compliant modulus: with E = 2e5 the per-point
        # foundation stiffness crosses SAP's near-rigid threshold
        # (Rn_phys < beta^2 w / 4pi^2) and the solver legitimately
        # treats the contact as rigid (one-step pushout) — exactly the
        # reference's near-rigid clamp.  E = 2e4 stays compliant.
        E_soft = 2e4
        b = ModelBuilder()
        b.add_body(
            "box", parent=None, joint_type="floating", mass=1.0,
            inertia_com=np.diag([3e-3, 2e-3, 4e-3]),
        )
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(
                name="box", body=0, shape=sh.Box(self.SIZE),
                friction=0.5, dissipation=0.1,
                hydroelastic_modulus=E_soft, hydro_rings=1,
            ),
            CollisionGeometry(
                name="ground", body=-1, shape=sh.HalfSpace(),
                friction=0.5, stiffness=1e10, dissipation=0.1,
            ),
        ]
        scene = CollisionScene.build(geoms)
        hz = self.SIZE[2] / 2
        area = self.SIZE[0] * self.SIZE[1]
        dsys = cplant.make_discrete_system(model, params, scene, 1e-3)
        x = model.default_state(F64).at[6].set(hz)  # just touching
        step = jax.jit(lambda xx: dsys.g(params, xx, jnp.zeros(0, F64)))
        for _ in range(1200):
            x = step(x)
        assert float(jnp.max(jnp.abs(x[7:]))) < 1e-4
        d_star = float(hz - x[6])
        d_exact = 1.0 * 9.81 * hz / (E_soft * area)
        np.testing.assert_allclose(d_star, d_exact, rtol=0.2)


class TestHydroSphereSphere:
    """Compliant sphere pressed into a rigid sphere: the cap quadrature
    must integrate to F = pi E d^2 r_o / (r + r_o) (-> pi E d^2 as
    r_o -> inf, the halfspace law)."""

    def _scene(self, E_other=None):
        b = ModelBuilder()
        b.add_body(
            "ball", parent=None, joint_type="floating", mass=1.0,
            inertia_com=np.eye(3) * (0.4 * R_SPH**2),
        )
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(
                name="ball", body=0, shape=sh.Sphere(R_SPH),
                friction=0.5, dissipation=0.05,
                hydroelastic_modulus=E_MOD, hydro_rings=4,
            ),
            CollisionGeometry(
                name="anchor", body=-1, shape=sh.Sphere(R_SPH),
                p_BG=(0.0, 0.0, 0.0), friction=0.5, stiffness=1e10,
                dissipation=0.05, hydroelastic_modulus=E_other,
            ),
        ]
        return model, params, CollisionScene.build(geoms)

    def test_patch_force_matches_analytic(self):
        model, params, scene = self._scene()
        assert scene.num_contacts == 1 + 6 + 12 + 18 + 24
        for d in (0.01, 0.02, 0.03):
            q = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, 2 * R_SPH - d], F64)
            contact = scene.query(model, params, q)
            pen = jnp.maximum(-contact.phi, 0.0)
            F = float(jnp.sum(contact.stiffness * pen))
            F_exact = np.pi * E_MOD * d * d * 0.5  # r_o/(r+r_o) = 1/2
            np.testing.assert_allclose(F, F_exact, rtol=0.15, err_msg=str(d))
            # Patch normal = line of centers (vertical here).
            np.testing.assert_allclose(
                np.asarray(contact.n_W[:, 2]), 1.0, atol=1e-12
            )

    def test_compliant_compliant_combines_moduli(self):
        model, params, soft_rigid = self._scene()
        model2, params2, soft_soft = self._scene(E_other=E_MOD)
        q = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, 2 * R_SPH - 0.01], F64)
        c1 = soft_rigid.query(model, params, q)
        c2 = soft_soft.query(model2, params2, q)
        F1 = float(jnp.sum(c1.stiffness * jnp.maximum(-c1.phi, 0)))
        F2 = float(jnp.sum(c2.stiffness * jnp.maximum(-c2.phi, 0)))
        # Series combination: equal moduli halve the effective stiffness.
        np.testing.assert_allclose(F2, F1 / 2, rtol=1e-9)
