"""Generic SDF-carrier hydroelastic patches (VERDICT round-4 item 7).

Any SDF shape can now CARRY the quadrature patch — Cylinder, Ellipsoid,
and MeshSdf (parsed meshes) — via the SDF-projected tangent-disk
quadrature in geometry/scene.py _hydro_patch.  Reference role:
geometry/proximity/field_intersection.h builds tessellated pressure
fields for every shape; these tests validate the quadrature stand-in:

* soft MeshSdf cube on a rigid box: patch force matches the analytic
  elastic-foundation value and is refinement-stable (<= 5% vs refined
  quadrature — the VERDICT 'Done' bar);
* soft ellipsoid / cylinder on a halfspace: curved-depth patches are
  refinement-stable and settle in the plant.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import mesh_io
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import ModelBuilder

F64 = jnp.float64
E_MOD = 2e5


def _cube_meshsdf(side=0.2, resolution=40):
    v, f = mesh_io.box_mesh((side, side, side))
    return sh.MeshSdf.from_mesh(np.asarray(v), np.asarray(f),
                                resolution=resolution)


def _single_body_world(soft_shape, other_shape, rings, patch_radius=None,
                       z_other=0.0):
    b = ModelBuilder()
    b.add_body(
        "soft", parent=None, joint_type="floating", mass=1.0,
        inertia_com=np.eye(3) * 1e-3,
    )
    model, params = b.build(F64)
    geoms = [
        CollisionGeometry(
            name="soft", body=0, shape=soft_shape, friction=0.5,
            dissipation=0.1, hydroelastic_modulus=E_MOD,
            hydro_rings=rings, hydro_patch_radius=patch_radius,
        ),
        CollisionGeometry(
            name="other", body=-1, shape=other_shape, friction=0.5,
            stiffness=1e10, dissipation=0.1,
            p_BG=np.array([0.0, 0.0, z_other]),
        ),
    ]
    return model, params, CollisionScene.build(geoms)


def _patch_force(model, params, scene, q):
    contact = scene.query(model, params, jnp.asarray(q, F64))
    pen = jnp.maximum(-contact.phi, 0.0)
    return float(jnp.sum(contact.stiffness * pen)), contact


class TestMeshSdfCarrier:
    def test_flat_force_matches_analytic_and_refined(self):
        """Soft mesh cube pressed delta into a rigid box: uniform-depth
        patch force = E * pi rho^2 * delta / h, and coarse-vs-refined
        quadrature agree to <= 5%."""
        cube = _cube_meshsdf()
        rho = 0.05
        table = sh.Box((1.0, 1.0, 0.2))  # top at z = +0.1
        h_found = 0.1  # cube half-side (the baked grid's interior depth)
        delta = 0.004
        forces = {}
        for rings in (2, 6):
            model, params, scene = _single_body_world(
                cube, table, rings, patch_radius=rho
            )
            q = [1, 0, 0, 0, 0.0, 0.0, 0.1 + 0.1 - delta]
            F, contact = _patch_force(model, params, scene, q)
            forces[rings] = F
            # All active rows push straight up (box top-face normal).
            act = np.asarray(contact.phi) < 0
            assert act.sum() >= 7
            np.testing.assert_allclose(
                np.asarray(contact.n_W)[act, 2], 1.0, atol=1e-9
            )
        F_exact = E_MOD * np.pi * rho**2 * delta / h_found
        np.testing.assert_allclose(forces[6], F_exact, rtol=0.10)
        # VERDICT bar: <= 5% vs refined quadrature.
        assert abs(forces[2] - forces[6]) / forces[6] < 0.05

    def test_patch_rows_count(self):
        cube = _cube_meshsdf()
        model, params, scene = _single_body_world(
            cube, sh.Box((1.0, 1.0, 0.2)), rings=2, patch_radius=0.05
        )
        assert scene.num_contacts == 1 + 6 + 12


class TestEllipsoidCarrier:
    def test_curved_patch_refinement_stable(self):
        """Soft ellipsoid on a halfspace: depth VARIES across the patch
        (curvature), so quadrature refinement is a real test."""
        el = sh.Ellipsoid((0.12, 0.09, 0.06))
        delta = 0.008
        forces = {}
        for rings in (2, 6):
            model, params, scene = _single_body_world(
                el, sh.HalfSpace(), rings
            )
            q = [1, 0, 0, 0, 0.0, 0.0, 0.06 - delta]
            F, contact = _patch_force(model, params, scene, q)
            forces[rings] = F
            assert float(contact.phi.min()) < -0.9 * delta
        assert forces[6] > 0
        assert abs(forces[2] - forces[6]) / forces[6] < 0.05, forces

    def test_settles_in_plant(self):
        el = sh.Ellipsoid((0.12, 0.09, 0.06))
        model, params, scene = _single_body_world(el, sh.HalfSpace(), 3)
        dsys = cplant.make_discrete_system(model, params, scene, 2e-3)
        x = model.default_state(F64).at[6].set(0.06)
        step = jax.jit(lambda xx: dsys.g(params, xx, jnp.zeros(0, F64)))
        for _ in range(600):
            x = step(x)
        assert float(jnp.max(jnp.abs(x[7:]))) < 1e-3
        d_star = 0.06 - float(x[6])
        assert 0.0 < d_star < 0.03  # supported well above the grid


class TestCylinderCarrier:
    def test_lying_cylinder_patch(self):
        """Soft cylinder lying sideways on a halfspace (axis horizontal):
        line-contact patch, refinement-stable."""
        cyl = sh.Cylinder(radius=0.05, length=0.3)
        # Rotate axis (geometry z) to world x: R maps gz -> wx.
        R = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
        delta = 0.005
        forces = {}
        for rings in (2, 6):
            b = ModelBuilder()
            b.add_body("c", parent=None, joint_type="floating", mass=1.0,
                       inertia_com=np.eye(3) * 1e-3)
            model, params = b.build(F64)
            geoms = [
                CollisionGeometry(
                    name="c", body=0, shape=cyl, friction=0.5,
                    dissipation=0.1, hydroelastic_modulus=E_MOD,
                    hydro_rings=rings, R_BG=R,
                ),
                CollisionGeometry(
                    name="ground", body=-1, shape=sh.HalfSpace(),
                    friction=0.5, stiffness=1e10, dissipation=0.1,
                ),
            ]
            scene = CollisionScene.build(geoms)
            q = [1, 0, 0, 0, 0.0, 0.0, 0.05 - delta]
            F, contact = _patch_force(model, params, scene, q)
            forces[rings] = F
            assert float(contact.phi.min()) < -0.9 * delta
        assert forces[6] > 0
        assert abs(forces[2] - forces[6]) / forces[6] < 0.05, forces
