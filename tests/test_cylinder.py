"""Cylinder contact support (the reference's Cylinder proximity shape).

Analytic fixtures in the reference's style: exact SDF values/normals,
resting contact force balance on both cylinder poses (standing on a cap,
lying on the curved side), rolling support, and dispatch coverage
(sphere / capsule / box / mesh / second cylinder / hydro / MPM coupling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import FLOATING, ModelBuilder

F64 = jnp.float64


class TestCylinderSdf:
    def test_exact_values_and_normals(self):
        R = jnp.eye(3)
        p0 = jnp.zeros(3)
        r, L = 0.3, 1.0
        pts = jnp.asarray([
            [0.5, 0.0, 0.0],   # beside the curved face
            [0.0, 0.0, 0.8],   # above the +z cap
            [0.5, 0.0, 0.8],   # outside the rim corner
            [0.1, 0.0, 0.0],   # inside, radial nearest
            [0.0, 0.0, 0.45],  # inside, cap nearest
        ])
        phi, n = sh.cylinder_sdf_point(R, p0, r, L, pts)
        np.testing.assert_allclose(
            np.asarray(phi),
            [0.2, 0.3, np.hypot(0.2, 0.3), -0.2, -0.05],
            atol=1e-9,
        )
        np.testing.assert_allclose(np.asarray(n[0]), [1, 0, 0], atol=1e-9)
        np.testing.assert_allclose(np.asarray(n[1]), [0, 0, 1], atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(n[2]),
            np.asarray([0.2, 0.0, 0.3]) / np.hypot(0.2, 0.3), atol=1e-9,
        )
        np.testing.assert_allclose(np.asarray(n[3]), [1, 0, 0], atol=1e-9)
        np.testing.assert_allclose(np.asarray(n[4]), [0, 0, 1], atol=1e-9)

    def test_rotated_pose(self):
        from drake_tpu.math import rotations as rot

        # Axis along world x: point above the curved side.
        R = rot.rot_y(jnp.asarray(jnp.pi / 2))
        phi, n = sh.cylinder_sdf_point(
            R, jnp.zeros(3), 0.3, 1.0, jnp.asarray([[0.0, 0.0, 0.5]])
        )
        np.testing.assert_allclose(float(phi[0]), 0.2, atol=1e-9)
        np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-7)


def _drop(shape, z0, R_init=None, steps=1200, h=2e-3):
    """Drop a floating body with ``shape`` onto the ground plane."""
    b = ModelBuilder()
    b.add_body("body", parent=None, joint_type=FLOATING, mass=1.0,
               inertia_com=np.eye(3) * 0.02)
    model, params = b.build(F64)
    geoms = [
        CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                          friction=0.6),
        CollisionGeometry(name="body", body=0, shape=shape, friction=0.6,
                          stiffness=1e6, dissipation=1.0),
    ]
    scene = CollisionScene.build(geoms)
    dsys = cplant.make_discrete_system(model, params, scene, h)
    x = model.default_state(F64)
    if R_init is not None:
        from drake_tpu.math import rotations as rot

        x = x.at[0:4].set(rot.rotation_to_quat(R_init))
    x = x.at[6].set(z0)

    def body(xx, _):
        return dsys.g(params, xx, jnp.zeros(0, F64)), ()

    xf, _ = jax.lax.scan(body, x, None, length=steps)
    return model, xf


class TestCylinderOnGround:
    def test_standing_rest(self):
        """Standing on a cap: settles at z = L/2, upright, zero velocity."""
        cyl = sh.Cylinder(radius=0.2, length=0.5)
        model, xf = _drop(cyl, 0.30)
        nq = model.num_positions
        assert float(jnp.abs(xf[nq:]).max()) < 1e-3
        np.testing.assert_allclose(float(xf[6]), 0.25, atol=2e-3)
        # Still upright (quaternion ~ identity up to z-spin).
        assert abs(float(xf[0])) > 0.99 or abs(float(xf[3])) > 0.99

    def test_lying_rest(self):
        """Lying on the curved side: settles at z = radius."""
        from drake_tpu.math import rotations as rot

        cyl = sh.Cylinder(radius=0.2, length=0.5)
        model, xf = _drop(
            cyl, 0.25, R_init=rot.rot_y(jnp.asarray(jnp.pi / 2))
        )
        nq = model.num_positions
        assert float(jnp.abs(xf[nq:]).max()) < 2e-3
        np.testing.assert_allclose(float(xf[6]), 0.2, atol=2e-3)


class TestCylinderDispatch:
    def _geom(self, shape, body=0, **kw):
        return CollisionGeometry(
            name=f"g{body}", body=body, shape=shape, friction=0.5,
            stiffness=1e5, **kw,
        )

    def test_pair_counts(self):
        from drake_tpu.geometry.scene import _contacts_per_pair

        cyl = self._geom(sh.Cylinder(0.2, 0.5))
        assert _contacts_per_pair(self._geom(sh.Sphere(0.1), 1), cyl) == 1
        assert _contacts_per_pair(self._geom(sh.Capsule(0.1, 0.3), 1), cyl) == 2
        assert _contacts_per_pair(self._geom(sh.Box((0.1,) * 3), 1), cyl) == 8
        assert _contacts_per_pair(
            self._geom(sh.HalfSpace(), -1), cyl) == 6
        assert _contacts_per_pair(
            self._geom(sh.Cylinder(0.1, 0.2), 1), cyl) == 12

    def test_sphere_on_cylinder(self):
        """Ball resting on a lying cylinder's curved top."""
        from drake_tpu.geometry.scene import _pair_contacts
        from drake_tpu.math import rotations as rot

        Rc = rot.rot_y(jnp.asarray(jnp.pi / 2))
        out = _pair_contacts(
            self._geom(sh.Sphere(0.1), 1), jnp.eye(3),
            jnp.asarray([0.0, 0.0, 0.32]),
            self._geom(sh.Cylinder(0.25, 1.0), 0), Rc, jnp.zeros(3),
            F64,
        )
        assert len(out) == 1
        phi, p, n = out[0]
        np.testing.assert_allclose(float(phi), -0.03, atol=1e-9)
        np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-7)

    def test_hydro_rigid_cylinder(self):
        from drake_tpu.geometry.scene import _hydro_pair

        soft = self._geom(sh.Sphere(0.1), 1, hydroelastic_modulus=1e5)
        cyl = self._geom(sh.Cylinder(0.2, 0.5))
        hp = _hydro_pair(soft, cyl)
        assert hp is not None and hp[0] is soft

    def test_mpm_coupling_cylinder(self):
        from drake_tpu.mpm.coupling import RigidGeom, _particle_sdf

        geom = RigidGeom(
            shape=sh.Cylinder(0.3, 1.0), body_index=-1, R_WG=jnp.eye(3),
            p_WG=jnp.zeros(3), p_WB=jnp.zeros(3), V_WB=jnp.zeros(6),
        )
        phi, n = _particle_sdf(geom, jnp.asarray([[0.5, 0.0, 0.0]]))
        np.testing.assert_allclose(float(phi[0]), 0.2, atol=1e-9)
