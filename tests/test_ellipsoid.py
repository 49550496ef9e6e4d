"""Ellipsoid shape: SDF approximation, support points, contact dispatch.

Reference geometry/shape_specification.h Ellipsoid; the SDF is the
scaled-space first-order estimate (exact on the axes), the halfspace
witness uses the EXACT support map.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import FLOATING, ModelBuilder

F64 = jnp.float64
RADII = (0.3, 0.2, 0.1)


class TestEllipsoidSdf:
    def test_exact_on_axes(self):
        R = jnp.eye(3)
        p0 = jnp.zeros(3)
        pts = jnp.asarray([
            [0.5, 0.0, 0.0],
            [0.0, 0.5, 0.0],
            [0.0, 0.0, 0.5],
            [0.15, 0.0, 0.0],  # inside
        ])
        phi, n = sh.ellipsoid_sdf_point(R, p0, RADII, pts)
        np.testing.assert_allclose(
            np.asarray(phi), [0.2, 0.3, 0.4, -0.15], atol=1e-9
        )
        np.testing.assert_allclose(np.asarray(n[0]), [1, 0, 0], atol=1e-9)
        np.testing.assert_allclose(np.asarray(n[2]), [0, 0, 1], atol=1e-9)

    def test_surface_zero(self):
        """phi vanishes on the surface (any direction)."""
        R = jnp.eye(3)
        r = jnp.asarray(RADII)
        th = jnp.linspace(0.1, 3.0, 17)
        pts = jnp.stack([
            r[0] * jnp.sin(th) * jnp.cos(2 * th),
            r[1] * jnp.sin(th) * jnp.sin(2 * th),
            r[2] * jnp.cos(th),
        ], axis=-1)
        phi, _ = sh.ellipsoid_sdf_point(R, jnp.zeros(3), RADII, pts)
        assert float(jnp.abs(phi).max()) < 1e-7

    def test_support_point(self):
        p_sup = sh.ellipsoid_support_point(
            jnp.eye(3), jnp.zeros(3), RADII, jnp.asarray([0.0, 0.0, -1.0])
        )
        np.testing.assert_allclose(np.asarray(p_sup), [0, 0, -0.1],
                                   atol=1e-12)


class TestEllipsoidContact:
    def test_rest_on_ground(self):
        """An ellipsoid settles with its smallest semi-axis down at
        z = c (exact support-point witness)."""
        b = ModelBuilder()
        b.add_body("e", parent=None, joint_type=FLOATING, mass=1.0,
                   inertia_com=np.diag([0.01, 0.02, 0.026]))
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=0.8),
            CollisionGeometry(name="e", body=0, shape=sh.Ellipsoid(RADII),
                              friction=0.8, stiffness=1e6, dissipation=1.0),
        ]
        scene = CollisionScene.build(geoms)
        dsys = cplant.make_discrete_system(model, params, scene, 2e-3)
        x = model.default_state(F64).at[6].set(0.2)

        def step(xx, _):
            return dsys.g(params, xx, jnp.zeros(0, F64)), ()

        xf, _ = jax.lax.scan(step, x, None, length=600)
        nq = model.num_positions
        assert float(jnp.abs(xf[nq:]).max()) < 1e-3
        np.testing.assert_allclose(float(xf[6]), 0.1, atol=2e-3)

    def test_sphere_vs_ellipsoid(self):
        from drake_tpu.geometry.scene import _contacts_per_pair, _pair_contacts

        e = CollisionGeometry(name="e", body=0, shape=sh.Ellipsoid(RADII),
                              friction=0.5, stiffness=1e5)
        s = CollisionGeometry(name="s", body=1, shape=sh.Sphere(0.05),
                              friction=0.5, stiffness=1e5)
        assert _contacts_per_pair(s, e) == 1
        out = _pair_contacts(
            s, jnp.eye(3), jnp.asarray([0.0, 0.0, 0.14]),
            e, jnp.eye(3), jnp.zeros(3), F64,
        )
        phi, p, n = out[0]
        np.testing.assert_allclose(float(phi), -0.01, atol=1e-9)
        np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-7)
