"""Hyperrectangle / AffineSubspace / AffineBall (geometry/optimization
hyperrectangle.h, affine_subspace.h, affine_ball.h roles)."""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.geometry.optimization import (
    AffineBall,
    AffineSubspace,
    Hyperellipsoid,
    Hyperrectangle,
)


class TestHyperrectangle:
    def test_contains_center_sample(self):
        r = Hyperrectangle(jnp.array([-1.0, 0.0]), jnp.array([1.0, 2.0]))
        assert bool(r.contains(jnp.array([0.5, 1.0])))
        assert not bool(r.contains(jnp.array([1.5, 1.0])))
        np.testing.assert_allclose(r.center(), [0.0, 1.0])
        xs = r.uniform_sample(jax.random.PRNGKey(0), 512)
        assert xs.shape == (512, 2)
        assert bool(jnp.all(jax.vmap(r.contains)(xs)))
        # Uniform: mean near center.
        np.testing.assert_allclose(jnp.mean(xs, 0), [0.0, 1.0], atol=0.1)

    def test_to_hpolyhedron_and_aabb(self):
        r = Hyperrectangle(jnp.array([-1.0, 0.0]), jnp.array([1.0, 2.0]))
        poly = r.to_hpolyhedron()
        x = jnp.array([0.9, 1.9])
        assert bool(jnp.all(poly.A @ x <= poly.b))
        pts = jnp.array([[0.0, 1.0], [2.0, -1.0], [1.0, 3.0]])
        box = Hyperrectangle.maybe_calc_axis_aligned_bounding_box(pts)
        np.testing.assert_allclose(box.lower, [0.0, -1.0])
        np.testing.assert_allclose(box.upper, [2.0, 3.0])


class TestAffineSubspace:
    def test_projection_and_membership(self):
        # The plane z = 1 in R^3.
        s = AffineSubspace(
            basis=jnp.eye(3)[:, :2], translation=jnp.array([0.0, 0.0, 1.0])
        )
        assert s.affine_dimension == 2
        p = s.project(jnp.array([0.3, -0.2, 5.0]))
        np.testing.assert_allclose(p, [0.3, -0.2, 1.0], atol=1e-12)
        assert bool(s.contains(jnp.array([2.0, 3.0, 1.0])))
        assert not bool(s.contains(jnp.array([0.0, 0.0, 0.0])))

    def test_affine_hull_recovers_plane(self):
        key = jax.random.PRNGKey(1)
        u = jax.random.normal(key, (20, 2))
        basis = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, -1.0]])
        pts = u @ basis.T + jnp.array([0.0, 0.0, 2.0])
        hull = AffineSubspace.affine_hull(pts)
        assert hull.affine_dimension == 2
        for p in pts[:5]:
            assert bool(hull.contains(p, tol=1e-6))


class TestAffineBall:
    def test_unit_ball_and_axis_aligned(self):
        b = AffineBall.make_unit_ball(3)
        assert bool(b.contains(jnp.array([0.5, 0.5, 0.5])))
        assert not bool(b.contains(jnp.array([1.0, 1.0, 0.0])))
        e = AffineBall.make_axis_aligned(
            jnp.array([2.0, 1.0]), jnp.array([1.0, 0.0])
        )
        assert bool(e.contains(jnp.array([2.9, 0.0])))
        assert not bool(e.contains(jnp.array([1.0, 1.1])))
        np.testing.assert_allclose(
            float(e.volume()), np.pi * 2.0 * 1.0, rtol=1e-6
        )

    def test_degenerate_flat_ball(self):
        # A segment in R^2: B is (2,1) — the case Hyperellipsoid can't be.
        b = AffineBall(
            B=jnp.array([[1.0], [0.0]]), center=jnp.array([0.0, 0.0])
        )
        assert bool(b.contains(jnp.array([0.7, 0.0])))
        assert not bool(b.contains(jnp.array([0.7, 0.2])))
        assert not bool(b.contains(jnp.array([1.3, 0.0])))

    def test_from_hyperellipsoid_round_trip(self):
        e = Hyperellipsoid(
            C=jnp.array([[0.5, 0.0], [0.0, 2.0]]), d=jnp.array([1.0, -1.0])
        )
        b = AffineBall.from_hyperellipsoid(e)
        # Boundary point of the ellipse: x = d + C^-1 [1, 0].
        x_b = e.d + jnp.linalg.inv(e.C) @ jnp.array([1.0, 0.0])
        assert bool(b.contains(x_b, tol=1e-9))
        assert not bool(b.contains(x_b * 1.05 + 0.01))
