"""Convex-set algebra tests (geometry/optimization role)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.geometry import optimization as gopt

F64 = jnp.float64


class TestHPolyhedron:
    def test_box_contains(self):
        P = gopt.HPolyhedron.box([-1.0, -2.0], [1.0, 2.0])
        assert bool(P.contains(jnp.asarray([0.5, -1.5])))
        assert not bool(P.contains(jnp.asarray([1.5, 0.0])))

    def test_intersection(self):
        A = gopt.HPolyhedron.box([-1.0, -1.0], [1.0, 1.0])
        B = gopt.HPolyhedron.box([0.0, 0.0], [2.0, 2.0])
        I = gopt.intersection(A, B)
        assert bool(I.contains(jnp.asarray([0.5, 0.5])))
        assert not bool(I.contains(jnp.asarray([-0.5, 0.5])))
        assert not bool(I.contains(jnp.asarray([1.5, 1.5])))

    def test_cartesian_product(self):
        A = gopt.HPolyhedron.box([-1.0], [1.0])
        B = gopt.HPolyhedron.box([2.0], [3.0])
        P = gopt.cartesian_product(A, B)
        assert bool(P.contains(jnp.asarray([0.0, 2.5])))
        assert not bool(P.contains(jnp.asarray([0.0, 1.5])))

    def test_minkowski_sum_boxes(self):
        S = gopt.minkowski_sum_boxes([-1.0], [1.0], [-0.5], [0.5])
        assert bool(S.contains(jnp.asarray([1.4])))
        assert not bool(S.contains(jnp.asarray([1.6])))

    def test_chebyshev_center(self):
        # Box [-1,1]x[-3,3]: center (0,0), radius 1.
        P = gopt.HPolyhedron.box([-1.0, -3.0], [1.0, 3.0])
        x, r = gopt.chebyshev_center(P)
        np.testing.assert_allclose(np.asarray(x)[0], 0.0, atol=1e-5)
        assert r == pytest.approx(1.0, abs=1e-5)

    def test_chebyshev_center_triangle(self):
        # Simplex x,y >= 0, x + y <= 1: incenter at r*(1,1), r = 1/(2+sqrt(2)).
        A = jnp.asarray([[-1.0, 0.0], [0.0, -1.0], [1.0, 1.0]], F64)
        b = jnp.asarray([0.0, 0.0, 1.0], F64)
        x, r = gopt.chebyshev_center(gopt.HPolyhedron(A, b))
        r_true = 1.0 / (2.0 + np.sqrt(2.0))
        assert r == pytest.approx(r_true, abs=1e-5)
        np.testing.assert_allclose(np.asarray(x), [r_true, r_true], atol=1e-4)


class TestVPolytope:
    def test_from_box_contains(self):
        V = gopt.VPolytope.from_box([-1.0, -1.0], [1.0, 1.0])
        assert V.vertices.shape == (4, 2)
        assert bool(V.contains(jnp.asarray([0.3, -0.7])))
        assert bool(V.contains(jnp.asarray([1.0, 1.0])))
        assert not bool(V.contains(jnp.asarray([1.2, 0.0])))

    def test_triangle_membership_batch(self):
        V = gopt.VPolytope(
            vertices=jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], F64)
        )
        pts = jnp.asarray(
            [[0.2, 0.2], [0.9, 0.05], [0.6, 0.6], [-0.1, 0.1]], F64
        )
        got = jax.vmap(V.contains)(pts)
        np.testing.assert_array_equal(
            np.asarray(got), [True, True, False, False]
        )


class TestEllipsoidAndPoint:
    def test_sphere_membership(self):
        E = gopt.ellipsoid_from_sphere(jnp.asarray([1.0, 0.0], F64), 2.0)
        assert bool(gopt.ellipsoid_contains(E, jnp.asarray([2.5, 0.0])))
        assert not bool(gopt.ellipsoid_contains(E, jnp.asarray([3.5, 0.0])))

    def test_point(self):
        P = gopt.Point(jnp.asarray([1.0, 2.0], F64))
        assert bool(P.contains(jnp.asarray([1.0, 2.0])))
        assert not bool(P.contains(jnp.asarray([1.0, 2.1])))


class TestSpectrahedron:
    """Affine PSD slice (geometry/optimization/spectrahedron.h role)."""

    def _disk(self):
        # [[1+x, y], [y, 1-x]] >= 0  <=>  x^2 + y^2 <= 1.
        import numpy as np

        from drake_tpu.geometry.optimization import Spectrahedron

        F0 = np.eye(2)
        Fx = np.diag([1.0, -1.0])
        Fy = np.asarray([[0.0, 1.0], [1.0, 0.0]])
        return Spectrahedron(F=jnp.asarray(np.stack([F0, Fx, Fy])))

    def test_membership_is_the_unit_disk(self):
        s = self._disk()
        assert bool(s.contains(jnp.asarray([0.3, 0.4])))
        assert bool(s.contains(jnp.asarray([0.6, -0.79])))
        assert not bool(s.contains(jnp.asarray([0.8, 0.7])))
        assert not bool(s.contains(jnp.asarray([1.05, 0.0])))

    def test_membership_vmaps(self):
        s = self._disk()
        xs = jnp.asarray([[0.0, 0.0], [0.9, 0.0], [0.9, 0.9]])
        got = jax.vmap(s.contains)(xs)
        assert got.tolist() == [True, True, False]

    def test_interior_point_maximizes_margin(self):
        s = self._disk()
        x, t = s.interior_point()
        # The analytic optimum: x = 0, margin t = 1 (eigs of I).
        assert abs(float(x[0])) < 0.05 and abs(float(x[1])) < 0.05
        assert abs(t - 1.0) < 0.05
        assert bool(s.contains(x))


class TestMinkowskiSumAndIntersection:
    def test_vpolytope_minkowski_sum_exact(self):
        from drake_tpu.geometry.optimization import (
            VPolytope,
            minkowski_sum,
        )

        a = VPolytope.from_box([-1.0, -1.0], [1.0, 1.0])
        b = VPolytope.from_box([-0.5, -0.25], [0.5, 0.25])
        s = minkowski_sum(a, b)
        # Sum of boxes is the box of summed bounds: [-1.5,1.5]x[-1.25,1.25].
        assert s.vertices.shape == (4, 2)
        assert bool(s.contains(jnp.asarray([1.45, -1.2])))
        assert not bool(s.contains(jnp.asarray([1.55, 0.0])))

    def test_degenerate_minkowski_sum(self):
        # Non-full-dimensional operands (collinear 2-D segments) must not
        # raise (qhull degeneracy fallback): the sum is the segment
        # [0,0]..[3,0], returned as a valid (possibly unreduced) VPolytope.
        import numpy as np

        from drake_tpu.geometry.optimization import VPolytope, minkowski_sum

        a = VPolytope(vertices=jnp.asarray([[0.0, 0.0], [1.0, 0.0]]))
        b = VPolytope(vertices=jnp.asarray([[0.0, 0.0], [2.0, 0.0]]))
        s = minkowski_sum(a, b)
        v = np.asarray(s.vertices)
        assert np.allclose(v[:, 1], 0.0)
        assert np.isclose(v[:, 0].min(), 0.0)
        assert np.isclose(v[:, 0].max(), 3.0)

    def test_generic_intersection(self):
        from drake_tpu.geometry.optimization import (
            HPolyhedron,
            Intersection,
            ellipsoid_from_sphere,
        )

        box = HPolyhedron.box(jnp.asarray([-1.0, -1.0]), jnp.asarray([1.0, 1.0]))
        ball = ellipsoid_from_sphere(jnp.asarray([0.5, 0.0]), 1.0)
        inter = Intersection(box, ball)
        assert bool(inter.contains(jnp.asarray([0.5, 0.5])))
        assert not bool(inter.contains(jnp.asarray([-0.9, 0.0])))  # outside ball
        assert not bool(inter.contains(jnp.asarray([1.2, 0.0])))  # outside box
