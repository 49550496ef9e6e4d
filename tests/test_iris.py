"""IRIS region generation tests (reference geometry/optimization/test/
iris_test.cc patterns: seed containment, obstacle exclusion, inscribed
ellipsoid quality)."""

import jax.numpy as jnp
import numpy as np

from drake_tpu.planning.iris import (
    HPolyhedron,
    Hyperellipsoid,
    IrisObstacle,
    _mvie,
    iris,
)


class TestMvie:
    def test_box_inscribed_ellipsoid(self):
        """MVIE of an axis-aligned box = ellipse with semi-axes = half
        extents, centered."""
        dom = HPolyhedron.box([-1.0, -0.5], [1.0, 0.5])
        E = _mvie(dom.A, dom.b, jnp.asarray([0.2, 0.1], jnp.float64))
        np.testing.assert_allclose(np.asarray(E.d), [0, 0], atol=2e-2)
        # C^-1 semi-axes: singular values of inv(C) ~ (1.0, 0.5).
        s = np.linalg.svd(np.linalg.inv(np.asarray(E.C)), compute_uv=False)
        np.testing.assert_allclose(sorted(s), [0.5, 1.0], rtol=0.05)

    def test_simplex(self):
        """MVIE stays inside a triangle: all sampled ellipsoid boundary
        points satisfy the inequalities."""
        A = jnp.asarray(
            [[-1.0, 0.0], [0.0, -1.0], [1.0, 1.0]], jnp.float64
        )
        b = jnp.asarray([0.0, 0.0, 1.0], jnp.float64)
        E = _mvie(A, b, jnp.asarray([0.25, 0.25], jnp.float64))
        L = np.linalg.inv(np.asarray(E.C))
        th = np.linspace(0, 2 * np.pi, 64)
        pts = np.asarray(E.d)[None] + (
            L @ np.stack([np.cos(th), np.sin(th)])
        ).T
        assert (pts @ np.asarray(A).T <= np.asarray(b) + 1e-6).all()
        # The John ellipse of any triangle has area pi/(3 sqrt(3)) x the
        # triangle area (affine invariance from the equilateral case).
        s = np.linalg.svd(L, compute_uv=False)
        area = np.pi * s[0] * s[1]
        exact = np.pi / (3 * np.sqrt(3)) * 0.5
        assert area > 0.95 * exact


class TestIris:
    def _setup(self):
        domain = HPolyhedron.box([0.0, 0.0], [1.0, 1.0])
        obstacles = [
            IrisObstacle(
                kind="sphere", center=np.array([0.75, 0.75]), radius=0.15
            ),
            IrisObstacle(
                kind="box", center=np.array([0.2, 0.8]),
                half=np.array([0.1, 0.1]),
            ),
            IrisObstacle(
                kind="points",
                points=np.array(
                    [[0.6, 0.1], [0.8, 0.1], [0.8, 0.3], [0.6, 0.3]]
                ),
            ),
        ]
        seed = jnp.asarray([0.35, 0.4], jnp.float64)
        return domain, obstacles, seed

    def test_region_contains_seed_excludes_obstacles(self):
        domain, obstacles, seed = self._setup()
        region, E = iris(seed, obstacles, domain)
        assert bool(region.contains(seed))
        # Obstacle centers are cut off.
        for ob in obstacles:
            c = (
                ob.center
                if ob.center is not None
                else ob.points.mean(axis=0)
            )
            assert not bool(region.contains(jnp.asarray(c, jnp.float64)))
        # Region stays inside the domain: sampled ellipsoid boundary
        # within [0,1]^2.
        L = np.linalg.inv(np.asarray(E.C))
        th = np.linspace(0, 2 * np.pi, 64)
        pts = np.asarray(E.d)[None] + (
            L @ np.stack([np.cos(th), np.sin(th)])
        ).T
        assert (pts >= -1e-6).all() and (pts <= 1 + 1e-6).all()

    def test_region_grows_beyond_seed_ball(self):
        domain, obstacles, seed = self._setup()
        region, E = iris(seed, obstacles, domain)
        s = np.linalg.svd(
            np.linalg.inv(np.asarray(E.C)), compute_uv=False
        )
        assert s.max() > 0.25  # inflated far beyond the 1e-2 seed ball

    def test_no_obstacles_fills_domain(self):
        domain = HPolyhedron.box([0.0, 0.0], [2.0, 1.0])
        region, E = iris(
            jnp.asarray([1.3, 0.4], jnp.float64), [], domain,
            num_iterations=2,
        )
        s = np.linalg.svd(
            np.linalg.inv(np.asarray(E.C)), compute_uv=False
        )
        np.testing.assert_allclose(sorted(s), [0.5, 1.0], rtol=0.08)

    def test_ellipsoid_avoids_obstacles(self):
        """No sampled ellipsoid point is inside any obstacle."""
        domain, obstacles, seed = self._setup()
        region, E = iris(seed, obstacles, domain)
        L = np.linalg.inv(np.asarray(E.C))
        th = np.linspace(0, 2 * np.pi, 128)
        pts = np.asarray(E.d)[None] + (
            L @ np.stack([np.cos(th), np.sin(th)])
        ).T
        sph = obstacles[0]
        assert (
            np.linalg.norm(pts - sph.center, axis=1) >= sph.radius - 1e-3
        ).all()
        box = obstacles[1]
        inside_box = (np.abs(pts - box.center) <= box.half - 1e-9).all(axis=1)
        assert not inside_box.any()
