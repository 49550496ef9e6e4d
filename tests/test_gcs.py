"""GCS trajectory optimization tests (reference planning/
trajectory_optimization/test/gcs_trajectory_optimization_test.cc
patterns: corridor routing, containment, continuity)."""

import jax.numpy as jnp
import numpy as np

from drake_tpu.planning.gcs import GcsTrajectoryOptimization, _chebyshev_radius
from drake_tpu.planning.iris import HPolyhedron


def _corridor_regions():
    return [
        HPolyhedron.box([0.0, 0.0], [0.4, 1.0]),
        HPolyhedron.box([0.3, 0.6], [0.7, 1.0]),
        HPolyhedron.box([0.6, 0.0], [1.0, 1.0]),
    ]


class TestGraph:
    def test_overlap_detection(self):
        r = _corridor_regions()
        assert _chebyshev_radius(r[0], r[1]) > 0.01
        assert _chebyshev_radius(r[1], r[2]) > 0.01
        assert _chebyshev_radius(r[0], r[2]) < 1e-6  # disjoint in x

    def test_edges(self):
        gcs = GcsTrajectoryOptimization(_corridor_regions())
        assert (0, 1) in gcs.edges and (1, 2) in gcs.edges
        assert (0, 2) not in gcs.edges


class TestTrajectory:
    def test_corridor_routing(self):
        """Start and goal in the outer regions: the path must detour
        through the top corridor, staying inside the union."""
        gcs = GcsTrajectoryOptimization(_corridor_regions(), order=3)
        start = np.array([0.1, 0.1])
        goal = np.array([0.9, 0.1])
        traj, res = gcs.solve(start, goal)
        assert res.is_success()
        np.testing.assert_allclose(
            np.asarray(traj.value(0.0)), start, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(traj.value(1.0)), goal, atol=1e-5
        )
        regions = _corridor_regions()
        for s in np.linspace(0, 1, 101):
            p = traj.value(float(s))
            assert any(
                bool(r.contains(jnp.asarray(p))) for r in regions
            ), f"left the union at s={s}"
        # The detour actually goes through the top corridor.
        ys = [float(traj.value(float(s))[1]) for s in np.linspace(0, 1, 101)]
        assert max(ys) > 0.55

    def test_c1_continuity(self):
        gcs = GcsTrajectoryOptimization(_corridor_regions(), order=3)
        traj, res = gcs.solve([0.1, 0.1], [0.9, 0.1])
        m = traj.control_points.shape[0]
        for j in range(1, m):
            sj = j / m
            d_left = np.asarray(traj.derivative_value(sj - 1e-6))
            d_right = np.asarray(traj.derivative_value(sj + 1e-6))
            np.testing.assert_allclose(d_left, d_right, atol=1e-3)

    def test_single_region(self):
        gcs = GcsTrajectoryOptimization(
            [HPolyhedron.box([0.0, 0.0], [1.0, 1.0])]
        )
        traj, res = gcs.solve([0.1, 0.1], [0.9, 0.9])
        assert res.is_success()
        # Straight line inside one box.
        mid = np.asarray(traj.value(0.5))
        np.testing.assert_allclose(mid, [0.5, 0.5], atol=1e-3)
