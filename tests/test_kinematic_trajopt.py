"""KinematicTrajectoryOptimization tests (reference planning/
trajectory_optimization/test/kinematic_trajectory_optimization_test.cc
patterns: boundary interpolation, bound satisfaction, duration trade-off).
"""

import jax.numpy as jnp
import numpy as np

from drake_tpu.solvers import sqp
from drake_tpu.trajopt.kinematic import KinematicTrajectoryOptimization

F64 = jnp.float64


class TestKinematicTrajopt:
    def test_straight_line_fixed_duration(self):
        """Min path energy start->goal: the optimum is the straight line."""
        kto = KinematicTrajectoryOptimization(2, 8, duration=2.0)
        q0, qf = np.array([0.0, 0.0]), np.array([1.0, -1.0])
        kto.AddPathPositionConstraint(q0, q0, 0.0)
        kto.AddPathPositionConstraint(qf, qf, 1.0)
        kto.AddPathEnergyCost(1.0)
        kto.SetInitialGuessLinear(q0, qf + 0.3)
        traj, res = kto.Solve()
        assert res.is_success()
        np.testing.assert_allclose(
            np.asarray(traj.value(0.0)), q0, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(traj.value(2.0)), qf, atol=1e-4
        )
        # Midpoint on the line.
        np.testing.assert_allclose(
            np.asarray(traj.value(1.0)), 0.5 * (q0 + qf), atol=1e-3
        )

    def test_rest_to_rest_velocity_bounds(self):
        """Optimized duration with |qdot| <= 0.5: T must be >= distance /
        vmax = 2.0; duration cost drives it near the bound."""
        kto = KinematicTrajectoryOptimization(1, 6)
        q0, qf = np.array([0.0]), np.array([1.0])
        kto.AddPathPositionConstraint(q0, q0, 0.0)
        kto.AddPathPositionConstraint(qf, qf, 1.0)
        kto.AddPathVelocityConstraint([0.0], [0.0], 0.0)
        kto.AddPathVelocityConstraint([0.0], [0.0], 1.0)
        kto.AddVelocityBounds([-0.5], [0.5], num_samples=15)
        kto.AddDurationCost(1.0)
        kto.AddPathEnergyCost(0.1)
        kto.AddDurationConstraint(0.1, 20.0)
        kto.SetInitialGuessLinear(q0, qf)
        traj, res = kto.Solve(options=sqp.SqpOptions(max_iters=120))
        assert res.is_success()
        T = float(traj.end_time())
        assert T >= 2.0 - 1e-2  # can't beat the speed limit
        assert T < 4.5  # and doesn't dawdle
        # Velocity bound respected along the rollout.
        ts = np.linspace(0, T, 60)
        vels = [float(traj.derivative_value(t)[0]) for t in ts]
        assert max(np.abs(vels)) <= 0.5 + 5e-2
        np.testing.assert_allclose(np.asarray(traj.value(T)), qf, atol=1e-3)

    def test_position_bounds_hold(self):
        """A detour forced by waypoint + box keeps the path inside bounds."""
        kto = KinematicTrajectoryOptimization(2, 10, duration=1.0)
        q0, qf = np.array([0.0, 0.0]), np.array([1.0, 0.0])
        mid = np.array([0.5, 0.4])
        kto.AddPathPositionConstraint(q0, q0, 0.0)
        kto.AddPathPositionConstraint(mid, mid, 0.5)
        kto.AddPathPositionConstraint(qf, qf, 1.0)
        kto.AddPositionBounds([-0.1, -0.1], [1.1, 0.5], num_samples=12)
        kto.AddPathEnergyCost(1.0)
        kto.SetInitialGuessLinear(q0, qf)
        traj, res = kto.Solve()
        assert res.is_success()
        ts = np.linspace(0, 1, 50)
        vals = np.stack([np.asarray(traj.value(t)) for t in ts])
        assert vals[:, 1].max() <= 0.5 + 1e-3
        np.testing.assert_allclose(
            np.asarray(traj.value(0.5)), mid, atol=1e-3
        )
