"""Trajectory types: piecewise polynomials on uniform/nonuniform grids.

Re-derivation of the reference's trajectory layer (reference:
common/trajectories/piecewise_polynomial.h — ZeroOrderHold/FirstOrderHold/
CubicShapePreserving/CubicWithContinuousSecondDerivatives constructors,
value/derivative evaluation; bspline_trajectory.h) as jittable functions
over stacked coefficient arrays.  Evaluation vmaps over query times, and
trajectories are pytrees so they pass through jit/scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from drake_tpu.utils.struct import pytree_dataclass, static_field


@pytree_dataclass
class PiecewisePolynomial:
    """Piecewise cubic y(t) = sum_k c[k, i] * (t - t_i)^k on segment i.

    coeffs: (num_segments, 4, dim) — constant..cubic coefficients.
    breaks: (num_segments + 1,).
    """

    breaks: jnp.ndarray
    coeffs: jnp.ndarray

    @property
    def start_time(self):
        return self.breaks[0]

    @property
    def end_time(self):
        return self.breaks[-1]

    def _segment(self, t):
        idx = jnp.searchsorted(self.breaks, t, side="right") - 1
        return jnp.clip(idx, 0, self.breaks.shape[0] - 2)

    def value(self, t):
        """Evaluate at scalar t (vmap for batches)."""
        t = jnp.clip(t, self.start_time, self.end_time)
        i = self._segment(t)
        tau = t - self.breaks[i]
        c = self.coeffs[i]  # (4, dim)
        return ((c[3] * tau + c[2]) * tau + c[1]) * tau + c[0]

    def derivative_value(self, t, order: int = 1):
        t = jnp.clip(t, self.start_time, self.end_time)
        i = self._segment(t)
        tau = t - self.breaks[i]
        c = self.coeffs[i]
        if order == 1:
            return (3 * c[3] * tau + 2 * c[2]) * tau + c[1]
        if order == 2:
            return 6 * c[3] * tau + 2 * c[2]
        raise ValueError("order must be 1 or 2")

    def vector_values(self, ts):
        return jax.vmap(self.value)(ts)

    # ---- constructors (matching the reference's names) -------------------
    @staticmethod
    def zero_order_hold(breaks, samples):
        """Piecewise-constant; samples: (n, dim) held on [t_i, t_{i+1})."""
        breaks = jnp.asarray(breaks)
        samples = jnp.asarray(samples)
        n = breaks.shape[0] - 1
        dim = samples.shape[1]
        coeffs = jnp.zeros((n, 4, dim), samples.dtype)
        coeffs = coeffs.at[:, 0].set(samples[:-1])
        return PiecewisePolynomial(breaks=breaks, coeffs=coeffs)

    @staticmethod
    def first_order_hold(breaks, samples):
        """Piecewise-linear interpolation (the reference's warm-start idiom)."""
        breaks = jnp.asarray(breaks)
        samples = jnp.asarray(samples)
        dt = jnp.diff(breaks)[:, None]
        n = breaks.shape[0] - 1
        dim = samples.shape[1]
        coeffs = jnp.zeros((n, 4, dim), samples.dtype)
        coeffs = coeffs.at[:, 0].set(samples[:-1])
        coeffs = coeffs.at[:, 1].set((samples[1:] - samples[:-1]) / dt)
        return PiecewisePolynomial(breaks=breaks, coeffs=coeffs)

    @staticmethod
    def cubic_hermite(breaks, samples, derivatives):
        """Cubic with specified sample derivatives (CubicHermite)."""
        breaks = jnp.asarray(breaks)
        y = jnp.asarray(samples)
        yd = jnp.asarray(derivatives)
        h = jnp.diff(breaks)[:, None]
        y0, y1 = y[:-1], y[1:]
        d0, d1 = yd[:-1], yd[1:]
        c0 = y0
        c1 = d0
        c2 = (3 * (y1 - y0) / h - 2 * d0 - d1) / h
        c3 = (2 * (y0 - y1) / h + d0 + d1) / (h * h)
        coeffs = jnp.stack([c0, c1, c2, c3], axis=1)
        return PiecewisePolynomial(breaks=breaks, coeffs=coeffs)

    @staticmethod
    def cubic_with_continuous_second_derivatives(
        breaks, samples, periodic: bool = False
    ):
        """Natural cubic spline (C2), the reference's default cubic."""
        breaks = jnp.asarray(breaks)
        y = jnp.asarray(samples)
        n = breaks.shape[0]
        h = jnp.diff(breaks)
        # Solve the tridiagonal system for second derivatives (natural BCs).
        dim = y.shape[1]
        A = jnp.zeros((n, n), y.dtype)
        rhs = jnp.zeros((n, dim), y.dtype)
        A = A.at[0, 0].set(1.0)
        A = A.at[n - 1, n - 1].set(1.0)
        for i in range(1, n - 1):
            A = A.at[i, i - 1].set(h[i - 1])
            A = A.at[i, i].set(2 * (h[i - 1] + h[i]))
            A = A.at[i, i + 1].set(h[i])
            rhs = rhs.at[i].set(
                6 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
            )
        M = jnp.linalg.solve(A, rhs)  # second derivatives at breaks
        hcol = h[:, None]
        c0 = y[:-1]
        c1 = (y[1:] - y[:-1]) / hcol - hcol * (2 * M[:-1] + M[1:]) / 6
        c2 = M[:-1] / 2
        c3 = (M[1:] - M[:-1]) / (6 * hcol)
        coeffs = jnp.stack([c0, c1, c2, c3], axis=1)
        return PiecewisePolynomial(breaks=breaks, coeffs=coeffs)


@pytree_dataclass
class BsplineTrajectory:
    """Uniform clamped B-spline of order k (degree k-1) — the
    KinematicTrajectoryOptimization representation (bspline_trajectory.h)."""

    knots: jnp.ndarray  # (m,) full clamped knot vector
    control_points: jnp.ndarray  # (n, dim)
    order: int = static_field(default=4)

    def value(self, t):
        """De Boor evaluation at scalar t."""
        k = self.order
        knots = self.knots
        t = jnp.clip(t, knots[k - 1], knots[-k] - 1e-9)
        # Find the knot span.
        span = jnp.clip(
            jnp.searchsorted(knots, t, side="right") - 1,
            k - 1,
            self.control_points.shape[0] - 1,
        )
        # De Boor's algorithm with static loop bounds.
        d = [self.control_points[span - k + 1 + j] for j in range(k)]
        for r in range(1, k):
            for j in range(k - 1, r - 1, -1):
                i = span - k + 1 + j
                denom = knots[i + k - r] - knots[i]
                alpha = jnp.where(denom > 0, (t - knots[i]) / jnp.maximum(denom, 1e-12), 0.0)
                d[j] = (1 - alpha) * d[j - 1] + alpha * d[j]
        return d[k - 1]

    def start_time(self):
        return self.knots[0]

    def end_time(self):
        return self.knots[-1]

    def derivative(self) -> "BsplineTrajectory":
        """Exact derivative spline: order k-1 with control points
        (k-1) (P_{i+1} - P_i) / (t_{i+k} - t_{i+1}) over knots[1:-1]."""
        k = self.order
        P = self.control_points
        t = self.knots
        denom = t[k : k + P.shape[0] - 1] - t[1 : P.shape[0]]
        d = (
            (k - 1)
            * (P[1:] - P[:-1])
            / jnp.maximum(denom, 1e-12)[:, None]
        )
        return BsplineTrajectory(
            knots=self.knots[1:-1], control_points=d, order=k - 1
        )

    def derivative_value(self, t, order: int = 1):
        traj = self
        for _ in range(order):
            traj = traj.derivative()
        return traj.value(t)

    @staticmethod
    def make_clamped_uniform(control_points, order: int = 4, t0=0.0, tf=1.0):
        control_points = jnp.asarray(control_points)
        n = control_points.shape[0]
        k = order
        interior = jnp.linspace(t0, tf, n - k + 2)[1:-1]
        knots = jnp.concatenate(
            [jnp.full(k, t0), interior, jnp.full(k, tf)]
        )
        return BsplineTrajectory(
            knots=knots, control_points=control_points, order=order
        )
