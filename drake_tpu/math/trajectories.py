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

    def derivative(self) -> "PiecewisePolynomial":
        """The derivative as a trajectory (Trajectory::MakeDerivative)."""
        c = self.coeffs
        dc = jnp.stack(
            [c[:, 1], 2.0 * c[:, 2], 3.0 * c[:, 3], jnp.zeros_like(c[:, 0])],
            axis=1,
        )
        return PiecewisePolynomial(breaks=self.breaks, coeffs=dc)

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


@pytree_dataclass
class BezierCurve:
    """Bezier curve of arbitrary order on [start_time, end_time].

    Reference: common/trajectories/bezier_curve.h — value() via the de
    Casteljau/Bernstein form, derivative as an order-(n-1) Bezier with
    control points n*(P_{i+1}-P_i).  Here evaluation is the Bernstein-basis
    weighted sum (a single (n+1, dim) matvec — MXU-friendly and jit-safe;
    no recursion).

    control_points: (order + 1, dim).
    """

    breaks: jnp.ndarray  # (2,) = [t0, tf]
    control_points: jnp.ndarray

    @property
    def start_time(self):
        return self.breaks[0]

    @property
    def end_time(self):
        return self.breaks[1]

    @property
    def order(self) -> int:
        return self.control_points.shape[0] - 1

    def _bernstein(self, s):
        n = self.order
        k = jnp.arange(n + 1)
        # log-space binomials keep f32 exact up to order ~30
        log_binom = (
            jax.scipy.special.gammaln(n + 1.0)
            - jax.scipy.special.gammaln(k + 1.0)
            - jax.scipy.special.gammaln(n - k + 1.0)
        )
        s = jnp.clip(s, 0.0, 1.0)
        # guard log(0): the k=0 / k=n endpoint weights are exact by clipping
        log_s = jnp.log(jnp.maximum(s, 1e-30))
        log_1ms = jnp.log(jnp.maximum(1.0 - s, 1e-30))
        w = jnp.exp(log_binom + k * log_s + (n - k) * log_1ms)
        w = jnp.where(s <= 0.0, (k == 0).astype(w.dtype), w)
        w = jnp.where(s >= 1.0, (k == n).astype(w.dtype), w)
        return w

    def value(self, t):
        s = (t - self.start_time) / (self.end_time - self.start_time)
        return self._bernstein(s) @ self.control_points

    def derivative(self) -> "BezierCurve":
        n = self.order
        dp = (
            n
            * (self.control_points[1:] - self.control_points[:-1])
            / (self.end_time - self.start_time)
        )
        return BezierCurve(breaks=self.breaks, control_points=dp)

    def derivative_value(self, t, order: int = 1):
        c = self
        for _ in range(order):
            c = c.derivative()
        return c.value(t)

    def vector_values(self, ts):
        return jax.vmap(self.value)(ts)


@pytree_dataclass
class PiecewiseQuaternionSlerp:
    """Piecewise spherical-linear orientation trajectory.

    Reference: common/trajectories/piecewise_quaternion.h — orientation(t)
    slerps between knot quaternions; angular_velocity(t) is the constant
    axis*angle/dt of the active segment (expressed in the world frame).

    quats: (n, 4) wxyz knots, sign-aligned at construction so every segment
    takes the short way around.
    """

    breaks: jnp.ndarray  # (n,)
    quats: jnp.ndarray  # (n, 4)

    @staticmethod
    def make(breaks, quats):
        from drake_tpu.math import rotations as rot

        breaks = jnp.asarray(breaks)
        quats = jnp.asarray(quats)
        quats = jax.vmap(rot.quat_normalize)(quats)

        # Align signs sequentially: q_{i+1} <- -q_{i+1} if dot < 0.  A scan
        # (not a Python loop) so construction itself jits.
        def align(q_prev, q):
            q = jnp.where(jnp.dot(q_prev, q) < 0.0, -q, q)
            return q, q

        _, tail = jax.lax.scan(align, quats[0], quats[1:])
        quats = jnp.concatenate([quats[:1], tail], axis=0)
        return PiecewiseQuaternionSlerp(breaks=breaks, quats=quats)

    @property
    def start_time(self):
        return self.breaks[0]

    @property
    def end_time(self):
        return self.breaks[-1]

    def _segment(self, t):
        idx = jnp.searchsorted(self.breaks, t, side="right") - 1
        return jnp.clip(idx, 0, self.breaks.shape[0] - 2)

    def _segment_log(self, i):
        """axis*angle of q_i^{-1} q_{i+1} (body-frame relative rotation)."""
        from drake_tpu.math import rotations as rot

        dq = rot.quat_multiply(rot.quat_conjugate(self.quats[i]),
                               self.quats[i + 1])
        w = jnp.clip(dq[0], -1.0, 1.0)
        v = dq[1:]
        vn = jnp.linalg.norm(v)
        angle = 2.0 * jnp.arctan2(vn, w)
        axis = v / jnp.maximum(vn, 1e-12)
        return axis * angle

    def orientation(self, t):
        """Quaternion (wxyz) at scalar time t."""
        from drake_tpu.math import rotations as rot

        t = jnp.clip(t, self.start_time, self.end_time)
        i = self._segment(t)
        s = (t - self.breaks[i]) / jnp.maximum(
            self.breaks[i + 1] - self.breaks[i], 1e-12
        )
        aa = self._segment_log(i) * s
        angle = jnp.linalg.norm(aa)
        axis = aa / jnp.maximum(angle, 1e-12)
        dq = jnp.concatenate(
            [jnp.cos(angle / 2)[None], jnp.sin(angle / 2) * axis]
        )
        return rot.quat_multiply(self.quats[i], dq)

    def value(self, t):
        return self.orientation(t)

    def angular_velocity(self, t):
        """World-frame angular velocity (piecewise constant)."""
        from drake_tpu.math import rotations as rot

        t = jnp.clip(t, self.start_time, self.end_time)
        i = self._segment(t)
        aa_body = self._segment_log(i) / jnp.maximum(
            self.breaks[i + 1] - self.breaks[i], 1e-12
        )
        return rot.quat_rotate(self.quats[i], aa_body)


@pytree_dataclass
class PiecewisePose:
    """Piecewise SE(3) trajectory: cubic position + slerp orientation.

    Reference: common/trajectories/piecewise_pose.h
    (MakeCubicLinearWithEndLinearVelocity — cubic translation with zero end
    velocities + PiecewiseQuaternionSlerp orientation).
    """

    position: PiecewisePolynomial
    orientation: PiecewiseQuaternionSlerp

    @staticmethod
    def make(breaks, positions, quats):
        breaks = jnp.asarray(breaks)
        positions = jnp.asarray(positions)
        pos = PiecewisePolynomial.cubic_with_continuous_second_derivatives(
            breaks, positions
        )
        return PiecewisePose(
            position=pos,
            orientation=PiecewiseQuaternionSlerp.make(breaks, quats),
        )

    @property
    def start_time(self):
        return self.position.start_time

    @property
    def end_time(self):
        return self.position.end_time

    def value(self, t):
        """RigidTransform at scalar time t."""
        from drake_tpu.math import rotations as rot
        from drake_tpu.math.transforms import RigidTransform

        q = self.orientation.orientation(t)
        return RigidTransform(R=rot.quat_to_rotation(q),
                              p=self.position.value(t))

    def velocity(self, t):
        """Spatial velocity [w; v] in the world frame."""
        return jnp.concatenate([
            self.orientation.angular_velocity(t),
            self.position.derivative_value(t),
        ])
