"""Robot plan interpolation — the RobotPlanInterpolator role.

Reference: manipulation/util/robot_plan_interpolator.h — a system that
consumes ``lcmt_robot_plan`` messages (timed joint-state knots, the wire
format a planner publishes) and outputs the interpolated desired state
(q, v) and acceleration for the robot driver.  Here the plan becomes a
``PiecewisePolynomial`` (ZOH / FOH / cubic, per ``InterpolatorType``) and
the query is a pure function of time — jit/vmap-able, so a driver stack
can sample it inside a scan-compiled control loop.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from drake_tpu.io.messages import lcmt_robot_plan, lcmt_robot_state
from drake_tpu.math.trajectories import PiecewisePolynomial


class InterpolatorType(enum.Enum):
    """robot_plan_interpolator.h:17 InterpolatorType (Pchip maps to the
    C2 cubic — same role: smooth accelerations, no overshoot tuning)."""

    ZeroOrderHold = 0
    FirstOrderHold = 1
    Pchip = 2
    Cubic = 3


class RobotPlanInterpolator:
    """Builds and samples a desired-state trajectory from a robot plan.

    Unlike the reference LeafSystem (event-driven plan switching inside a
    Context), this is a plain object: feed it plans with ``set_plan`` /
    ``handle_message`` as they arrive on the wire, sample with
    ``state(t)`` / ``acceleration(t)``.  An empty plan (no knots) holds
    the last commanded position — the reference's hold behavior.
    """

    def __init__(
        self,
        num_joints: int,
        interp: InterpolatorType = InterpolatorType.Cubic,
    ):
        self.num_joints = int(num_joints)
        self.interp = interp
        self._traj: Optional[PiecewisePolynomial] = None
        self._hold_q = np.zeros(self.num_joints)

    # -- plan ingestion ---------------------------------------------------

    def set_plan(self, times, positions, start_time: float = 0.0) -> None:
        """Install a plan from knot arrays: times (n,) seconds relative to
        ``start_time``; positions (n, num_joints)."""
        times = np.asarray(times, float) + start_time
        qs = np.asarray(positions, float)
        if qs.ndim != 2 or qs.shape[1] != self.num_joints:
            raise ValueError(f"positions must be (n, {self.num_joints})")
        if times.shape[0] == 0:
            self._traj = None
            return
        if times.shape[0] == 1:
            self._hold_q = qs[0]
            self._traj = None
            return
        samples = qs  # (n_knots, num_joints) — the trajectories convention
        if self.interp == InterpolatorType.ZeroOrderHold:
            self._traj = PiecewisePolynomial.zero_order_hold(times, samples)
        elif self.interp == InterpolatorType.FirstOrderHold:
            self._traj = PiecewisePolynomial.first_order_hold(times, samples)
        else:  # Pchip / Cubic: C2 cubic with natural end conditions
            self._traj = (
                PiecewisePolynomial.cubic_with_continuous_second_derivatives(
                    jnp.asarray(times), jnp.asarray(samples)
                )
            )
        self._hold_q = qs[-1]

    def handle_message(
        self, msg: lcmt_robot_plan, start_time: float = 0.0
    ) -> None:
        """Ingest an lcmt_robot_plan wire message (knot utimes are in
        microseconds, per the schema)."""
        if not msg.plan:
            self._traj = None  # hold at _hold_q
            return
        times = np.asarray([s.utime for s in msg.plan], float) * 1e-6
        qs = np.stack(
            [np.asarray(s.joint_position, float) for s in msg.plan]
        )
        self.set_plan(times, qs, start_time)

    # -- sampling ---------------------------------------------------------

    def state(self, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(q_desired, v_desired) at time t.  Outside the plan span the
        desired state HOLDS (endpoint position, ZERO velocity) — clamping
        t alone would keep commanding the end segment's velocity and park
        the driver at a kd*v/kp offset from the final knot."""
        if self._traj is None:
            q = jnp.asarray(self._hold_q)
            return q, jnp.zeros_like(q)
        t0, t1 = self._traj.start_time, self._traj.end_time
        tc = jnp.clip(t, t0, t1)
        inside = jnp.logical_and(t >= t0, t <= t1)
        v = jnp.where(inside, self._traj.derivative_value(tc, 1), 0.0)
        return self._traj.value(tc), v

    def acceleration(self, t) -> jnp.ndarray:
        """Desired acceleration at time t (zero while holding or outside
        the plan span)."""
        if self._traj is None:
            return jnp.zeros(self.num_joints)
        t0, t1 = self._traj.start_time, self._traj.end_time
        tc = jnp.clip(t, t0, t1)
        inside = jnp.logical_and(t >= t0, t <= t1)
        return jnp.where(inside, self._traj.derivative_value(tc, 2), 0.0)

    @property
    def end_time(self) -> float:
        return 0.0 if self._traj is None else float(self._traj.end_time)


def encode_plan(times, positions, joint_names=None) -> lcmt_robot_plan:
    """Knot arrays -> lcmt_robot_plan (the planner-side encoder)."""
    times = np.asarray(times, float)
    qs = np.asarray(positions, float)
    names = list(joint_names or [f"joint{i}" for i in range(qs.shape[1])])
    states = [
        lcmt_robot_state(
            utime=int(round(t * 1e6)),
            joint_name=names,
            joint_position=qs[k],
        )
        for k, t in enumerate(times)
    ]
    return lcmt_robot_plan(utime=0, plan=states)
