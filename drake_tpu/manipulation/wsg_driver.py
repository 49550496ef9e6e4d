"""Schunk WSG gripper driver stack: command/status messaging + sim driver.

Re-derivation of the reference's schunk_wsg layer (manipulation/schunk_wsg/:
schunk_wsg_lcm.h SchunkWsgCommandSender/Receiver + SchunkWsgStatusSender/
Receiver over lcmt_schunk_wsg_command/status;
schunk_wsg_position_controller.h SchunkWsgPositionController — a PD
position servo with a force limit; schunk_wsg_trajectory_generator.h) on
the native pub/sub transport.

The WSG is modeled the reference's way: one actuated prismatic DOF per
finger, mirrored, commanded by target *opening width* (m) and a grip
force limit (N).  The position controller converts (width, force_limit)
to a clamped PD finger force; the trajectory generator ramps width
commands at the gripper's rated speed so step commands don't slam.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from drake_tpu.io.pubsub import ArrayPublisher, ArraySubscriber, PubSub

COMMAND_CHANNEL = "SCHUNK_WSG_COMMAND"
STATUS_CHANNEL = "SCHUNK_WSG_STATUS"

# WSG 050 rated limits (the reference's defaults in
# schunk_wsg_constants.h: 110 mm stroke, 80 N, ~0.42 m/s max speed).
MAX_WIDTH = 0.110
MAX_FORCE = 80.0
RATED_SPEED = 0.42


@dataclasses.dataclass
class WsgCommand:
    """lcmt_schunk_wsg_command field set."""

    utime: int
    target_position_mm: float  # commanded opening width, millimetres
    force: float  # grip force limit, N


@dataclasses.dataclass
class WsgStatus:
    """lcmt_schunk_wsg_status field set."""

    utime: int
    actual_position_mm: float
    actual_speed_mm_per_s: float
    actual_force: float


class WsgCommandSender:
    def __init__(self, node: PubSub, channel: str = COMMAND_CHANNEL):
        self._pub = ArrayPublisher(node, channel)

    def send(self, cmd: WsgCommand):
        self._pub.publish(
            utime=np.asarray([cmd.utime], np.int64),
            target_position_mm=np.asarray([cmd.target_position_mm]),
            force=np.asarray([cmd.force]),
        )


class WsgCommandReceiver:
    """Holds the last command; defaults to open at zero force."""

    def __init__(
        self,
        node: PubSub,
        initial_width: float = MAX_WIDTH,
        channel: str = COMMAND_CHANNEL,
    ):
        self._sub = ArraySubscriber(node, channel)
        self._last = WsgCommand(
            utime=0, target_position_mm=1e3 * initial_width, force=MAX_FORCE
        )

    def latest(self, node: PubSub) -> WsgCommand:
        msg = self._sub.poll()  # latest-wins (drains the queue internally)
        if msg is not None:
            self._last = WsgCommand(
                utime=int(msg["utime"][0]),
                target_position_mm=float(msg["target_position_mm"][0]),
                force=float(msg["force"][0]),
            )
        return self._last


class WsgStatusSender:
    def __init__(self, node: PubSub, channel: str = STATUS_CHANNEL):
        self._pub = ArrayPublisher(node, channel)

    def send(self, st: WsgStatus):
        self._pub.publish(
            utime=np.asarray([st.utime], np.int64),
            actual_position_mm=np.asarray([st.actual_position_mm]),
            actual_speed_mm_per_s=np.asarray([st.actual_speed_mm_per_s]),
            actual_force=np.asarray([st.actual_force]),
        )


class WsgStatusReceiver:
    def __init__(self, node: PubSub, channel: str = STATUS_CHANNEL):
        self._sub = ArraySubscriber(node, channel)
        self._last: Optional[WsgStatus] = None

    def latest(self, node: PubSub) -> Optional[WsgStatus]:
        msg = self._sub.poll()  # latest-wins (drains the queue internally)
        if msg is not None:
            self._last = WsgStatus(
                utime=int(msg["utime"][0]),
                actual_position_mm=float(msg["actual_position_mm"][0]),
                actual_speed_mm_per_s=float(msg["actual_speed_mm_per_s"][0]),
                actual_force=float(msg["actual_force"][0]),
            )
        return self._last


class WsgPositionController:
    """PD width servo with a force limit
    (SchunkWsgPositionController role, schunk_wsg_position_controller.h).

    State is the measured opening width w and its rate wdot; the output is
    the net finger force, clamped to +-force_limit.  Gains default to the
    reference's (kp_command=200, kd=5)."""

    def __init__(self, kp: float = 200.0, kd: float = 5.0):
        self.kp = kp
        self.kd = kd

    def force(self, width, width_rate, target_width, force_limit) -> float:
        f = self.kp * (target_width - width) - self.kd * width_rate
        lim = abs(force_limit)
        return float(np.clip(f, -lim, lim))


class WsgTrajectoryGenerator:
    """Rate-limits width commands to the gripper's rated speed
    (SchunkWsgTrajectoryGenerator role)."""

    def __init__(self, initial_width: float = MAX_WIDTH,
                 speed: float = RATED_SPEED):
        self._setpoint = initial_width
        self._speed = speed

    def step(self, dt: float, target_width: float) -> float:
        max_move = self._speed * dt
        delta = np.clip(target_width - self._setpoint, -max_move, max_move)
        self._setpoint = float(
            np.clip(self._setpoint + delta, 0.0, MAX_WIDTH)
        )
        return self._setpoint


class SimWsgDriver:
    """Closed-loop sim driver: consume commands, servo a 1-DOF width model,
    publish status (the sim side of the reference's WSG stack).

    The width dynamics are a damped unit mass driven by the controller
    force — enough to exercise the message plumbing and grasp logic
    end-to-end without a full plant."""

    def __init__(self, node: PubSub, initial_width: float = MAX_WIDTH,
                 mass: float = 0.2, damping: float = 4.0):
        self._receiver = WsgCommandReceiver(node, initial_width)
        self._status = WsgStatusSender(node)
        self._controller = WsgPositionController()
        self._traj = WsgTrajectoryGenerator(initial_width)
        self._w = initial_width
        self._wdot = 0.0
        self._mass = mass
        self._damping = damping

    @property
    def width(self) -> float:
        return self._w

    def step(self, node: PubSub, t: float, dt: float,
             external_force: float = 0.0) -> float:
        cmd = self._receiver.latest(node)
        target = self._traj.step(dt, 1e-3 * cmd.target_position_mm)
        f = self._controller.force(self._w, self._wdot, target, cmd.force)
        wddot = (f + external_force - self._damping * self._wdot) / self._mass
        self._wdot += dt * wddot
        self._w = float(np.clip(self._w + dt * self._wdot, 0.0, MAX_WIDTH))
        self._status.send(
            WsgStatus(
                utime=int(1e6 * t),
                actual_position_mm=1e3 * self._w,
                actual_speed_mm_per_s=1e3 * self._wdot,
                actual_force=f,
            )
        )
        return f
