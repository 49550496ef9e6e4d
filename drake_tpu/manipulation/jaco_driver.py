"""Kinova Jaco driver stack: command/status messaging over pub/sub.

Re-derivation of the reference's kinova_jaco layer (manipulation/
kinova_jaco/: jaco_command_sender/receiver.h, jaco_status_sender/
receiver.h over lcmt_jaco_command/status; jaco_constants.h) on the native
transport, matching its semantics:

  - 7-dof arm + 3 adaptive fingers by default; other configurations via
    constructor arguments (jaco_constants.h:10-11).
  - Finger positions cross the wire in Kinova SDK units (motor turns); the
    URDF revolute-joint convention differs, so senders/receivers scale by
    kFingerSdkToUrdf = 1.34/118.68 exactly as the reference does
    (jaco_constants.h:14-18).
  - The command receiver latches the most recent message and holds the
    measured position until the first command arrives
    (jaco_command_receiver.h LatchInitialPosition semantics).
  - Status ticks at the Kinova-rated 100 Hz (kJacoLcmStatusPeriod = 0.01).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from drake_tpu.io.pubsub import ArrayPublisher, ArraySubscriber, PubSub

COMMAND_CHANNEL = "KINOVA_JACO_COMMAND"
STATUS_CHANNEL = "KINOVA_JACO_STATUS"

NUM_ARM_JOINTS = 7
NUM_FINGERS = 3
FINGER_SDK_TO_URDF = 1.34 / 118.68
FINGER_URDF_TO_SDK = 1.0 / FINGER_SDK_TO_URDF
STATUS_PERIOD = 0.010  # 100 Hz joint-velocity update rate (Kinova spec)


@dataclasses.dataclass
class JacoCommand:
    """lcmt_jaco_command field set (URDF units in this API; SDK on wire)."""

    utime: int
    joint_position: np.ndarray  # (num_joints,)
    joint_velocity: np.ndarray  # (num_joints,)
    finger_position: np.ndarray  # (num_fingers,) URDF radians
    finger_velocity: np.ndarray  # (num_fingers,)


@dataclasses.dataclass
class JacoStatus:
    """lcmt_jaco_status field set (URDF units in this API)."""

    utime: int
    joint_position: np.ndarray
    joint_velocity: np.ndarray
    joint_torque: np.ndarray
    joint_torque_external: np.ndarray
    joint_current: np.ndarray
    finger_position: np.ndarray
    finger_velocity: np.ndarray


class JacoCommandSender:
    def __init__(self, node: PubSub, channel: str = COMMAND_CHANNEL):
        self._pub = ArrayPublisher(node, channel)

    def send(self, cmd: JacoCommand):
        self._pub.publish(
            utime=np.asarray([cmd.utime], np.int64),
            joint_position=np.asarray(cmd.joint_position, np.float64),
            joint_velocity=np.asarray(cmd.joint_velocity, np.float64),
            # SDK units on the wire (jaco_command_sender.cc scales the same
            # way).
            finger_position=np.asarray(cmd.finger_position, np.float64)
            * FINGER_URDF_TO_SDK,
            finger_velocity=np.asarray(cmd.finger_velocity, np.float64)
            * FINGER_URDF_TO_SDK,
        )


class JacoCommandReceiver:
    """Latches the newest command; holds `hold_position` (arm ⊕ fingers,
    URDF units) until the first message (jaco_command_receiver.h)."""

    def __init__(self, node: PubSub, hold_position, hold_fingers=None,
                 channel: str = COMMAND_CHANNEL):
        self._sub = ArraySubscriber(node, channel)
        arm = np.asarray(hold_position, np.float64)
        fingers = (
            np.zeros(NUM_FINGERS)
            if hold_fingers is None
            else np.asarray(hold_fingers, np.float64)
        )
        self._latest = JacoCommand(
            utime=0,
            joint_position=arm,
            joint_velocity=np.zeros_like(arm),
            finger_position=fingers,
            finger_velocity=np.zeros_like(fingers),
        )

    def latest(self, node: PubSub) -> JacoCommand:
        msg = self._sub.poll()
        if msg is not None:
            self._latest = JacoCommand(
                utime=int(msg["utime"][0]),
                joint_position=msg["joint_position"],
                joint_velocity=msg["joint_velocity"],
                finger_position=msg["finger_position"] * FINGER_SDK_TO_URDF,
                finger_velocity=msg["finger_velocity"] * FINGER_SDK_TO_URDF,
            )
        return self._latest


class JacoStatusSender:
    def __init__(self, node: PubSub, channel: str = STATUS_CHANNEL):
        self._pub = ArrayPublisher(node, channel)

    def send(self, st: JacoStatus):
        self._pub.publish(
            utime=np.asarray([st.utime], np.int64),
            joint_position=np.asarray(st.joint_position, np.float64),
            joint_velocity=np.asarray(st.joint_velocity, np.float64),
            joint_torque=np.asarray(st.joint_torque, np.float64),
            joint_torque_external=np.asarray(
                st.joint_torque_external, np.float64
            ),
            joint_current=np.asarray(st.joint_current, np.float64),
            finger_position=np.asarray(st.finger_position, np.float64)
            * FINGER_URDF_TO_SDK,
            finger_velocity=np.asarray(st.finger_velocity, np.float64)
            * FINGER_URDF_TO_SDK,
        )


class JacoStatusReceiver:
    def __init__(self, node: PubSub, channel: str = STATUS_CHANNEL):
        self._sub = ArraySubscriber(node, channel)
        self._latest: Optional[JacoStatus] = None

    def latest(self, node: PubSub) -> Optional[JacoStatus]:
        msg = self._sub.poll()
        if msg is not None:
            self._latest = JacoStatus(
                utime=int(msg["utime"][0]),
                joint_position=msg["joint_position"],
                joint_velocity=msg["joint_velocity"],
                joint_torque=msg["joint_torque"],
                joint_torque_external=msg["joint_torque_external"],
                joint_current=msg["joint_current"],
                finger_position=msg["finger_position"] * FINGER_SDK_TO_URDF,
                finger_velocity=msg["finger_velocity"] * FINGER_SDK_TO_URDF,
            )
        return self._latest
