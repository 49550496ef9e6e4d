"""iiwa driver stack: command/status messaging + simulated driver.

Re-derivation of the reference's kuka_iiwa driver layer
(manipulation/kuka_iiwa/: iiwa_command_sender.h / iiwa_command_receiver.h
/ iiwa_status_sender.h / iiwa_status_receiver.h and SimIiwaDriver
sim_iiwa_driver.h) on the native pub/sub transport (io/pubsub.py over
io/native/pubsub.cpp, the LCM role):

  - IiwaCommand / IiwaStatus dataclasses mirror the lcmt_iiwa_command /
    lcmt_iiwa_status field sets (positions + feedforward torque;
    measured/commanded/external torques in status);
  - senders/receivers serialize them as typed arrays on channels
    "IIWA_COMMAND"/"IIWA_STATUS" — same channel names as the reference;
  - SimIiwaDriver closes the loop in simulation: it consumes commands,
    runs the plant's joint-stiffness control law, and publishes status
    (the sim side of the reference's hardware interface).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from drake_tpu.io.pubsub import ArrayPublisher, ArraySubscriber, PubSub

COMMAND_CHANNEL = "IIWA_COMMAND"
STATUS_CHANNEL = "IIWA_STATUS"
NUM_JOINTS = 7


@dataclasses.dataclass
class IiwaCommand:
    """lcmt_iiwa_command field set."""

    utime: int
    joint_position: np.ndarray  # (7,)
    joint_torque: Optional[np.ndarray] = None  # (7,) feedforward


@dataclasses.dataclass
class IiwaStatus:
    """lcmt_iiwa_status field set."""

    utime: int
    joint_position_measured: np.ndarray
    joint_velocity_estimated: np.ndarray
    joint_position_commanded: np.ndarray
    joint_torque_measured: np.ndarray
    joint_torque_commanded: np.ndarray
    joint_torque_external: np.ndarray


class IiwaCommandSender:
    def __init__(self, node: PubSub, channel: str = COMMAND_CHANNEL):
        self._pub = ArrayPublisher(node, channel)

    def send(self, cmd: IiwaCommand):
        torque = (
            cmd.joint_torque
            if cmd.joint_torque is not None
            else np.zeros(NUM_JOINTS)
        )
        self._pub.publish(
            utime=np.asarray([cmd.utime], np.int64),
            joint_position=np.asarray(cmd.joint_position, np.float64),
            joint_torque=np.asarray(torque, np.float64),
        )


class IiwaCommandReceiver:
    """Latches the most recent command; returns a default hold position
    until the first command arrives (iiwa_command_receiver.h semantics)."""

    def __init__(self, node: PubSub, hold_position,
                 channel: str = COMMAND_CHANNEL):
        self._sub = ArraySubscriber(node, channel)
        self._latest = IiwaCommand(
            utime=0, joint_position=np.asarray(hold_position, np.float64)
        )

    def latest(self, node: PubSub) -> IiwaCommand:
        msg = self._sub.poll()  # drains the queue; latches the newest
        if msg is not None:
            self._latest = IiwaCommand(
                utime=int(msg["utime"][0]),
                joint_position=msg["joint_position"],
                joint_torque=msg["joint_torque"],
            )
        return self._latest


class IiwaStatusSender:
    def __init__(self, node: PubSub, channel: str = STATUS_CHANNEL):
        self._pub = ArrayPublisher(node, channel)

    def send(self, st: IiwaStatus):
        self._pub.publish(
            utime=np.asarray([st.utime], np.int64),
            joint_position_measured=np.asarray(
                st.joint_position_measured, np.float64
            ),
            joint_velocity_estimated=np.asarray(
                st.joint_velocity_estimated, np.float64
            ),
            joint_position_commanded=np.asarray(
                st.joint_position_commanded, np.float64
            ),
            joint_torque_measured=np.asarray(
                st.joint_torque_measured, np.float64
            ),
            joint_torque_commanded=np.asarray(
                st.joint_torque_commanded, np.float64
            ),
            joint_torque_external=np.asarray(
                st.joint_torque_external, np.float64
            ),
        )


class IiwaStatusReceiver:
    def __init__(self, node: PubSub, channel: str = STATUS_CHANNEL):
        self._sub = ArraySubscriber(node, channel)
        self._latest: Optional[IiwaStatus] = None

    def latest(self, node: PubSub) -> Optional[IiwaStatus]:
        msg = self._sub.poll()  # drains the queue; latches the newest
        if msg is not None:
            self._latest = IiwaStatus(
                utime=int(msg["utime"][0]),
                joint_position_measured=msg["joint_position_measured"],
                joint_velocity_estimated=msg["joint_velocity_estimated"],
                joint_position_commanded=msg["joint_position_commanded"],
                joint_torque_measured=msg["joint_torque_measured"],
                joint_torque_commanded=msg["joint_torque_commanded"],
                joint_torque_external=msg["joint_torque_external"],
            )
        return self._latest


class SimIiwaDriver:
    """Simulated driver (sim_iiwa_driver.h role): computed-torque
    (inverse-dynamics) control toward the commanded position + feedforward
    torque, status publishing — the reference's internal
    InverseDynamicsController (build_iiwa_control.h) pattern, which keeps
    uniform closed-loop dynamics despite the iiwa's tiny wrist inertias.

    ``kp``/``kd`` are DESIRED-ACCELERATION gains (1/s^2, 1/s): the applied
    torque is tau = M(q) (kp (qd - q) - kd v) + C(q, v).

    Drive it from a sim loop:
        tau = driver.step(t, q, v)       # reads commands, publishes status
    """

    def __init__(
        self,
        node: PubSub,
        model,
        params,
        hold_position,
        kp: float = 100.0,
        kd: Optional[float] = None,
    ):
        self.node = node
        self.model = model
        self.params = params
        self.cmd_rx = IiwaCommandReceiver(node, hold_position)
        self.status_tx = IiwaStatusSender(node)

        import jax
        import jax.numpy as jnp

        from drake_tpu.multibody import dynamics as dyn

        nq = model.num_positions
        nv = model.num_velocities
        kd = 2.0 * np.sqrt(kp) if kd is None else kd

        @jax.jit
        def _computed_torque(q7, v7, qd7):
            qfull = jnp.zeros(nq, q7.dtype).at[:NUM_JOINTS].set(q7)
            vfull = jnp.zeros(nv, q7.dtype).at[:NUM_JOINTS].set(v7)
            a_des = kp * (qd7 - q7) - kd * v7
            afull = jnp.zeros(nv, q7.dtype).at[:NUM_JOINTS].set(a_des)
            return dyn.inverse_dynamics(
                model, params, qfull, vfull, afull
            )[:NUM_JOINTS]

        self._computed_torque = _computed_torque

    def step(self, t: float, q, v, tau_external=None) -> np.ndarray:
        import jax.numpy as jnp

        cmd = self.cmd_rx.latest(self.node)
        q = np.asarray(q)[:NUM_JOINTS]
        v = np.asarray(v)[:NUM_JOINTS]
        ff = (
            np.asarray(cmd.joint_torque)
            if cmd.joint_torque is not None
            else np.zeros(NUM_JOINTS)
        )
        tau = (
            np.asarray(
                self._computed_torque(
                    jnp.asarray(q), jnp.asarray(v),
                    jnp.asarray(cmd.joint_position, q.dtype),
                )
            )
            + ff
        )
        self.status_tx.send(
            IiwaStatus(
                utime=int(t * 1e6),
                joint_position_measured=q,
                joint_velocity_estimated=v,
                joint_position_commanded=np.asarray(cmd.joint_position),
                joint_torque_measured=tau,
                joint_torque_commanded=tau,
                joint_torque_external=(
                    np.zeros(NUM_JOINTS)
                    if tau_external is None
                    else np.asarray(tau_external)
                ),
            )
        )
        return tau
