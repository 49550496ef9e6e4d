"""iiwa driver stack tests (reference manipulation/kuka_iiwa/test/
iiwa_command_receiver_test.cc message round-trip pattern + a closed-loop
sim-driver tracking test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.io.pubsub import PubSub
from drake_tpu.manipulation.iiwa_driver import (
    IiwaCommand,
    IiwaCommandReceiver,
    IiwaCommandSender,
    IiwaStatus,
    IiwaStatusReceiver,
    IiwaStatusSender,
    SimIiwaDriver,
)
from drake_tpu.models import iiwa
from drake_tpu.multibody import dynamics as dyn

F64 = jnp.float64


class TestMessageRoundTrip:
    def test_command(self):
        node = PubSub("memq://t1")
        tx = IiwaCommandSender(node)
        rx = IiwaCommandReceiver(node, hold_position=np.zeros(7))
        # Before any message: the hold position.
        cmd = rx.latest(node)
        np.testing.assert_array_equal(cmd.joint_position, np.zeros(7))
        q = np.linspace(-1, 1, 7)
        tx.send(IiwaCommand(utime=123, joint_position=q))
        cmd = rx.latest(node)
        assert cmd.utime == 123
        np.testing.assert_allclose(cmd.joint_position, q)
        node.close()

    def test_status(self):
        node = PubSub("memq://t2")
        tx = IiwaStatusSender(node)
        rx = IiwaStatusReceiver(node)
        assert rx.latest(node) is None
        st = IiwaStatus(
            utime=7,
            joint_position_measured=np.arange(7.0),
            joint_velocity_estimated=np.ones(7),
            joint_position_commanded=np.arange(7.0) + 0.1,
            joint_torque_measured=np.full(7, 2.0),
            joint_torque_commanded=np.full(7, 2.0),
            joint_torque_external=np.zeros(7),
        )
        tx.send(st)
        got = rx.latest(node)
        assert got.utime == 7
        np.testing.assert_allclose(
            got.joint_position_commanded, np.arange(7.0) + 0.1
        )
        node.close()

    def test_latest_wins(self):
        node = PubSub("memq://t3")
        tx = IiwaCommandSender(node)
        rx = IiwaCommandReceiver(node, hold_position=np.zeros(7))
        for k in range(5):
            tx.send(IiwaCommand(utime=k, joint_position=np.full(7, float(k))))
        cmd = rx.latest(node)
        assert cmd.utime == 4
        np.testing.assert_allclose(cmd.joint_position, 4.0)
        node.close()


class TestSimDriver:
    def test_tracks_command_in_sim(self):
        """Closed loop: external controller commands a step; SimIiwaDriver's
        stiffness law drives the simulated arm there (the sim_iiwa_driver
        integration pattern)."""
        model, params = iiwa.make_model(F64)
        node = PubSub("memq://sim")
        q0 = np.asarray(iiwa.home_position(F64))
        driver = SimIiwaDriver(node, model, params, hold_position=q0)
        cmd_tx = IiwaCommandSender(node)
        status_rx = IiwaStatusReceiver(node)

        q_goal = q0 + np.asarray([0.2, -0.1, 0.1, 0.15, -0.2, 0.1, 0.3])
        cmd_tx.send(IiwaCommand(utime=0, joint_position=q_goal))

        nq, nv = model.num_positions, model.num_velocities
        q = jnp.asarray(q0, F64)
        v = jnp.zeros(nv, F64)
        h = 2e-3

        @jax.jit
        def substep(q, v, tau):
            vdot = dyn.forward_dynamics(model, params, q, v, tau)
            v2 = v + h * vdot
            return q + h * v2, v2

        for k in range(600):
            tau = driver.step(k * h, np.asarray(q), np.asarray(v))
            q, v = substep(q, v, jnp.asarray(tau, F64))
        np.testing.assert_allclose(np.asarray(q), q_goal, atol=5e-3)
        st = status_rx.latest(node)
        np.testing.assert_allclose(
            st.joint_position_measured, np.asarray(q)[:7], atol=1e-6
        )
        np.testing.assert_allclose(st.joint_position_commanded, q_goal)
        node.close()


class TestWsgDriver:
    """Schunk WSG stack (manipulation/schunk_wsg/ roles)."""

    def test_command_status_round_trip(self):
        from drake_tpu.io.pubsub import PubSub
        from drake_tpu.manipulation import wsg_driver as wsg

        node = PubSub("memq://wsgmsg")
        sender = wsg.WsgCommandSender(node)
        receiver = wsg.WsgCommandReceiver(node)
        sender.send(wsg.WsgCommand(utime=7, target_position_mm=50.0, force=30.0))
        cmd = receiver.latest(node)
        assert cmd.utime == 7
        assert cmd.target_position_mm == 50.0
        assert cmd.force == 30.0

        st_tx = wsg.WsgStatusSender(node)
        st_rx = wsg.WsgStatusReceiver(node)
        st_tx.send(wsg.WsgStatus(3, 42.0, -1.0, 12.5))
        st = st_rx.latest(node)
        assert st.actual_position_mm == 42.0 and st.actual_force == 12.5
        node.close()

    def test_trajectory_generator_rate_limits(self):
        from drake_tpu.manipulation import wsg_driver as wsg

        gen = wsg.WsgTrajectoryGenerator(initial_width=0.1, speed=0.4)
        w = gen.step(0.01, 0.0)  # command full close
        assert w == pytest.approx(0.1 - 0.004)  # moved at most speed*dt

    def test_sim_driver_closes_to_width(self):
        from drake_tpu.io.pubsub import PubSub
        from drake_tpu.manipulation import wsg_driver as wsg

        node = PubSub("memq://wsgsim")
        driver = wsg.SimWsgDriver(node, initial_width=0.10)
        sender = wsg.WsgCommandSender(node)
        status_rx = wsg.WsgStatusReceiver(node)
        sender.send(wsg.WsgCommand(utime=0, target_position_mm=20.0, force=40.0))
        dt = 1e-3
        for k in range(3000):
            driver.step(node, k * dt, dt)
        assert driver.width == pytest.approx(0.020, abs=2e-3)
        st = status_rx.latest(node)
        assert st is not None
        assert st.actual_position_mm == pytest.approx(20.0, abs=2.0)
        node.close()

    def test_force_limit_respected(self):
        from drake_tpu.manipulation import wsg_driver as wsg

        ctrl = wsg.WsgPositionController()  # kp=200: 0.1 m error -> 20 N
        f = ctrl.force(width=0.1, width_rate=0.0, target_width=0.0,
                       force_limit=5.0)
        assert f == -5.0  # clamped to the grip force limit


class TestJacoDriver:
    """kinova_jaco round-trip with the SDK<->URDF finger scaling
    (jaco_constants.h kFingerSdkToUrdf; jaco_command_receiver_test.cc
    pattern)."""

    def test_command_round_trip_and_latch(self):
        from drake_tpu.manipulation import jaco_driver as jd

        node = PubSub("memq://jaco1")
        tx = jd.JacoCommandSender(node)
        hold = np.linspace(0.1, 0.7, 7)
        rx = jd.JacoCommandReceiver(node, hold_position=hold)
        # Latch-before-first-message: hold position, zero fingers.
        cmd = rx.latest(node)
        np.testing.assert_array_equal(cmd.joint_position, hold)
        np.testing.assert_array_equal(cmd.finger_position, np.zeros(3))

        q = np.linspace(-1, 1, 7)
        fingers = np.asarray([0.3, 0.5, 0.7])
        tx.send(jd.JacoCommand(
            utime=77, joint_position=q, joint_velocity=np.zeros(7),
            finger_position=fingers, finger_velocity=np.zeros(3)))
        cmd = rx.latest(node)
        assert cmd.utime == 77
        np.testing.assert_allclose(cmd.joint_position, q)
        # Finger values survive the SDK wire scaling exactly.
        np.testing.assert_allclose(cmd.finger_position, fingers, rtol=1e-12)
        node.close()

    def test_status_round_trip(self):
        from drake_tpu.manipulation import jaco_driver as jd

        node = PubSub("memq://jaco2")
        tx = jd.JacoStatusSender(node)
        rx = jd.JacoStatusReceiver(node)
        assert rx.latest(node) is None
        st = jd.JacoStatus(
            utime=5, joint_position=np.arange(7.0),
            joint_velocity=0.1 * np.arange(7.0),
            joint_torque=np.ones(7), joint_torque_external=np.zeros(7),
            joint_current=np.full(7, 2.0),
            finger_position=np.asarray([0.1, 0.2, 0.3]),
            finger_velocity=np.asarray([0.0, 0.0, 0.1]),
        )
        tx.send(st)
        got = rx.latest(node)
        assert got.utime == 5
        np.testing.assert_allclose(got.joint_position, st.joint_position)
        np.testing.assert_allclose(got.finger_position, st.finger_position,
                                   rtol=1e-12)
        node.close()
