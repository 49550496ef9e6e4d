"""Typed message schema tests (io/messages.py — the lcmtypes role,
reference lcmtypes/*.lcm)."""

import dataclasses

import numpy as np
import pytest

from drake_tpu.io import messages as m
from drake_tpu.io.pubsub import PubSub


class TestCodec:
    def test_roundtrip_all_field_kinds(self):
        msg = m.lcmt_contact_results_for_viz(
            timestamp=123,
            point_pair_contact_info=[
                m.lcmt_point_pair_contact_info_for_viz(
                    timestamp=123, body1_name="boxA", body2_name="ground",
                    contact_point=np.array([0.1, 0.2, 0.3]),
                    contact_force=np.array([0.0, 0.0, 9.81]),
                    normal=np.array([0.0, 0.0, 1.0]),
                ),
                m.lcmt_point_pair_contact_info_for_viz(),
            ],
        )
        wire = msg.encode()
        back = m.lcmt_contact_results_for_viz.decode(wire)
        assert back.timestamp == 123
        assert len(back.point_pair_contact_info) == 2
        np.testing.assert_array_equal(
            back.point_pair_contact_info[0].contact_force, [0, 0, 9.81]
        )
        assert back.point_pair_contact_info[0].body2_name == "ground"

    def test_roundtrip_arrays_and_strings(self):
        msg = m.lcmt_robot_state(
            utime=7,
            joint_name=["j0", "j1", "j2"],
            joint_position=np.array([0.1, -0.2, 0.3]),
        )
        back = m.lcmt_robot_state.decode(msg.encode())
        assert back.joint_name == ["j0", "j1", "j2"]
        np.testing.assert_array_equal(back.joint_position, [0.1, -0.2, 0.3])

    def test_fingerprint_mismatch_fails_loudly(self):
        """Structural safety: decoding with the WRONG schema raises instead
        of mis-parsing (the lcm int64-hash role)."""
        cmd = m.lcmt_iiwa_command(utime=1, joint_position=np.zeros(7))
        with pytest.raises(ValueError, match="fingerprint mismatch"):
            m.lcmt_iiwa_status.decode(cmd.encode())

    def test_fingerprint_depends_on_structure(self):
        @m.message
        class A:
            x: float = 0.0

        @m.message
        class B:
            x: float = 0.0
            y: float = 0.0

        assert A.fingerprint() != B.fingerprint()

    def test_dtype_preserved(self):
        img = m.lcmt_image(
            width=4, height=2,
            data=np.arange(8, dtype=np.uint8),
        )
        back = m.lcmt_image.decode(img.encode())
        assert back.data.dtype == np.uint8
        np.testing.assert_array_equal(back.data, np.arange(8))

    def test_schema_set_matches_reference_names(self):
        """Field names mirror the reference's .lcm files."""
        f = {x.name for x in dataclasses.fields(m.lcmt_iiwa_status)}
        assert {
            "utime", "joint_position_measured", "joint_position_commanded",
            "joint_velocity_estimated", "joint_torque_measured",
            "joint_torque_commanded", "joint_torque_external",
        } <= f


class TestTypedChannels:
    def test_publish_subscribe_roundtrip(self):
        node = PubSub()
        pub = m.TypedPublisher(node, "IIWA_COMMAND", m.lcmt_iiwa_command)
        sub = m.TypedSubscriber(node, "IIWA_COMMAND", m.lcmt_iiwa_command)
        pub.publish(
            m.lcmt_iiwa_command(utime=5, joint_position=np.ones(7))
        )
        got = sub.poll()
        assert got.utime == 5
        np.testing.assert_array_equal(got.joint_position, np.ones(7))
        assert sub.count == 1

    def test_wrong_type_rejected_at_publish(self):
        node = PubSub()
        pub = m.TypedPublisher(node, "IIWA_COMMAND", m.lcmt_iiwa_command)
        with pytest.raises(TypeError):
            pub.publish(m.lcmt_iiwa_status())


import drake_tpu.io.messages as msgs


class TestRound4Schemas:
    """Viewer / plan / panda / allegro / scope schema round-trips
    (lcmtypes parity breadth: 24 of the reference's 50 schemas, all the
    actively-consumed ones)."""

    def test_viewer_draw_roundtrip(self):
        m = msgs.lcmt_viewer_draw(
            timestamp=5, link_name=["base", "tip"], robot_num=[0, 0],
            position=np.arange(6.0).reshape(2, 3),
            quaternion=np.tile([1.0, 0, 0, 0], (2, 1)),
        )
        m2 = msgs.decode(msgs.lcmt_viewer_draw, msgs.encode(m))
        assert m2.link_name == ["base", "tip"]
        np.testing.assert_allclose(m2.position, m.position)

    def test_viewer_load_robot_nested(self):
        geom = msgs.lcmt_viewer_geometry_data(
            type=msgs.lcmt_viewer_geometry_data.CYLINDER,
            float_data=np.asarray([0.1, 0.5]),
        )
        lr = msgs.lcmt_viewer_load_robot(
            link=[msgs.lcmt_viewer_link_data(name="l0", geom=[geom])]
        )
        lr2 = msgs.decode(msgs.lcmt_viewer_load_robot, msgs.encode(lr))
        assert lr2.link[0].geom[0].type == 3
        np.testing.assert_allclose(lr2.link[0].geom[0].float_data, [0.1, 0.5])

    def test_robot_plan_nested_states(self):
        plan = msgs.lcmt_robot_plan(
            utime=9,
            plan=[msgs.lcmt_robot_state(utime=t) for t in (0, 100, 200)],
        )
        p2 = msgs.decode(msgs.lcmt_robot_plan, msgs.encode(plan))
        assert [s.utime for s in p2.plan] == [0, 100, 200]

    def test_panda_and_allegro(self):
        st = msgs.lcmt_panda_status(
            utime=1, joint_position=np.ones(7), robot_mode=2,
            control_mode=msgs.lcmt_panda_command.CONTROL_MODE_TORQUE,
        )
        st2 = msgs.decode(msgs.lcmt_panda_status, msgs.encode(st))
        assert st2.control_mode == 4 and st2.joint_position.shape == (7,)
        al = msgs.lcmt_allegro_status(
            utime=2, joint_position_measured=np.zeros(16)
        )
        al2 = msgs.decode(msgs.lcmt_allegro_status, msgs.encode(al))
        assert al2.joint_position_measured.shape == (16,)

    def test_scope_and_force_torque(self):
        sc = msgs.decode(
            msgs.lcmt_scope,
            msgs.encode(msgs.lcmt_scope(utime=3, value=np.asarray([1.5]))),
        )
        assert float(sc.value[0]) == 1.5
        ft = msgs.decode(
            msgs.lcmt_force_torque,
            msgs.encode(msgs.lcmt_force_torque(fz=-9.81)),
        )
        assert ft.fz == -9.81
