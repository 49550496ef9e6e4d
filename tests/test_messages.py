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


class TestFullSchemaSet:
    """The reference ships 50 lcmtypes (48 lcmt_* + 5 experimental, minus
    the internal lcmt_test fixtures); every one has a typed mirror here."""

    def test_schema_count_parity(self):
        names = [
            n for n in dir(m)
            if n.startswith("lcmt_") or n.startswith("experimental_lcmt_")
        ]
        assert len(names) >= 50

    def test_hydroelastic_surface_roundtrip(self):
        surf = m.lcmt_hydroelastic_contact_surface_for_viz(
            geometry1_name="ball", body1_name="ball", model1_name="m1",
            body1_unique=True, collision_count1=1,
            geometry2_name="plate", body2_name="plate", model2_name="m2",
            body2_unique=True, collision_count2=1,
            centroid_W=np.array([0.0, 0.0, 0.01]),
            force_C_W=np.array([0.0, 0.0, 12.5]),
            moment_C_W=np.zeros(3),
            quadrature_point_data=[
                m.lcmt_hydroelastic_quadrature_per_point_data_for_viz(
                    p_WQ=np.array([0.0, 0.0, 0.01]),
                    vt_BqAq_W=np.array([0.1, 0.0, 0.0]),
                    traction_Aq_W=np.array([0.0, 0.0, 4.0]),
                )
            ],
            p_WV=[m.lcmt_point(0, 0, 0), m.lcmt_point(1, 0, 0),
                  m.lcmt_point(0, 1, 0)],
            pressure=np.array([1e4, 2e4, 3e4]),
            poly_data=np.array([3, 0, 1, 2], np.int32),
        )
        back = m.lcmt_hydroelastic_contact_surface_for_viz.decode(
            surf.encode()
        )
        assert back.p_WV[1].x == 1.0
        assert back.quadrature_point_data[0].traction_Aq_W[2] == 4.0
        np.testing.assert_array_equal(back.poly_data, [3, 0, 1, 2])

    def test_fork_deformable_mesh_messages(self):
        # The fork's MPM cloth viz wire format: topology once, then
        # per-frame vertex updates (experimental_lcmt_deformable_tri_*.lcm).
        init = m.experimental_lcmt_deformable_tri_meshes_init(
            meshes=[
                m.experimental_lcmt_deformable_tri_mesh_init(
                    name="cloth", num_vertices=4,
                    tris=[
                        m.experimental_lcmt_deformable_tri(
                            vertices=np.array([0, 1, 2], np.int32)),
                        m.experimental_lcmt_deformable_tri(
                            vertices=np.array([1, 3, 2], np.int32)),
                    ],
                )
            ]
        )
        got = m.experimental_lcmt_deformable_tri_meshes_init.decode(
            init.encode()
        )
        assert got.meshes[0].num_vertices == 4
        np.testing.assert_array_equal(got.meshes[0].tris[1].vertices,
                                      [1, 3, 2])

        upd = m.experimental_lcmt_deformable_tri_meshes_update(
            timestamp=33,
            meshes=[m.experimental_lcmt_deformable_tri_mesh_update(
                name="cloth", vertices_W=np.linspace(0, 1, 12).reshape(4, 3)
            )],
        )
        back = m.experimental_lcmt_deformable_tri_meshes_update.decode(
            upd.encode()
        )
        assert back.timestamp == 33
        assert back.meshes[0].vertices_W.shape == (4, 3)

    def test_planar_gripper_stack(self):
        cmd = m.lcmt_planar_gripper_command(
            utime=5,
            finger_command=[
                m.lcmt_planar_gripper_finger_command(
                    joint_position=np.array([0.1, -0.1]),
                    joint_velocity=np.zeros(2),
                    joint_torque=np.array([0.5, 0.25]),
                )
            ] * 3,
        )
        back = m.lcmt_planar_gripper_command.decode(cmd.encode())
        assert len(back.finger_command) == 3
        assert back.finger_command[2].joint_torque[1] == 0.25

        fa = m.lcmt_planar_gripper_finger_face_assignments(
            utime=5,
            finger_face_assignments=[
                m.lcmt_planar_gripper_finger_face_assignment(
                    utime=5, finger_name="finger1", brick_face_name="PosY",
                    p_BoBq_B=np.array([0.02, 0.0]), is_in_contact=True,
                )
            ],
        )
        back = m.lcmt_planar_gripper_finger_face_assignments.decode(
            fa.encode()
        )
        assert back.finger_face_assignments[0].is_in_contact is True
        assert back.finger_face_assignments[0].brick_face_name == "PosY"

    def test_small_schemas_roundtrip(self):
        for msg in [
            m.lcmt_acrobot_u(timestamp=1, tau=2.5),
            m.lcmt_acrobot_x(timestamp=1, theta1=0.1, theta2=0.2),
            m.lcmt_acrobot_y(timestamp=1, tau=0.3),
            m.lcmt_quaternion(w=0.5, x=0.5, y=0.5, z=0.5),
            m.lcmt_viewer_command(
                command_type=m.lcmt_viewer_command.LOAD_MODEL,
                command_data="{}"),
            m.lcmt_iiwa_status_telemetry(host_utime=9, iiwa_utime=8,
                                         estimated_dt_host_minus_iiwa=1),
            m.lcmt_planar_manipuland_status(
                utime=2, position=np.array([1.0, 2.0]), theta=0.5,
                velocity=np.zeros(2), thetadot=-0.1),
            m.lcmt_planar_plant_state(
                utime=3, plant_state=np.arange(6.0)),
            m.lcmt_point_cloud_field(
                name="rgb", byte_offset=12,
                datatype=m.lcmt_point_cloud_field.FLOAT32, count=1),
            m.lcmt_image_array(
                header=m.lcmt_header(utime=4, frame_name="cam0"),
                images=[m.lcmt_image(width=2, height=2,
                                     data=np.zeros(4, np.uint8))]),
        ]:
            cls = type(msg)
            back = cls.decode(msg.encode())
            assert dataclasses.asdict(back).keys() == (
                dataclasses.asdict(msg).keys()
            )

    def test_call_python_rpc(self):
        arr = np.arange(6, dtype=np.float64)
        msg = m.lcmt_call_python(
            function_name="plot", lhs=42,
            rhs=[m.lcmt_call_python_data(
                data_type=m.lcmt_call_python_data.DOUBLE,
                shape_type=m.lcmt_call_python_data.VECTOR,
                rows=6, cols=1, data=arr.view(np.uint8))],
        )
        back = m.lcmt_call_python.decode(msg.encode())
        assert back.function_name == "plot"
        np.testing.assert_array_equal(
            back.rhs[0].data.view(np.float64), arr
        )


class TestDeformableWirePublisher:
    """The fork's DrakeVisualizer MPM-mesh wire path: topology once, then
    per-frame vertex updates (viz/mpm_visualization.py)."""

    def test_init_then_updates(self):
        from drake_tpu.viz.mpm_visualization import (
            DeformableMeshWirePublisher,
        )

        node = PubSub("memq://")
        init_sub = m.TypedSubscriber(
            node, "DEFORMABLE_MESHES_INIT",
            m.experimental_lcmt_deformable_tri_meshes_init)
        upd_sub = m.TypedSubscriber(
            node, "DEFORMABLE_MESHES_UPDATE",
            m.experimental_lcmt_deformable_tri_meshes_update)

        faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
        pub = DeformableMeshWirePublisher(node, [("cloth", faces, 4)])
        init = init_sub.poll()
        assert init.meshes[0].name == "cloth"
        assert init.meshes[0].num_vertices == 4
        assert len(init.meshes[0].tris) == 2

        for k in range(3):
            pub.publish(k * 0.01, [np.full((4, 3), float(k))])
        got = upd_sub.poll()
        assert upd_sub.count == 3
        assert got.timestamp == 20000
        np.testing.assert_array_equal(got.meshes[0].vertices_W,
                                      np.full((4, 3), 2.0))
