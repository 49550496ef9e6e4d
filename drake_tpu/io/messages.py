"""Typed message schemas — the lcmtypes role.

The reference ships ~50 ``.lcm`` schema files compiled to typed structs
(reference: lcmtypes/*.lcm, e.g. lcmt_iiwa_command.lcm,
lcmt_iiwa_status.lcm, lcmt_robot_state.lcm); channels carry messages whose
STRUCTURE is checked at both ends by a schema fingerprint.  This module is
the TPU framework's equivalent: plain dataclasses declared with
``@message`` get

  * a canonical binary wire format (little-endian scalars, length-prefixed
    strings/arrays, nested messages),
  * an 8-byte schema FINGERPRINT (hash of the field names/types in order,
    the lcm int64 hash role) prepended to every encoded message and
    verified on decode — structural mismatches fail loudly instead of
    mis-parsing,
  * Typed{Publisher,Subscriber} over the native pub/sub transport
    (io/pubsub.py), the LcmPublisherSystem / LcmSubscriberSystem pairing.

A starter schema set mirrors the reference's most-used lcmtypes field for
field (iiwa/WSG/Jaco command+status, robot state, contact results, image,
point cloud, drake_signal, header) so a reference user finds the same
message surface.
"""

from __future__ import annotations

import dataclasses
import hashlib
import io as _io
import struct
from typing import Any, Dict, List, Optional, Type, get_args, get_origin

import numpy as np

_SCALARS = {
    float: ("d", 8),
    int: ("q", 8),
    bool: ("?", 1),
}


def _type_tag(tp) -> str:
    if tp in _SCALARS:
        return tp.__name__
    if tp is str:
        return "str"
    if tp is np.ndarray:
        return "ndarray"
    if get_origin(tp) is list:
        return f"list[{_type_tag(get_args(tp)[0])}]"
    if dataclasses.is_dataclass(tp):
        return f"msg:{tp.__name__}:{schema_fingerprint(tp).hex()}"
    raise TypeError(f"unsupported message field type: {tp!r}")


def schema_fingerprint(cls) -> bytes:
    """8-byte structural hash of the schema (field names + types, ordered)."""
    desc = ";".join(
        f"{f.name}:{_type_tag(f.type if not isinstance(f.type, str) else _resolve(cls, f.name))}"
        for f in dataclasses.fields(cls)
    )
    return hashlib.sha256(
        (cls.__name__ + "|" + desc).encode()
    ).digest()[:8]


def _resolve(cls, name):
    import typing

    hints = typing.get_type_hints(cls)
    return hints[name]


def _field_types(cls):
    import typing

    hints = typing.get_type_hints(cls)
    return [(f.name, hints[f.name]) for f in dataclasses.fields(cls)]


def _encode_value(buf, tp, val):
    if tp in _SCALARS:
        fmt, _ = _SCALARS[tp]
        buf.write(struct.pack("<" + fmt, tp(val)))
    elif tp is str:
        raw = val.encode()
        buf.write(struct.pack("<I", len(raw)))
        buf.write(raw)
    elif tp is np.ndarray:
        a = np.asarray(val)
        dt = a.dtype.str.encode()  # e.g. b'<f8'
        buf.write(struct.pack("<B", a.ndim))
        for d in a.shape:
            buf.write(struct.pack("<I", d))
        buf.write(struct.pack("<B", len(dt)))
        buf.write(dt)
        buf.write(np.ascontiguousarray(a).tobytes())
    elif get_origin(tp) is list:
        (sub,) = get_args(tp)
        buf.write(struct.pack("<I", len(val)))
        for item in val:
            _encode_value(buf, sub, item)
    elif dataclasses.is_dataclass(tp):
        for name, ftp in _field_types(tp):
            _encode_value(buf, ftp, getattr(val, name))
    else:  # pragma: no cover
        raise TypeError(f"unsupported message field type: {tp!r}")


def _decode_value(buf, tp):
    if tp in _SCALARS:
        fmt, size = _SCALARS[tp]
        return tp(struct.unpack("<" + fmt, buf.read(size))[0])
    if tp is str:
        (n,) = struct.unpack("<I", buf.read(4))
        return buf.read(n).decode()
    if tp is np.ndarray:
        (ndim,) = struct.unpack("<B", buf.read(1))
        shape = tuple(
            struct.unpack("<I", buf.read(4))[0] for _ in range(ndim)
        )
        (dlen,) = struct.unpack("<B", buf.read(1))
        dt = np.dtype(buf.read(dlen).decode())
        count = int(np.prod(shape)) if shape else 1
        data = buf.read(count * dt.itemsize)
        return np.frombuffer(data, dt).reshape(shape).copy()
    if get_origin(tp) is list:
        (sub,) = get_args(tp)
        (n,) = struct.unpack("<I", buf.read(4))
        return [_decode_value(buf, sub) for _ in range(n)]
    if dataclasses.is_dataclass(tp):
        vals = {
            name: _decode_value(buf, ftp) for name, ftp in _field_types(tp)
        }
        return tp(**vals)
    raise TypeError(f"unsupported message field type: {tp!r}")  # pragma: no cover


def encode(msg) -> bytes:
    """Fingerprint-prefixed canonical encoding of a @message instance."""
    cls = type(msg)
    buf = _io.BytesIO()
    buf.write(schema_fingerprint(cls))
    for name, ftp in _field_types(cls):
        _encode_value(buf, ftp, getattr(msg, name))
    return buf.getvalue()


def decode(cls, data: bytes):
    """Decode bytes as ``cls``; raises ValueError on schema mismatch."""
    buf = _io.BytesIO(data)
    fp = buf.read(8)
    want = schema_fingerprint(cls)
    if fp != want:
        raise ValueError(
            f"schema fingerprint mismatch for {cls.__name__}: "
            f"wire={fp.hex()} expected={want.hex()} — the sender used a "
            "different message structure"
        )
    vals = {name: _decode_value(buf, ftp) for name, ftp in _field_types(cls)}
    return cls(**vals)


def message(cls):
    """Decorator: dataclass + wire codec (the lcm-gen role)."""
    cls = dataclasses.dataclass(cls)
    cls.encode = encode
    cls.decode = classmethod(lambda c, data: decode(c, data))
    cls.fingerprint = classmethod(lambda c: schema_fingerprint(c))
    return cls


# ---------------------------------------------------------------------------
# Typed channels over the native pub/sub transport.
# ---------------------------------------------------------------------------


class TypedPublisher:
    """LcmPublisherSystem role: publish @message instances on a channel."""

    def __init__(self, node, channel: str, cls):
        self.node = node
        self.channel = channel
        self.cls = cls

    def publish(self, msg):
        if not isinstance(msg, self.cls):
            raise TypeError(
                f"channel {self.channel!r} carries {self.cls.__name__}, "
                f"got {type(msg).__name__}"
            )
        self.node.publish(self.channel, encode(msg))


class TypedSubscriber:
    """LcmSubscriberSystem role: holds the latest decoded message."""

    def __init__(self, node, channel: str, cls):
        self.node = node
        self.channel = channel
        self.cls = cls
        self.sub_id = node.subscribe(channel)
        self.latest = None
        self.count = 0

    def poll(self):
        self.node.handle(0)
        while True:
            msg = self.node.receive(self.sub_id)
            if msg is None:
                break
            self.latest = decode(self.cls, msg[1])
            self.count += 1
        return self.latest


# ---------------------------------------------------------------------------
# The reference's core schema set (field-for-field with lcmtypes/*.lcm).
# ---------------------------------------------------------------------------


@message
class lcmt_header:
    """lcmtypes/lcmt_header.lcm"""

    utime: int = 0
    frame_name: str = ""
    seq: int = 0


@message
class lcmt_iiwa_command:
    """lcmtypes/lcmt_iiwa_command.lcm"""

    utime: int = 0
    joint_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )


@message
class lcmt_iiwa_status:
    """lcmtypes/lcmt_iiwa_status.lcm"""

    utime: int = 0
    joint_position_measured: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_position_commanded: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_position_ipo: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_velocity_estimated: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque_measured: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque_commanded: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque_external: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )


@message
class lcmt_schunk_wsg_command:
    """lcmtypes/lcmt_schunk_wsg_command.lcm"""

    utime: int = 0
    target_position_mm: float = 0.0
    force: float = 0.0


@message
class lcmt_schunk_wsg_status:
    """lcmtypes/lcmt_schunk_wsg_status.lcm"""

    utime: int = 0
    actual_position_mm: float = 0.0
    actual_speed_mm_per_s: float = 0.0
    actual_force: float = 0.0


@message
class lcmt_jaco_command:
    """lcmtypes/lcmt_jaco_command.lcm"""

    utime: int = 0
    joint_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    finger_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    finger_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )


@message
class lcmt_jaco_status:
    """lcmtypes/lcmt_jaco_status.lcm"""

    utime: int = 0
    joint_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque_external: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_current: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    finger_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    finger_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    finger_torque: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    finger_current: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )


@message
class lcmt_robot_state:
    """lcmtypes/lcmt_robot_state.lcm"""

    utime: int = 0
    joint_name: List[str] = dataclasses.field(default_factory=list)
    joint_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )


@message
class lcmt_point_pair_contact_info_for_viz:
    """lcmtypes/lcmt_point_pair_contact_info_for_viz.lcm"""

    timestamp: int = 0
    body1_name: str = ""
    body2_name: str = ""
    contact_point: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    contact_force: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    normal: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )


@message
class lcmt_contact_results_for_viz:
    """lcmtypes/lcmt_contact_results_for_viz.lcm — point pairs + hydro
    surfaces (the hydroelastic class is defined later in this module; the
    annotation resolves lazily at encode time)."""

    timestamp: int = 0
    point_pair_contact_info: List[lcmt_point_pair_contact_info_for_viz] = (
        dataclasses.field(default_factory=list)
    )
    hydroelastic_contacts: List[
        "lcmt_hydroelastic_contact_surface_for_viz"
    ] = dataclasses.field(default_factory=list)


@message
class lcmt_image:
    """lcmtypes/lcmt_image.lcm (subset: one frame + raw data)."""

    header: lcmt_header = dataclasses.field(default_factory=lcmt_header)
    width: int = 0
    height: int = 0
    pixel_format: int = 0
    channel_type: int = 0
    data: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.uint8)
    )


@message
class lcmt_point_cloud:
    """lcmtypes/lcmt_point_cloud.lcm (xyz subset)."""

    utime: int = 0
    frame_name: str = ""
    points: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3))
    )


@message
class lcmt_drake_signal:
    """lcmtypes/lcmt_drake_signal.lcm"""

    timestamp: int = 0
    coord: List[str] = dataclasses.field(default_factory=list)
    val: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))


@message
class lcmt_force_torque:
    """lcmtypes/lcmt_force_torque.lcm"""

    timestamp: int = 0
    fx: float = 0.0
    fy: float = 0.0
    fz: float = 0.0
    tx: float = 0.0
    ty: float = 0.0
    tz: float = 0.0


@message
class lcmt_scope:
    """lcmtypes/lcmt_scope.lcm (LcmScopeSystem payload)."""

    utime: int = 0
    value: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))


@message
class lcmt_robot_plan:
    """lcmtypes/lcmt_robot_plan.lcm — timed sequence of robot states."""

    utime: int = 0
    plan: List[lcmt_robot_state] = dataclasses.field(default_factory=list)


@message
class lcmt_allegro_command:
    """lcmtypes/lcmt_allegro_command.lcm"""

    utime: int = 0
    joint_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )


@message
class lcmt_allegro_status:
    """lcmtypes/lcmt_allegro_status.lcm"""

    utime: int = 0
    joint_position_measured: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_velocity_estimated: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_position_commanded: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque_commanded: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )


@message
class lcmt_panda_command:
    """lcmtypes/lcmt_panda_command.lcm"""

    CONTROL_MODE_POSITION = 1
    CONTROL_MODE_VELOCITY = 2
    CONTROL_MODE_TORQUE = 4

    utime: int = 0
    joint_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    control_mode_expected: int = 0


@message
class lcmt_panda_status:
    """lcmtypes/lcmt_panda_status.lcm (franka::RobotState mirror)."""

    utime: int = 0
    joint_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_position_desired: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_velocity_desired: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_acceleration_desired: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque_desired: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    joint_torque_external: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    control_command_success_rate: float = 0.0
    robot_mode: int = 0
    robot_utime: int = 0
    control_mode: int = 0


@message
class lcmt_viewer_geometry_data:
    """lcmtypes/lcmt_viewer_geometry_data.lcm"""

    BOX, SPHERE, CYLINDER, MESH, CAPSULE, ELLIPSOID = 1, 2, 3, 4, 5, 6

    type: int = 0
    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    quaternion: np.ndarray = dataclasses.field(
        default_factory=lambda: np.asarray([1.0, 0, 0, 0])
    )
    color: np.ndarray = dataclasses.field(
        default_factory=lambda: np.asarray([0.5, 0.5, 0.5, 1.0])
    )
    string_data: str = ""
    float_data: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )


@message
class lcmt_viewer_link_data:
    """lcmtypes/lcmt_viewer_link_data.lcm"""

    name: str = ""
    robot_num: int = 0
    geom: List[lcmt_viewer_geometry_data] = dataclasses.field(
        default_factory=list
    )


@message
class lcmt_viewer_load_robot:
    """lcmtypes/lcmt_viewer_load_robot.lcm"""

    link: List[lcmt_viewer_link_data] = dataclasses.field(
        default_factory=list
    )


@message
class lcmt_viewer_draw:
    """lcmtypes/lcmt_viewer_draw.lcm"""

    timestamp: int = 0
    link_name: List[str] = dataclasses.field(default_factory=list)
    robot_num: List[int] = dataclasses.field(default_factory=list)
    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3))
    )
    quaternion: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 4))
    )


@message
class lcmt_acrobot_u:
    """lcmtypes/lcmt_acrobot_u.lcm — acrobot actuation (elbow torque)."""

    timestamp: int = 0
    tau: float = 0.0


@message
class lcmt_acrobot_x:
    """lcmtypes/lcmt_acrobot_x.lcm — acrobot full state."""

    timestamp: int = 0
    theta1: float = 0.0
    theta1Dot: float = 0.0
    theta2: float = 0.0
    theta2Dot: float = 0.0


@message
class lcmt_acrobot_y:
    """lcmtypes/lcmt_acrobot_y.lcm — acrobot measured output."""

    timestamp: int = 0
    theta1: float = 0.0
    theta2: float = 0.0
    tau: float = 0.0


@message
class lcmt_point:
    """lcmtypes/lcmt_point.lcm — a 3D point."""

    x: float = 0.0
    y: float = 0.0
    z: float = 0.0


@message
class lcmt_quaternion:
    """lcmtypes/lcmt_quaternion.lcm — orientation quaternion (wxyz)."""

    w: float = 1.0
    x: float = 0.0
    y: float = 0.0
    z: float = 0.0


@message
class lcmt_point_cloud_field:
    """lcmtypes/lcmt_point_cloud_field.lcm — one channel of a point cloud
    (PCL/ROS PointField conventions)."""

    INT8, UINT8, INT16, UINT16 = 1, 2, 3, 4
    INT32, UINT32, FLOAT32, FLOAT64 = 5, 6, 7, 8

    name: str = ""
    byte_offset: int = 0
    datatype: int = 0
    count: int = 0


@message
class lcmt_viewer_command:
    """lcmtypes/lcmt_viewer_command.lcm — viewer control verbs."""

    STATUS, LOAD_MODEL, LOAD_RENDERER, SHUTDOWN = 0, 1, 2, 3
    START_RECORDING, STOP_RECORDING = 4, 5
    LOAD_TERRAIN, SET_TERRAIN_TRANSFORM = 6, 7

    command_type: int = 0
    command_data: str = ""


@message
class lcmt_image_array:
    """lcmtypes/lcmt_image_array.lcm — synchronized multi-camera frames."""

    header: lcmt_header = dataclasses.field(default_factory=lcmt_header)
    images: List[lcmt_image] = dataclasses.field(default_factory=list)


@message
class lcmt_iiwa_status_telemetry:
    """lcmtypes/lcmt_iiwa_status_telemetry.lcm — clock-offset telemetry."""

    host_utime: int = 0
    iiwa_utime: int = 0
    estimated_dt_host_minus_iiwa: int = 0


@message
class lcmt_call_python_data:
    """lcmtypes/lcmt_call_python_data.lcm — one RPC argument (mxArray role)."""

    REMOTE_VARIABLE_REFERENCE, DOUBLE, CHAR, LOGICAL, INT = 0, 1, 2, 3, 4
    MATRIX, VECTOR, SCALAR = 0, 1, 2

    data_type: int = 0
    shape_type: int = 0
    rows: int = 0
    cols: int = 0
    data: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.uint8)
    )


@message
class lcmt_call_python:
    """lcmtypes/lcmt_call_python.lcm — async RPC to a Python client."""

    function_name: str = ""
    lhs: int = 0
    rhs: List[lcmt_call_python_data] = dataclasses.field(default_factory=list)


@message
class lcmt_hydroelastic_quadrature_per_point_data_for_viz:
    """lcmtypes/lcmt_hydroelastic_quadrature_per_point_data_for_viz.lcm"""

    p_WQ: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    vt_BqAq_W: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    traction_Aq_W: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )


@message
class lcmt_hydroelastic_contact_surface_for_viz:
    """lcmtypes/lcmt_hydroelastic_contact_surface_for_viz.lcm — one contact
    patch: force/moment at the centroid + the pressure-field mesh."""

    geometry1_name: str = ""
    body1_name: str = ""
    model1_name: str = ""
    body1_unique: bool = False
    collision_count1: int = 0
    geometry2_name: str = ""
    body2_name: str = ""
    model2_name: str = ""
    body2_unique: bool = False
    collision_count2: int = 0
    centroid_W: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    force_C_W: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    moment_C_W: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    quadrature_point_data: List[
        lcmt_hydroelastic_quadrature_per_point_data_for_viz
    ] = dataclasses.field(default_factory=list)
    p_WV: List[lcmt_point] = dataclasses.field(default_factory=list)
    pressure: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    poly_data: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int32)
    )


@message
class lcmt_planar_gripper_finger_command:
    """lcmtypes/lcmt_planar_gripper_finger_command.lcm — 2-joint finger."""

    joint_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2)
    )
    joint_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2)
    )
    joint_torque: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2)
    )


@message
class lcmt_planar_gripper_command:
    """lcmtypes/lcmt_planar_gripper_command.lcm"""

    utime: int = 0
    finger_command: List[lcmt_planar_gripper_finger_command] = (
        dataclasses.field(default_factory=list)
    )


@message
class lcmt_planar_gripper_finger_status:
    """lcmtypes/lcmt_planar_gripper_finger_status.lcm"""

    joint_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2)
    )
    joint_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2)
    )
    fingertip_force: lcmt_force_torque = dataclasses.field(
        default_factory=lcmt_force_torque
    )


@message
class lcmt_planar_gripper_status:
    """lcmtypes/lcmt_planar_gripper_status.lcm"""

    utime: int = 0
    finger_status: List[lcmt_planar_gripper_finger_status] = (
        dataclasses.field(default_factory=list)
    )


@message
class lcmt_planar_gripper_finger_face_assignment:
    """lcmtypes/lcmt_planar_gripper_finger_face_assignment.lcm — which brick
    face a finger touches, and where (brick-frame y,z)."""

    utime: int = 0
    finger_name: str = ""
    brick_face_name: str = ""
    p_BoBq_B: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2)
    )
    is_in_contact: bool = False


@message
class lcmt_planar_gripper_finger_face_assignments:
    """lcmtypes/lcmt_planar_gripper_finger_face_assignments.lcm"""

    utime: int = 0
    finger_face_assignments: List[
        lcmt_planar_gripper_finger_face_assignment
    ] = dataclasses.field(default_factory=list)


@message
class lcmt_planar_manipuland_status:
    """lcmtypes/lcmt_planar_manipuland_status.lcm — planar pose + twist."""

    utime: int = 0
    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2)
    )
    theta: float = 0.0
    velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2)
    )
    thetadot: float = 0.0


@message
class lcmt_planar_plant_state:
    """lcmtypes/lcmt_planar_plant_state.lcm"""

    utime: int = 0
    plant_state: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )


@message
class experimental_lcmt_deformable_tri:
    """lcmtypes/experimental_lcmt_deformable_tri.lcm (fork) — one triangle."""

    vertices: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.int32)
    )


@message
class experimental_lcmt_deformable_tri_mesh_init:
    """lcmtypes/experimental_lcmt_deformable_tri_mesh_init.lcm (fork) — MPM
    cloth mesh topology, sent once at load."""

    name: str = ""
    num_vertices: int = 0
    tris: List[experimental_lcmt_deformable_tri] = dataclasses.field(
        default_factory=list
    )


@message
class experimental_lcmt_deformable_tri_mesh_update:
    """lcmtypes/experimental_lcmt_deformable_tri_mesh_update.lcm (fork) —
    per-frame MPM cloth vertex positions."""

    name: str = ""
    vertices_W: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3))
    )


@message
class experimental_lcmt_deformable_tri_meshes_init:
    """lcmtypes/experimental_lcmt_deformable_tri_meshes_init.lcm (fork)"""

    meshes: List[experimental_lcmt_deformable_tri_mesh_init] = (
        dataclasses.field(default_factory=list)
    )


@message
class experimental_lcmt_deformable_tri_meshes_update:
    """lcmtypes/experimental_lcmt_deformable_tri_meshes_update.lcm (fork)"""

    timestamp: int = 0
    meshes: List[experimental_lcmt_deformable_tri_mesh_update] = (
        dataclasses.field(default_factory=list)
    )
