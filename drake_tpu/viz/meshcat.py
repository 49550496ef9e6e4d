"""Meshcat visualizer bridge: scene tree, animation recording, static HTML,
and a live websocket server.

Re-derivation of the reference's embedded Meshcat server
(geometry/meshcat.h/.cc — uWebSockets + msgpack; message shapes from
meshcat_types_internal.h: SetObjectData :380, SetTransformData :405,
DeleteData :432, SetPropertyData :440, the set_animation packing
meshcat.cc:1275-1356, and the StaticHtml replay mechanism
meshcat.cc:1687-1745) in host Python:

  - the scene tree stores the last packed set_object/set_transform/
    set_property per path (so late-joining clients and static snapshots see
    the full state — the SceneTreeElement role),
  - `MeshcatAnimation` records per-frame position/quaternion (and generic
    property) tracks and packs the three.js AnimationClip message,
  - `static_html()` emits a standalone HTML file that replays the packed
    commands through meshcat.js (loaded from a CDN rather than embedded),
  - `serve()` starts a minimal RFC-6455 websocket server (stdlib sockets:
    SHA-1/base64 upgrade handshake, binary frames) that pushes the scene
    and live updates to any meshcat viewer.

Everything is plain host Python — visualization is IO, not compute; the
pubsub transport (io/native/pubsub.cpp) can feed this bridge from a
simulation process.
"""

from __future__ import annotations

import base64
import hashlib
import socket
import struct
import threading
import uuid as uuid_mod
from typing import Dict, List, Optional, Tuple

import numpy as np

from drake_tpu.geometry import shapes as geom
from drake_tpu.viz.msgpack import TypedArray, packb, unpackb

_WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _uuid() -> str:
    return str(uuid_mod.uuid4())


def _pose_matrix(R=None, p=None) -> list:
    """Column-major 4x4 homogeneous matrix as a flat list of 16 doubles."""
    T = np.eye(4)
    if R is not None:
        T[:3, :3] = np.asarray(R)
    if p is not None:
        T[:3, 3] = np.asarray(p)
    return [float(x) for x in T.flatten(order="F")]


def _geometry_data(shape) -> dict:
    """Shape -> three.js geometry dict (meshcat_types_internal.h:190-265)."""
    u = _uuid()
    if isinstance(shape, geom.Sphere):
        return {"type": "SphereGeometry", "uuid": u, "radius": shape.radius,
                "widthSegments": 20, "heightSegments": 20}
    if isinstance(shape, geom.Box):
        lx, ly, lz = shape.size
        return {"type": "BoxGeometry", "uuid": u, "width": lx,
                "height": ly, "depth": lz}
    if isinstance(shape, geom.Cylinder):
        return {"type": "CylinderGeometry", "uuid": u,
                "radiusBottom": shape.radius, "radiusTop": shape.radius,
                "height": shape.length, "radialSegments": 50}
    if isinstance(shape, geom.Capsule):
        return {"type": "CapsuleGeometry", "uuid": u, "radius": shape.radius,
                "length": shape.length, "radialSegments": 20,
                "capSegments": 10}
    raise TypeError(f"no meshcat geometry for {type(shape)}")


class MeshcatAnimation:
    """three.js AnimationClip recording (reference meshcat_animation.h)."""

    def __init__(self, frames_per_second: float = 64.0):
        self.fps = float(frames_per_second)
        # path -> property -> (js_type, {frame: value})
        self._tracks: Dict[str, Dict[str, Tuple[str, Dict[int, list]]]] = {}
        self.loop_mode = 2201  # kLoopRepeat
        self.repetitions = 1
        self.autoplay = True
        self.clamp_when_finished = False

    def frame(self, time_s: float) -> int:
        return int(np.floor(time_s * self.fps))

    def set_transform(self, frame: int, path: str, R=None, p=None):
        """Record a keyframe pose (position + quaternion tracks, the way
        MeshcatVisualizer records simulations)."""
        p = np.zeros(3) if p is None else np.asarray(p, dtype=float)
        R = np.eye(3) if R is None else np.asarray(R, dtype=float)
        q = _rotation_to_quat_xyzw(R)
        self.set_property(frame, path, "position", "vector3",
                          [float(x) for x in p])
        self.set_property(frame, path, "quaternion", "quaternion",
                          [float(x) for x in q])

    def set_property(self, frame: int, path: str, prop: str, js_type: str,
                     value):
        tracks = self._tracks.setdefault(path, {})
        typ, keys = tracks.setdefault(prop, (js_type, {}))
        keys[int(frame)] = value

    def to_message(self, full_path) -> dict:
        animations = []
        for path, props in self._tracks.items():
            tracks = []
            for prop, (js_type, keys) in props.items():
                tracks.append({
                    "name": "." + prop,
                    "type": js_type,
                    "keys": [
                        {"time": f, "value": keys[f]} for f in sorted(keys)
                    ],
                })
            animations.append({
                "path": full_path(path),
                "clip": {"fps": self.fps, "name": "default",
                         "tracks": tracks},
            })
        return {
            "type": "set_animation",
            "animations": animations,
            "options": {
                "play": self.autoplay,
                "loopMode": self.loop_mode,
                "repetitions": self.repetitions,
                "clampWhenFinished": self.clamp_when_finished,
            },
        }


def _rotation_to_quat_xyzw(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion in three.js [x, y, z, w] order."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 0.0)) * 2
        qv = np.zeros(3)
        qv[i] = 0.25 * s
        qv[j] = (R[j, i] + R[i, j]) / s
        qv[k] = (R[k, i] + R[i, k]) / s
        w = (R[k, j] - R[j, k]) / s
        x, y, z = qv
    return np.array([x, y, z, w])


class Meshcat:
    """The visualizer front end (reference geometry/meshcat.h API shape)."""

    def __init__(self, prefix: str = "/drake_tpu"):
        self._prefix = prefix.rstrip("/")
        # path -> packed bytes, in the three command stores
        self._objects: Dict[str, bytes] = {}
        self._transforms: Dict[str, bytes] = {}
        self._properties: Dict[Tuple[str, str], bytes] = {}
        self._animation: Optional[bytes] = None
        # name -> control state (sliders/buttons; meshcat.h AddSlider role)
        self._controls: Dict[str, dict] = {}
        self._control_msgs: Dict[str, bytes] = {}
        self._lock = threading.Lock()
        self._clients: List[socket.socket] = []
        self._server: Optional[socket.socket] = None
        self._thread: Optional[threading.Thread] = None
        self.port: Optional[int] = None

    # ------------------------------ API -----------------------------------

    def full_path(self, path: str) -> str:
        if path.startswith("/"):
            return path
        return f"{self._prefix}/{path}"

    def set_object(self, path: str, shape, color: int = 0xE5E5E5,
                   opacity: float = 1.0, R=None, p=None):
        geometry = _geometry_data(shape)
        material = {
            "uuid": _uuid(),
            "type": "MeshPhongMaterial",
            "color": int(color),
            "vertexColors": False,
        }
        if opacity < 1.0:
            material["opacity"] = float(opacity)
            material["transparent"] = True
        obj = {
            "metadata": {"type": "Object", "version": 4.5},
            "geometries": [geometry],
            "materials": [material],
            "object": {
                "uuid": _uuid(),
                "type": "Mesh",
                "geometry": geometry["uuid"],
                "material": material["uuid"],
                "matrix": _pose_matrix(R, p),
            },
        }
        self._send_set_object(path, obj)

    def set_points(self, path: str, positions: np.ndarray,
                   colors: Optional[np.ndarray] = None, size: float = 0.01,
                   color: int = 0xFFFFFF):
        """Point cloud: positions (3, n) float; per-point colors (3, n) in
        [0,1], or a single material ``color`` (hex) used when colors=None."""
        positions = np.asarray(positions, np.float32)
        data = {"position": TypedArray(positions)}
        if colors is not None:
            data["color"] = TypedArray(np.asarray(colors, np.float32))
        geometry = {
            "type": "BufferGeometry",
            "uuid": _uuid(),
            "data": {"attributes": data},
        }
        material = {
            "uuid": _uuid(),
            "type": "PointsMaterial",
            "color": 0xFFFFFF if colors is not None else int(color),
            "size": size,
            "vertexColors": colors is not None,
        }
        obj = {
            "metadata": {"type": "Object", "version": 4.5},
            "geometries": [geometry],
            "materials": [material],
            "object": {
                "uuid": _uuid(),
                "type": "Points",
                "geometry": geometry["uuid"],
                "material": material["uuid"],
                "matrix": _pose_matrix(),
            },
        }
        self._send_set_object(path, obj)

    def set_line_segments(self, path: str, starts: np.ndarray,
                          ends: np.ndarray, color: int = 0xFF8800,
                          line_width: float = 1.0):
        """Line segments: starts/ends (3, n) — reference meshcat.h
        SetLineSegments (used by the contact-force visualizer)."""
        starts = np.asarray(starts, np.float32)
        ends = np.asarray(ends, np.float32)
        # Interleave start/end columns: (3, 2n).
        pos = np.empty((3, 2 * starts.shape[1]), np.float32)
        pos[:, 0::2] = starts
        pos[:, 1::2] = ends
        geometry = {
            "type": "BufferGeometry",
            "uuid": _uuid(),
            "data": {"attributes": {"position": TypedArray(pos)}},
        }
        material = {
            "uuid": _uuid(),
            "type": "LineBasicMaterial",
            "color": int(color),
            "linewidth": float(line_width),
            "vertexColors": False,
        }
        obj = {
            "metadata": {"type": "Object", "version": 4.5},
            "geometries": [geometry],
            "materials": [material],
            "object": {
                "uuid": _uuid(),
                "type": "LineSegments",
                "geometry": geometry["uuid"],
                "material": material["uuid"],
                "matrix": _pose_matrix(),
            },
        }
        self._send_set_object(path, obj)

    def set_triangle_mesh(self, path: str, vertices: np.ndarray,
                          faces: np.ndarray, color: int = 0xE5E5E5,
                          opacity: float = 1.0):
        """vertices (3, nv) float32, faces (3, nf) uint32."""
        geometry = {
            "type": "BufferGeometry",
            "uuid": _uuid(),
            "data": {
                "attributes": {
                    "position": TypedArray(np.asarray(vertices, np.float32))
                },
                "index": TypedArray(np.asarray(faces, np.uint32)),
            },
        }
        material = {
            "uuid": _uuid(),
            "type": "MeshPhongMaterial",
            "color": int(color),
            "vertexColors": False,
        }
        if opacity < 1.0:
            material["opacity"] = float(opacity)
            material["transparent"] = True
        obj = {
            "metadata": {"type": "Object", "version": 4.5},
            "geometries": [geometry],
            "materials": [material],
            "object": {
                "uuid": _uuid(),
                "type": "Mesh",
                "geometry": geometry["uuid"],
                "material": material["uuid"],
                "matrix": _pose_matrix(),
            },
        }
        self._send_set_object(path, obj)

    def set_transform(self, path: str, R=None, p=None):
        msg = packb({
            "type": "set_transform",
            "path": self.full_path(path),
            "matrix": _pose_matrix(R, p),
        })
        with self._lock:
            self._transforms[self.full_path(path)] = msg
        self._broadcast(msg)

    def set_property(self, path: str, prop: str, value):
        msg = packb({
            "type": "set_property",
            "path": self.full_path(path),
            "property": prop,
            "value": value,
        })
        with self._lock:
            self._properties[(self.full_path(path), prop)] = msg
        self._broadcast(msg)

    def delete(self, path: str = ""):
        fp = self.full_path(path)
        msg = packb({"type": "delete", "path": fp})
        with self._lock:
            for d in (self._objects, self._transforms):
                for key in [k for k in d if k.startswith(fp)]:
                    del d[key]
            for key in [k for k in self._properties if k[0].startswith(fp)]:
                del self._properties[key]
        self._broadcast(msg)

    def set_animation(self, animation: MeshcatAnimation):
        msg = packb(animation.to_message(self.full_path))
        with self._lock:
            self._animation = msg
        self._broadcast(msg)

    def _send_set_object(self, path: str, obj: dict):
        msg = packb({
            "type": "set_object",
            "path": self.full_path(path),
            "object": obj,
        })
        with self._lock:
            self._objects[self.full_path(path)] = msg
        self._broadcast(msg)

    # ------------------------------ controls -------------------------------
    # GUI widgets (reference meshcat.h AddSlider :436, AddButton :409,
    # GetSliderValue, GetButtonClicks, DeleteAddedControls).  Outgoing
    # protocol: msgpack {type: "set_control", name, control, min, max, step,
    # value}; incoming user interactions arrive on the websocket as
    # {type: "set_control_value", name, value} (sliders) or
    # {type: "button", name} (buttons).

    def add_slider(self, name: str, min_value: float = 0.0,
                   max_value: float = 1.0, step: float = 0.01,
                   value: Optional[float] = None) -> float:
        value = min_value if value is None else min(max(value, min_value),
                                                    max_value)
        msg = packb({
            "type": "set_control", "name": name, "control": "slider",
            "min": float(min_value), "max": float(max_value),
            "step": float(step), "value": float(value),
        })
        with self._lock:
            self._controls[name] = {
                "control": "slider", "min": float(min_value),
                "max": float(max_value), "step": float(step),
                "value": float(value),
            }
            self._control_msgs[name] = msg
        self._broadcast(msg)
        return value

    def add_button(self, name: str):
        msg = packb({"type": "set_control", "name": name,
                     "control": "button"})
        with self._lock:
            self._controls[name] = {"control": "button", "clicks": 0}
            self._control_msgs[name] = msg
        self._broadcast(msg)

    def get_slider_value(self, name: str) -> float:
        with self._lock:
            return float(self._controls[name]["value"])

    def set_slider_value(self, name: str, value: float) -> float:
        with self._lock:
            c = self._controls[name]
            value = min(max(float(value), c["min"]), c["max"])
            c["value"] = value
        self._broadcast(packb({
            "type": "set_control_value", "name": name, "value": value}))
        return value

    def get_button_clicks(self, name: str) -> int:
        with self._lock:
            return int(self._controls[name]["clicks"])

    def delete_added_controls(self):
        with self._lock:
            names = list(self._controls)
            self._controls.clear()
            self._control_msgs.clear()
        for name in names:
            self._broadcast(packb({"type": "delete_control", "name": name}))

    def _handle_client_message(self, payload: bytes):
        try:
            msg = unpackb(payload)
        except Exception:
            return
        if not isinstance(msg, dict):
            return
        name = msg.get("name")
        with self._lock:
            c = self._controls.get(name)
            if c is None:
                return
            if msg.get("type") == "set_control_value" and "value" in msg:
                c["value"] = min(max(float(msg["value"]), c["min"]), c["max"])
            elif msg.get("type") == "button":
                c["clicks"] = c.get("clicks", 0) + 1

    # -------------------------- static HTML --------------------------------

    def _packed_state(self) -> List[bytes]:
        with self._lock:
            return (
                list(self._objects.values())
                + list(self._transforms.values())
                + list(self._properties.values())
                + list(self._control_msgs.values())
                + ([self._animation] if self._animation else [])
            )

    def static_html(self) -> str:
        """Standalone HTML replaying the scene through meshcat.js (the
        reference's StaticHtml role, meshcat.cc:1687; meshcat.js loaded from
        a CDN instead of being embedded)."""
        commands = "\n".join(
            "viewer.handle_command_bytearray(Uint8Array.from(atob("
            f'"{base64.b64encode(m).decode()}"), c => c.charCodeAt(0)));'
            for m in self._packed_state()
        )
        return f"""<!DOCTYPE html>
<html>
<head><meta charset="utf-8"/><title>drake_tpu meshcat</title>
<style>body {{ margin: 0; }} #viewer {{ width: 100vw; height: 100vh; }}</style>
</head>
<body>
<div id="viewer"></div>
<script type="module">
import {{ Viewer }} from "https://unpkg.com/meshcat@latest/dist/main.min.js";
const viewer = new Viewer(document.getElementById("viewer"));
{commands}
</script>
</body>
</html>
"""

    # ------------------------- websocket server ----------------------------

    def serve(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start the websocket server; returns the bound port."""
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(4)
        self._server = srv
        self.port = srv.getsockname()[1]
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()
        return self.port

    def close(self):
        if self._server is not None:
            try:
                self._server.close()
            except OSError:
                pass
            self._server = None
        with self._lock:
            for c in self._clients:
                try:
                    c.close()
                except OSError:
                    pass
            self._clients.clear()

    def _accept_loop(self):
        while self._server is not None:
            try:
                conn, _ = self._server.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handshake, args=(conn,), daemon=True
            ).start()

    def _handshake(self, conn: socket.socket):
        try:
            data = b""
            while b"\r\n\r\n" not in data:
                chunk = conn.recv(4096)
                if not chunk:
                    conn.close()
                    return
                data += chunk
            headers = {}
            for line in data.split(b"\r\n")[1:]:
                if b":" in line:
                    k, v = line.split(b":", 1)
                    headers[k.strip().lower()] = v.strip()
            key = headers.get(b"sec-websocket-key")
            if key is None:
                # Plain HTTP: serve the static snapshot page.
                body = self.static_html().encode()
                conn.sendall(
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    + f"Content-Length: {len(body)}\r\n\r\n".encode()
                    + body
                )
                conn.close()
                return
            accept = base64.b64encode(
                hashlib.sha1(key + _WS_MAGIC.encode()).digest()
            )
            conn.sendall(
                b"HTTP/1.1 101 Switching Protocols\r\n"
                b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                b"Sec-WebSocket-Accept: " + accept + b"\r\n\r\n"
            )
            # Push the current scene, then register for live updates.
            for msg in self._packed_state():
                conn.sendall(_ws_frame(msg))
            with self._lock:
                self._clients.append(conn)
            threading.Thread(
                target=self._client_reader, args=(conn,), daemon=True
            ).start()
        except OSError:
            try:
                conn.close()
            except OSError:
                pass

    def _client_reader(self, conn: socket.socket):
        """Read control interactions from one client (masked frames)."""
        buf = b""
        while True:
            try:
                chunk = conn.recv(4096)
            except OSError:
                return
            if not chunk:
                return
            buf += chunk
            payloads, buf = _parse_masked_frames(buf)
            for p in payloads:
                self._handle_client_message(p)

    def _broadcast(self, msg: bytes):
        with self._lock:
            clients = list(self._clients)
        dead = []
        frame = _ws_frame(msg)
        for c in clients:
            try:
                c.sendall(frame)
            except OSError:
                dead.append(c)
        if dead:
            with self._lock:
                for c in dead:
                    if c in self._clients:
                        self._clients.remove(c)


def _ws_frame(payload: bytes) -> bytes:
    """A single unmasked binary websocket frame (RFC 6455 server->client)."""
    n = len(payload)
    if n <= 125:
        header = struct.pack("!BB", 0x82, n)
    elif n <= 0xFFFF:
        header = struct.pack("!BBH", 0x82, 126, n)
    else:
        header = struct.pack("!BBQ", 0x82, 127, n)
    return header + payload


def _parse_masked_frames(buf: bytes) -> Tuple[List[bytes], bytes]:
    """Parse client->server frames (masked per RFC 6455); returns
    (payloads, remaining_buffer)."""
    out: List[bytes] = []
    i = 0
    while i + 2 <= len(buf):
        b1 = buf[i + 1]
        masked = bool(b1 & 0x80)
        n = b1 & 0x7F
        j = i + 2
        if n == 126:
            if j + 2 > len(buf):
                break
            n = int.from_bytes(buf[j : j + 2], "big")
            j += 2
        elif n == 127:
            if j + 8 > len(buf):
                break
            n = int.from_bytes(buf[j : j + 8], "big")
            j += 8
        mask = b"\x00" * 4
        if masked:
            if j + 4 > len(buf):
                break
            mask = buf[j : j + 4]
            j += 4
        if j + n > len(buf):
            break
        payload = bytes(
            c ^ mask[k % 4] for k, c in enumerate(buf[j : j + n]))
        opcode = buf[i] & 0x0F
        if opcode in (0x01, 0x02):  # text/binary
            out.append(payload)
        i = j + n
    return out, buf[i:]


def mask_client_frame(payload: bytes, mask: bytes = b"\x12\x34\x56\x78") -> bytes:
    """Build a masked client->server binary frame (for tests/clients)."""
    n = len(payload)
    if n <= 125:
        header = struct.pack("!BB", 0x82, 0x80 | n)
    elif n <= 0xFFFF:
        header = struct.pack("!BBH", 0x82, 0x80 | 126, n)
    else:
        header = struct.pack("!BBQ", 0x82, 0x80 | 127, n)
    body = bytes(c ^ mask[k % 4] for k, c in enumerate(payload))
    return header + mask + body


def ws_parse_frames(buf: bytes) -> List[bytes]:
    """Parse server-sent frames (for tests / simple clients)."""
    out = []
    i = 0
    while i + 2 <= len(buf):
        b1 = buf[i + 1]
        n = b1 & 0x7F
        j = i + 2
        if n == 126:
            n = int.from_bytes(buf[j : j + 2], "big")
            j += 2
        elif n == 127:
            n = int.from_bytes(buf[j : j + 8], "big")
            j += 8
        if j + n > len(buf):
            break
        out.append(buf[j : j + n])
        i = j + n
    return out
