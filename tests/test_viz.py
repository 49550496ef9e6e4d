"""Meshcat bridge tests: msgpack codec, message shapes matching the
reference protocol (geometry/meshcat_types_internal.h), animation clips,
static HTML, and a live websocket round trip."""

import base64
import hashlib
import socket
import struct

import numpy as np

from drake_tpu.geometry import shapes as geom
from drake_tpu.viz import msgpack as mp
from drake_tpu.viz.meshcat import (
    Meshcat,
    MeshcatAnimation,
    _rotation_to_quat_xyzw,
    ws_parse_frames,
)


class TestMsgpack:
    def test_roundtrip_scalars(self):
        for v in [None, True, False, 0, 1, 127, 128, 255, 256, 65536,
                  -1, -32, -33, -200, -70000, 3.5, "hello", "x" * 300,
                  b"\x00\x01\x02"]:
            assert mp.unpackb(mp.packb(v)) == v

    def test_roundtrip_nested(self):
        v = {"a": [1, 2, {"b": None}], "c": "s", "d": [True, 2.5]}
        assert mp.unpackb(mp.packb(v)) == v

    def test_large_collections(self):
        v = list(range(70000))
        assert mp.unpackb(mp.packb(v)) == v
        m = {str(i): i for i in range(20)}
        assert mp.unpackb(mp.packb(m)) == m

    def test_typed_array_convention(self):
        """Matches the reference Eigen adaptor: map {itemSize, type,
        array: ext(0x17, float32 column-major bytes), normalized: false}
        (meshcat_types_internal.h:560-615)."""
        mat = np.arange(6, dtype=np.float32).reshape(3, 2)
        obj = mp.unpackb(mp.packb(mp.TypedArray(mat)))
        assert obj["itemSize"] == 3
        assert obj["type"] == "Float32Array"
        assert obj["normalized"] is False
        ext = obj["array"]
        assert ext.code == 0x17
        decoded = np.frombuffer(ext.data, np.float32).reshape(3, 2, order="F")
        np.testing.assert_array_equal(decoded, mat)

    def test_typed_array_uint32(self):
        faces = np.asarray([[0, 1], [1, 2], [2, 3]], np.uint32)
        obj = mp.unpackb(mp.packb(mp.TypedArray(faces)))
        assert obj["type"] == "Uint32Array" and obj["array"].code == 0x16


class TestMeshcatMessages:
    def test_set_object_shape(self):
        m = Meshcat()
        m.set_object("box", geom.Box((0.1, 0.2, 0.3)), color=0xFF0000,
                     p=(1, 2, 3))
        (msg,) = m._packed_state()
        d = mp.unpackb(msg)
        assert d["type"] == "set_object"
        assert d["path"] == "/drake_tpu/box"
        o = d["object"]
        assert o["metadata"] == {"type": "Object", "version": 4.5}
        (g,) = o["geometries"]
        assert g["type"] == "BoxGeometry"
        assert (g["width"], g["height"], g["depth"]) == (0.1, 0.2, 0.3)
        (mat,) = o["materials"]
        assert mat["color"] == 0xFF0000
        mesh = o["object"]
        assert mesh["type"] == "Mesh"
        assert mesh["geometry"] == g["uuid"]
        assert mesh["material"] == mat["uuid"]
        # Column-major 4x4: translation in elements 12..14.
        assert mesh["matrix"][12:15] == [1.0, 2.0, 3.0]

    def test_set_transform_shape(self):
        m = Meshcat()
        th = 0.5
        R = np.array(
            [
                [np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1],
            ]
        )
        m.set_transform("frame", R=R, p=(0.5, 0, 1))
        d = mp.unpackb(list(m._transforms.values())[0])
        assert d["type"] == "set_transform"
        M = np.asarray(d["matrix"]).reshape(4, 4, order="F")
        np.testing.assert_allclose(M[:3, :3], R, atol=1e-12)
        np.testing.assert_allclose(M[:3, 3], [0.5, 0, 1], atol=1e-12)

    def test_points_and_mesh(self):
        m = Meshcat()
        pts = np.random.default_rng(0).random((3, 50)).astype(np.float32)
        m.set_points("cloud", pts, colors=pts)
        verts = np.asarray([[0, 1, 0], [0, 0, 1], [0, 0, 0]], np.float32)
        faces = np.asarray([[0], [1], [2]], np.uint32)
        m.set_triangle_mesh("tri", verts, faces)
        msgs = [mp.unpackb(b) for b in m._packed_state()]
        cloud = next(d for d in msgs if d["path"].endswith("cloud"))
        obj = cloud["object"]
        assert obj["object"]["type"] == "Points"
        attrs = obj["geometries"][0]["data"]["attributes"]
        assert attrs["position"]["itemSize"] == 3
        assert attrs["color"]["type"] == "Float32Array"
        tri = next(d for d in msgs if d["path"].endswith("tri"))
        assert tri["object"]["geometries"][0]["data"]["index"]["type"] == (
            "Uint32Array"
        )

    def test_delete_clears_subtree(self):
        m = Meshcat()
        m.set_object("a/b", geom.Sphere(0.1))
        m.set_object("c", geom.Sphere(0.1))
        m.delete("a")
        paths = [mp.unpackb(b)["path"] for b in m._packed_state()]
        assert paths == ["/drake_tpu/c"]

    def test_animation_message(self):
        m = Meshcat()
        anim = MeshcatAnimation(frames_per_second=32.0)
        for k in range(4):
            anim.set_transform(k, "obj", p=(0.1 * k, 0, 0))
        m.set_animation(anim)
        d = mp.unpackb(m._animation)
        assert d["type"] == "set_animation"
        (track,) = d["animations"]
        assert track["path"] == "/drake_tpu/obj"
        clip = track["clip"]
        assert clip["fps"] == 32.0
        names = {t["name"] for t in clip["tracks"]}
        assert names == {".position", ".quaternion"}
        pos = next(t for t in clip["tracks"] if t["name"] == ".position")
        assert pos["type"] == "vector3"
        assert [k["time"] for k in pos["keys"]] == [0, 1, 2, 3]
        assert pos["keys"][3]["value"][0] == 0.30000000000000004 or (
            abs(pos["keys"][3]["value"][0] - 0.3) < 1e-12
        )
        assert d["options"]["loopMode"] == 2201

    def test_quat_matches_rotation(self):
        rng = np.random.default_rng(3)
        for _ in range(10):
            w = rng.standard_normal(3)
            th = np.linalg.norm(w)
            a = w / th
            K = np.array(
                [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]]
            )
            R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
            x, y, z, qw = _rotation_to_quat_xyzw(R)
            # Rebuild R from the quaternion and compare.
            q = np.array([qw, x, y, z])
            R2 = np.array([
                [1 - 2 * (q[2] ** 2 + q[3] ** 2),
                 2 * (q[1] * q[2] - q[0] * q[3]),
                 2 * (q[1] * q[3] + q[0] * q[2])],
                [2 * (q[1] * q[2] + q[0] * q[3]),
                 1 - 2 * (q[1] ** 2 + q[3] ** 2),
                 2 * (q[2] * q[3] - q[0] * q[1])],
                [2 * (q[1] * q[3] - q[0] * q[2]),
                 2 * (q[2] * q[3] + q[0] * q[1]),
                 1 - 2 * (q[1] ** 2 + q[2] ** 2)],
            ])
            np.testing.assert_allclose(R2, R, atol=1e-10)

    def test_static_html(self):
        m = Meshcat()
        m.set_object("ball", geom.Sphere(0.05))
        m.set_transform("ball", p=(0, 0, 1))
        html = m.static_html()
        assert "handle_command_bytearray" in html
        assert html.count("atob") == 2
        # The embedded base64 decodes back to our packed messages.
        b64 = html.split('atob("')[1].split('")')[0]
        d = mp.unpackb(base64.b64decode(b64))
        assert d["type"] == "set_object"


class TestWebsocketServer:
    def test_handshake_and_scene_push(self):
        m = Meshcat()
        m.set_object("ball", geom.Sphere(0.05))
        port = m.serve()
        try:
            c = socket.create_connection(("127.0.0.1", port), timeout=5)
            key = base64.b64encode(b"0123456789abcdef").decode()
            c.sendall(
                f"GET / HTTP/1.1\r\nHost: localhost\r\nUpgrade: websocket\r\n"
                f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                f"Sec-WebSocket-Version: 13\r\n\r\n".encode()
            )
            c.settimeout(5)
            data = b""
            while b"\r\n\r\n" not in data:
                data += c.recv(4096)
            head, rest = data.split(b"\r\n\r\n", 1)
            assert b"101" in head.split(b"\r\n")[0]
            expect = base64.b64encode(
                hashlib.sha1(
                    (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
                ).digest()
            )
            assert expect in head
            # Scene push: one binary frame with the set_object message.
            while not ws_parse_frames(rest):
                rest += c.recv(4096)
            frames = ws_parse_frames(rest)
            d = mp.unpackb(frames[0])
            assert d["type"] == "set_object"
            # Live update broadcast reaches the connected client.
            import time
            time.sleep(0.1)  # let the server register the client
            m.set_transform("ball", p=(1, 0, 0))
            buf = b""
            got = []
            c.settimeout(5)
            while not got:
                buf += c.recv(4096)
                got = [
                    f for f in ws_parse_frames(buf)
                    if mp.unpackb(f)["type"] == "set_transform"
                ]
            assert mp.unpackb(got[0])["path"] == "/drake_tpu/ball"
            c.close()
        finally:
            m.close()

    def test_plain_http_serves_snapshot(self):
        m = Meshcat()
        m.set_object("ball", geom.Sphere(0.05))
        port = m.serve()
        try:
            c = socket.create_connection(("127.0.0.1", port), timeout=5)
            c.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
            c.settimeout(5)
            data = b""
            while True:
                try:
                    chunk = c.recv(65536)
                except socket.timeout:
                    break
                if not chunk:
                    break
                data += chunk
            assert b"200 OK" in data
            assert b"handle_command_bytearray" in data
        finally:
            m.close()


class TestVisualizationWiring:
    """AddDefaultVisualization role (viz/visualization.py)."""

    def _world(self):
        import jax.numpy as jnp

        from drake_tpu.geometry.scene import CollisionGeometry
        from drake_tpu.multibody.model import ModelBuilder

        b = ModelBuilder()
        b.add_body(
            "arm", parent=None, joint_type="revolute", mass=1.0,
            com=(0, 0, -0.5), inertia_com=np.eye(3) * 0.05, axis=(0, 1, 0),
        )
        model, params = b.build(jnp.float64)
        geoms = [
            CollisionGeometry(
                name="rod", body=0, shape=geom.Capsule(0.03, 1.0),
            ),
            CollisionGeometry(name="floor", body=-1, shape=geom.HalfSpace()),
        ]
        return model, params, geoms

    def test_scene_publish_and_state(self):
        import jax.numpy as jnp

        from drake_tpu.viz.visualization import (
            add_scene_visualization,
            publish_state,
        )

        model, params, geoms = self._world()
        m = Meshcat()
        add_scene_visualization(m, geoms)
        paths = [mp.unpackb(b)["path"] for b in m._packed_state()]
        assert any("body0/rod" in p for p in paths)
        assert any("floor" in p for p in paths)
        publish_state(m, model, params, jnp.asarray([0.5]), geoms)
        tf = [
            mp.unpackb(b)
            for b in m._packed_state()
            if mp.unpackb(b)["type"] == "set_transform"
        ]
        assert any(t["path"].endswith("body0") for t in tf)

    def test_record_rollout_animation(self):
        import jax.numpy as jnp

        from drake_tpu.viz.visualization import record_rollout

        model, params, geoms = self._world()
        m = Meshcat()
        qs = np.linspace(0, np.pi / 2, 50)[:, None]
        anim = record_rollout(m, model, params, qs, geoms, time_step=0.01)
        d = mp.unpackb(m._animation)
        (track,) = [
            t for t in d["animations"] if t["path"].endswith("body0")
        ]
        names = {t["name"] for t in track["clip"]["tracks"]}
        assert names == {".position", ".quaternion"}
        html = m.static_html()
        assert "set_animation" in str(mp.unpackb(m._animation)["type"])
        assert len(html) > 1000


class TestInertiaVisualizer:
    """visualization/inertia_visualizer.h CalcInertiaGeometry role."""

    def test_solid_sphere_round_trip(self):
        from drake_tpu.viz.visualization import inertia_ellipsoid

        m, r = 2.0, 0.3
        I = np.eye(3) * 0.4 * m * r * r
        semi, R = inertia_ellipsoid(m, I)
        np.testing.assert_allclose(semi, [r, r, r], rtol=1e-9)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)

    def test_solid_box_round_trip(self):
        from drake_tpu.viz.visualization import inertia_ellipsoid

        # solid box with half-extents (a, b, c): Ixx = m (b^2+c^2)/3 ->
        # equivalent ellipsoid semi-axes sqrt(5/3) * half-extents
        m = 1.5
        h = np.array([0.1, 0.2, 0.3])
        Ixx = m * (h[1] ** 2 + h[2] ** 2) / 3
        Iyy = m * (h[2] ** 2 + h[0] ** 2) / 3
        Izz = m * (h[0] ** 2 + h[1] ** 2) / 3
        semi, R = inertia_ellipsoid(m, np.diag([Ixx, Iyy, Izz]))
        # eigh sorts the moments, so the axes come back permuted — but the
        # permutation is recorded in R; compare as sets and check pairing
        np.testing.assert_allclose(
            sorted(semi), sorted(np.sqrt(5.0 / 3.0) * h), rtol=1e-9)
        # the ellipsoid's inertia in the body frame reproduces the input:
        # I_body = R I_principal R^T with I_principal from the semi-axes
        a2 = semi**2
        Ip = m / 5.0 * np.diag([a2[1] + a2[2], a2[2] + a2[0], a2[0] + a2[1]])
        np.testing.assert_allclose(
            R @ Ip @ R.T, np.diag([Ixx, Iyy, Izz]), atol=1e-12)

    def test_publish_smoke(self):
        import jax.numpy as jnp

        from drake_tpu.multibody.model import ModelBuilder
        from drake_tpu.viz.meshcat import Meshcat
        from drake_tpu.viz.visualization import add_inertia_visualization

        b = ModelBuilder()
        b.add_body("b1", parent=None, joint_type="revolute", mass=1.0,
                   inertia_com=np.diag([0.1, 0.2, 0.25]))
        model, params = b.build(jnp.float64)
        viz = Meshcat()
        add_inertia_visualization(viz, model, params)
        assert any("inertia/body0" in p for p in viz._objects)


class TestMpmVisualization:
    """The fork's MpmPortData/DrakeVisualizer-MPM role
    (geometry/meshcat_visualizer.h, drake_visualizer.h)."""

    def _frames(self, n=5, pts=20):
        rng = np.random.default_rng(7)
        base = rng.random((pts, 3)).astype(np.float32)
        return [base + 0.01 * k for k in range(n)]

    def test_publish_particles_height_colormap(self):
        from drake_tpu.viz import mpm_visualization as mviz

        m = Meshcat()
        mviz.publish_mpm_particles(m, "mpm/cloud", self._frames(1)[0])
        d = mp.unpackb(next(iter(m._objects.values())))
        obj = d["object"]
        assert obj["object"]["type"] == "Points"
        attrs = obj["geometries"][0]["data"]["attributes"]
        # (n, 3) input was transposed to meshcat's (3, n) convention and a
        # height colormap was attached.
        assert attrs["position"]["itemSize"] == 3
        assert "color" in attrs

    def test_publish_cloth_mesh(self):
        from drake_tpu.viz import mpm_visualization as mviz

        m = Meshcat()
        verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        faces = np.asarray([[0, 1, 2]], np.int64)
        mviz.publish_mpm_cloth(m, "mpm/cloth", verts, faces)
        d = mp.unpackb(next(iter(m._objects.values())))
        idx = d["object"]["geometries"][0]["data"]["index"]
        assert idx["type"] == "Uint32Array"

    def test_record_rollout_visibility_tracks(self):
        from drake_tpu.viz import mpm_visualization as mviz

        m = Meshcat()
        frames = self._frames(4)
        anim = mviz.record_mpm_rollout(m, "mpm/cloud", frames,
                                       frames_per_second=8.0)
        # One object per frame, only frame0 visible pre-play.
        assert sum("mpm/cloud/frame" in p for p in m._objects) == 4
        d = mp.unpackb(m._animation)
        tracks = {a["path"]: a["clip"]["tracks"] for a in d["animations"]}
        t0 = tracks["/drake_tpu/mpm/cloud/frame0"][0]
        assert t0["name"] == ".visible" and t0["type"] == "boolean"
        # frame1: off at 0, on at 1, off at 2.
        t1 = tracks["/drake_tpu/mpm/cloud/frame1"][0]
        keys = {k["time"]: k["value"] for k in t1["keys"]}
        assert keys == {0: False, 1: True, 2: False}
        # last frame stays on (no off-key after it).
        t3 = tracks["/drake_tpu/mpm/cloud/frame3"][0]
        assert max(k["time"] for k in t3["keys"]) == 3

    def test_record_composes_with_rigid_animation(self):
        from drake_tpu.viz import mpm_visualization as mviz

        m = Meshcat()
        anim = MeshcatAnimation(frames_per_second=8.0)
        anim.set_transform(0, "plant/body0", p=(0, 0, 0))
        frames = self._frames(3)
        faces = np.asarray([[0, 1, 2]], np.uint32)
        out = mviz.record_mpm_rollout(
            m, "mpm/cloth", frames, faces=faces, animation=anim,
            publish=False)
        assert out is anim
        assert m._animation is None  # deferred publish
        m.set_animation(anim)
        d = mp.unpackb(m._animation)
        paths = {a["path"] for a in d["animations"]}
        assert "/drake_tpu/plant/body0" in paths
        assert "/drake_tpu/mpm/cloth/frame2" in paths

    def test_max_frames_stride(self):
        from drake_tpu.viz import mpm_visualization as mviz

        m = Meshcat()
        mviz.record_mpm_rollout(m, "mpm/c", self._frames(30), max_frames=10)
        assert sum("mpm/c/frame" in p for p in m._objects) == 10
