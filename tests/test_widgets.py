"""Meshcat widgets: sliders/buttons protocol, JointSliders, ContactVisualizer
(reference meshcat.h AddSlider/AddButton, multibody/meshcat/joint_sliders.h,
contact_visualizer.h roles)."""

import base64
import hashlib
import socket
import time

import jax.numpy as jnp
import numpy as np

from drake_tpu.viz import msgpack as mp
from drake_tpu.viz.meshcat import Meshcat, mask_client_frame, ws_parse_frames
from drake_tpu.viz.widgets import ContactVisualizer, JointSliders


def _connect_ws(port):
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
    return c, rest


class TestControls:
    def test_slider_roundtrip_over_websocket(self):
        m = Meshcat()
        m.add_slider("gain", 0.0, 2.0, 0.01, 0.5)
        assert m.get_slider_value("gain") == 0.5
        port = m.serve()
        try:
            c, rest = _connect_ws(port)
            # Initial state push includes the control.
            while not any(
                mp.unpackb(f).get("type") == "set_control"
                for f in ws_parse_frames(rest)
            ):
                rest += c.recv(4096)
            time.sleep(0.1)  # let the server register the client reader
            # Client moves the slider -> server-side value updates.
            c.sendall(mask_client_frame(mp.packb(
                {"type": "set_control_value", "name": "gain", "value": 1.25})))
            deadline = time.monotonic() + 5
            while (m.get_slider_value("gain") != 1.25
                   and time.monotonic() < deadline):
                time.sleep(0.02)
            assert m.get_slider_value("gain") == 1.25
            # Out-of-range values clamp.
            c.sendall(mask_client_frame(mp.packb(
                {"type": "set_control_value", "name": "gain", "value": 99.0})))
            deadline = time.monotonic() + 5
            while (m.get_slider_value("gain") != 2.0
                   and time.monotonic() < deadline):
                time.sleep(0.02)
            assert m.get_slider_value("gain") == 2.0
            c.close()
        finally:
            m.close()

    def test_button_clicks(self):
        m = Meshcat()
        m.add_button("reset")
        assert m.get_button_clicks("reset") == 0
        m._handle_client_message(mp.packb({"type": "button", "name": "reset"}))
        m._handle_client_message(mp.packb({"type": "button", "name": "reset"}))
        assert m.get_button_clicks("reset") == 2

    def test_delete_added_controls(self):
        m = Meshcat()
        m.add_slider("a")
        m.add_button("b")
        m.delete_added_controls()
        assert m._controls == {}

    def test_set_slider_value_clamps(self):
        m = Meshcat()
        m.add_slider("x", -1.0, 1.0)
        assert m.set_slider_value("x", 5.0) == 1.0


class TestJointSliders:
    def _model(self):
        from drake_tpu.multibody.model import ModelBuilder

        b = ModelBuilder()
        b.add_body("shoulder", parent=None, joint_type="revolute", mass=1.0)
        b.add_body("slide", parent="shoulder", joint_type="prismatic",
                   mass=0.5)
        return b.build(jnp.float64)

    def test_value_tracks_sliders(self):
        model, params = self._model()
        m = Meshcat()
        js = JointSliders(m, model, params, q0=np.array([0.1, 0.2]))
        np.testing.assert_allclose(js.value(), [0.1, 0.2])
        m._handle_client_message(mp.packb(
            {"type": "set_control_value", "name": js._slider_names[0],
             "value": 0.7}))
        np.testing.assert_allclose(js.value(), [0.7, 0.2])

    def test_set_positions(self):
        model, params = self._model()
        m = Meshcat()
        js = JointSliders(m, model, params)
        js.set_positions(np.array([-0.5, 0.3]))
        np.testing.assert_allclose(js.value(), [-0.5, 0.3])


class TestContactVisualizer:
    def test_publish_draws_and_culls(self):
        m = Meshcat()
        cv = ContactVisualizer(m, min_force=0.1)
        pts = np.array([[0, 0, 0], [1, 0, 0]])
        f = np.array([[0, 0, 40.0], [0, 0, 1e-4]])  # second below threshold
        n = cv.publish(pts, f)
        assert n == 1
        assert any("contact_forces" in p for p in m._objects)

    def test_all_culled_deletes_path(self):
        m = Meshcat()
        cv = ContactVisualizer(m, min_force=1.0)
        cv.publish(np.zeros((1, 3)), np.full((1, 3), 1e-3))
        assert not any("contact_forces" in p for p in m._objects)
