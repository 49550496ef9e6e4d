"""CameraConfig (systems/sensors/camera_config.h role): YAML round trip +
expansion into the working SDF camera."""

import jax.numpy as jnp
import numpy as np

from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry
from drake_tpu.sensors.camera_config import CameraConfig


class TestCameraConfig:
    def test_yaml_round_trip(self):
        cfg = CameraConfig(
            name="wrist_cam", width=320, height=240, fov_y_degrees=60.0,
            fps=30.0, depth=True, eye=(0.5, 0.2, 0.8),
        )
        text = cfg.to_yaml()
        back = CameraConfig.from_yaml(text)
        assert back == cfg

    def test_focal_overrides_fov(self):
        cfg = CameraConfig(height=480, focal_y=480.0)
        info, _ = cfg.make_camera()
        fy = info.focal[1]
        np.testing.assert_allclose(fy, 480.0, rtol=1e-6)

    def test_render_fn_sees_sphere(self):
        cfg = CameraConfig(
            width=64, height=48, eye=(1.0, 0.0, 0.0), target=(0.0, 0.0, 0.0),
            clipping_far=5.0,
        )
        geoms = [
            CollisionGeometry(
                name="ball", body=-1, shape=sh.Sphere(0.2),
            )
        ]
        result = cfg.render_fn(geoms)()
        labels = np.asarray(result.label)
        # The ball fills the image center; background is label -1.
        assert labels[24, 32] == 0
        assert labels[0, 0] == -1
        depth = float(np.asarray(result.depth)[24, 32])
        np.testing.assert_allclose(depth, 0.8, atol=0.02)
