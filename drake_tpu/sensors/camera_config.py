"""CameraConfig — YAML-able camera specification.

Re-derivation of systems/sensors/camera_config.h: a serializable struct
(width/height/focal-or-fov, clipping, pose, fps, rgb/depth/label toggles,
name) that a scenario YAML carries and that expands into a working sensor.
Here it expands into the SDF sphere-tracing camera (sensors/camera.py):
``make_camera()`` returns (CameraInfo, X_WC) and ``render_fn()`` a jittable
closure — the ApplyCameraConfig role (camera_config_functions.h) without a
diagram to mutate.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import numpy as np

from drake_tpu.io.config import load_yaml, save_yaml
from drake_tpu.sensors.camera import CameraInfo, look_at, render


@dataclasses.dataclass
class CameraConfig:
    """camera_config.h field set (the subset our render path consumes;
    renderer_name/backend fields are N/A — there is one engine)."""

    name: str = "preview_camera"
    width: int = 640
    height: int = 480
    # Either an explicit focal length (pixels, y-axis) or a vertical fov.
    focal_y: Optional[float] = None
    fov_y_degrees: float = 45.0
    clipping_near: float = 0.01
    clipping_far: float = 10.0
    fps: float = 10.0
    rgb: bool = True
    depth: bool = False
    label: bool = False
    # Camera pose: world-frame eye/target (the X_PB role, parameterized the
    # way every example actually authors it).
    eye: Tuple[float, float, float] = (1.5, 0.0, 1.0)
    target: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    up: Tuple[float, float, float] = (0.0, 0.0, 1.0)

    def fov_y(self) -> float:
        """Vertical field of view in radians (focal overrides fov)."""
        if self.focal_y is not None:
            return 2.0 * math.atan2(self.height / 2.0, self.focal_y)
        return math.radians(self.fov_y_degrees)

    def make_camera(self):
        """(CameraInfo, X_WC) for sensors.camera.render."""
        info = CameraInfo(
            width=self.width, height=self.height, fov_y=self.fov_y()
        )
        X_WC = look_at(
            np.asarray(self.eye, float),
            np.asarray(self.target, float),
            np.asarray(self.up, float),
        )
        return info, X_WC

    def render_fn(self, geoms: Sequence, model=None, params=None):
        """Jittable q -> RenderResult closure over this config's camera
        (the RgbdSensor output-port role)."""
        info, X_WC = self.make_camera()

        def fn(q=None):
            return render(
                geoms, info, X_WC, model=model, params=params, q=q,
                max_depth=self.clipping_far,
            )

        return fn

    # -- YAML round trip (camera_config.h Serialize role) -----------------

    def to_yaml(self, path: Optional[str] = None) -> str:
        return save_yaml(self, path)

    @staticmethod
    def from_yaml(source: str) -> "CameraConfig":
        return load_yaml(CameraConfig, source)
