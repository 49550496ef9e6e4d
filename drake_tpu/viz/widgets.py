"""Interactive Meshcat widgets: joint sliders + contact-force visualization.

Reference: multibody/meshcat/joint_sliders.h (a System that publishes plant
poses from GUI slider values), contact_visualizer.h (per-contact force
arrows).  Here the widgets are plain objects over the drake_tpu Meshcat
bridge: sliders are Meshcat controls (AddSlider protocol), poses publish via
viz.visualization.publish_state, and contact forces render as line segments
scaled by newtons-per-meter.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from drake_tpu.multibody.model import (
    PRISMATIC, REVOLUTE, MultibodyModel, MultibodyParams,
)
from drake_tpu.viz.meshcat import Meshcat
from drake_tpu.viz.visualization import publish_state


class JointSliders:
    """One Meshcat slider per single-dof joint (joint_sliders.h role).

    Multi-dof joints (floating/ball) keep their initial values — matching
    the reference, which exposes per-dof sliders only for the positions it
    can name; here we skip quaternion dofs rather than exposing raw
    components.
    """

    def __init__(self, meshcat: Meshcat, model: MultibodyModel,
                 params: MultibodyParams, geoms: Sequence = (),
                 q0: Optional[np.ndarray] = None,
                 lower: Optional[np.ndarray] = None,
                 upper: Optional[np.ndarray] = None,
                 step: float = 0.01, prefix: str = "plant"):
        self.meshcat = meshcat
        self.model = model
        self.params = params
        self.geoms = geoms
        self.prefix = prefix
        nq = model.num_positions
        self.q0 = np.zeros(nq) if q0 is None else np.asarray(q0, float)
        self._slider_qidx = []
        self._slider_names = []
        for i, jt in enumerate(model.joint_types):
            if jt not in (REVOLUTE, PRISMATIC):
                continue
            qo = model.q_offsets[i]
            name = model.joint_names[i] or f"q{qo}"
            lo = float(lower[qo]) if lower is not None else (
                -np.pi if jt == REVOLUTE else -1.0)
            hi = float(upper[qo]) if upper is not None else (
                np.pi if jt == REVOLUTE else 1.0)
            v0 = float(np.clip(self.q0[qo], lo, hi))
            meshcat.add_slider(name, lo, hi, step, v0)
            self._slider_qidx.append(qo)
            self._slider_names.append(name)

    def value(self) -> np.ndarray:
        """Current q: slider values over the q0 baseline."""
        q = self.q0.copy()
        for qo, name in zip(self._slider_qidx, self._slider_names):
            q[qo] = self.meshcat.get_slider_value(name)
        return q

    def set_positions(self, q) -> None:
        self.q0 = np.asarray(q, float).copy()
        for qo, name in zip(self._slider_qidx, self._slider_names):
            self.meshcat.set_slider_value(name, float(self.q0[qo]))

    def publish(self) -> np.ndarray:
        q = self.value()
        if self.geoms:
            publish_state(self.meshcat, self.model, self.params,
                          jnp.asarray(q), self.geoms, prefix=self.prefix)
        return q

    def run(self, duration_s: float, period_s: float = 0.1,
            stop_button: Optional[str] = None) -> np.ndarray:
        """Poll-and-publish loop (JointSliders::Run role).  Returns final q."""
        if stop_button is not None:
            self.meshcat.add_button(stop_button)
        t_end = time.monotonic() + duration_s
        q = self.value()
        while time.monotonic() < t_end:
            q = self.publish()
            if (stop_button is not None
                    and self.meshcat.get_button_clicks(stop_button) > 0):
                break
            time.sleep(period_s)
        return q


class ContactVisualizer:
    """Draw contact forces as line segments (contact_visualizer.h role)."""

    def __init__(self, meshcat: Meshcat, prefix: str = "contact_forces",
                 newtons_per_meter: float = 40.0, color: int = 0x00CC00,
                 min_force: float = 1e-3):
        self.meshcat = meshcat
        self.prefix = prefix
        self.npm = newtons_per_meter
        self.color = color
        self.min_force = min_force

    def publish(self, points: np.ndarray, forces: np.ndarray) -> int:
        """points (nc, 3) world contact points, forces (nc, 3) Newtons.
        Returns the number of segments drawn (forces below min_force are
        culled, like the reference's force threshold)."""
        points = np.atleast_2d(np.asarray(points, float))
        forces = np.atleast_2d(np.asarray(forces, float))
        mag = np.linalg.norm(forces, axis=1)
        keep = mag >= self.min_force
        if not keep.any():
            self.meshcat.delete(self.prefix)
            return 0
        starts = points[keep].T
        ends = (points[keep] + forces[keep] / self.npm).T
        self.meshcat.set_line_segments(
            self.prefix, starts, ends, color=self.color)
        return int(keep.sum())
