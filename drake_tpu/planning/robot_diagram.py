"""RobotDiagram / RobotDiagramBuilder — the planning-stack model bundle.

Re-derivation of the reference's planning/robot_diagram.h +
robot_diagram_builder.h: a RobotDiagram is the frozen plant + scene-graph
pair every planning component (CollisionChecker, VisibilityGraph, IRIS)
consumes, and RobotDiagramBuilder is the one-stop construction path (add
models by URDF, add environment geometry, then ``Build()`` freezes it).

TPU shape: the "diagram" is a plain frozen bundle (MultibodyModel,
MultibodyParams, CollisionScene) — everything downstream is a pure function
of (model, params, scene, q), so freezing = just stop mutating.  The
builder wraps the URDF parser and the static-pair scene build, and the
bundle's convenience methods close over the pieces so planners can take ONE
object where the reference takes a RobotDiagram.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from drake_tpu.geometry import collision_checker as cc
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import MultibodyModel, MultibodyParams
from drake_tpu.multibody.parsing import parse_urdf, parse_urdf_geometry


@dataclasses.dataclass(frozen=True)
class RobotDiagram:
    """Frozen plant + scene bundle (planning/robot_diagram.h role)."""

    model: MultibodyModel
    params: MultibodyParams
    scene: CollisionScene

    # -- the CollisionChecker-facing surface ------------------------------

    def check_config(self, q, padding: float = 0.0):
        return cc.check_config(self.model, self.params, self.scene, q, padding)

    def check_configs(self, qs, padding: float = 0.0):
        return cc.check_configs(self.model, self.params, self.scene, qs, padding)

    def check_edge(self, q1, q2, num_samples: int = 16, padding: float = 0.0):
        return cc.check_edge(
            self.model, self.params, self.scene, q1, q2, num_samples, padding
        )

    def min_distance(self, q):
        return cc.min_distance(self.model, self.params, self.scene, q)

    @property
    def num_positions(self) -> int:
        return self.model.num_positions


class RobotDiagramBuilder:
    """Construction path for a RobotDiagram (robot_diagram_builder.h role).

    Usage::

        b = RobotDiagramBuilder()
        b.add_urdf(urdf_text)                 # parser().AddModels role
        b.add_geometry(ground_geom)           # environment geometry
        diagram = b.build()                   # freezes plant + scene
    """

    def __init__(self, dtype=jnp.float64):
        self._dtype = dtype
        self._model: Optional[MultibodyModel] = None
        self._params: Optional[MultibodyParams] = None
        self._geoms: list = []
        self._exclude: list = []
        self._built = False

    def add_urdf(
        self,
        source: str,
        *,
        floating_base: bool = False,
        mesh_dir: Optional[str] = None,
        **geometry_kwargs,
    ) -> "RobotDiagramBuilder":
        """Parse a URDF (path or XML) into the plant AND register its
        collision geometry — the builder.parser().AddModels(...) role."""
        if self._built:
            raise RuntimeError("RobotDiagramBuilder already built")
        if self._model is not None:
            raise NotImplementedError(
                "one robot model per diagram (weld environment geometry "
                "via add_geometry)"
            )
        self._model, self._params = parse_urdf(
            source, floating_base=floating_base, dtype=self._dtype
        )
        self._geoms.extend(
            parse_urdf_geometry(
                source, self._model, mesh_dir=mesh_dir, **geometry_kwargs
            )
        )
        return self

    def set_model(self, model: MultibodyModel, params: MultibodyParams):
        """Install an already-built plant (ModelBuilder path)."""
        if self._built:
            raise RuntimeError("RobotDiagramBuilder already built")
        self._model, self._params = model, params
        return self

    def add_geometry(self, geom: CollisionGeometry) -> "RobotDiagramBuilder":
        """Add one geometry (robot body or world/environment obstacle)."""
        if self._built:
            raise RuntimeError("RobotDiagramBuilder already built")
        self._geoms.append(geom)
        return self

    def exclude_pair(self, name_a: str, name_b: str) -> "RobotDiagramBuilder":
        """Collision-filter a geometry pair by name (filter manager role)."""
        self._exclude.append((name_a, name_b))
        return self

    def build(self, exclude_same_body: bool = True) -> RobotDiagram:
        """Freeze: enumerate the static pair set and return the bundle."""
        if self._model is None:
            raise RuntimeError("no robot model added (add_urdf/set_model)")
        self._built = True
        scene = CollisionScene.build(
            self._geoms,
            exclude_same_body=exclude_same_body,
            exclude=tuple(self._exclude),
            model=self._model,
        )
        return RobotDiagram(model=self._model, params=self._params, scene=scene)
