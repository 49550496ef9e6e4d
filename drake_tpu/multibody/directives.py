"""Model directives: composing multi-robot scenes from YAML (.dmd.yaml).

Re-derivation of the reference's model-directives pipeline
(multibody/parsing/model_directives.h schema;
process_model_directives.h ProcessModelDirectives): a YAML program of
  - add_model        {name, file, default_joint_positions?}
  - add_frame        {name, X_PF: {base_frame, translation?, rotation?}}
  - add_weld         {parent, child, X_PC?}
  - add_directives   {file, model_namespace?}   (recursive include)
executed against a growing model.  Bodies/joints/frames are namespaced
``model_name::element`` exactly like ModelInstance scoping in the reference.

TPU-native shape: directives run entirely on the host at build time and
produce ONE merged (MultibodyModel, MultibodyParams) — a flat static
topology whose arrays concatenate the sub-models.  Welds re-parent a
sub-model's root body and overwrite its X_PJ row, so the merged tree keeps
the parent[i] < i topological invariant (sub-models only ever weld to
earlier-added models, as in the reference's sequential directive order).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
import yaml

from drake_tpu.multibody.model import (
    FLOATING,
    WELD,
    MultibodyModel,
    MultibodyParams,
)


# --------------------------------------------------------------------------
# YAML schema helpers
# --------------------------------------------------------------------------


class _RpyTag:
    def __init__(self, deg):
        self.deg = np.asarray(deg, np.float64)


def _rpy_constructor(loader, node):
    mapping = loader.construct_mapping(node, deep=True)
    return _RpyTag(mapping.get("deg", [0.0, 0.0, 0.0]))


class _DirectivesLoader(yaml.SafeLoader):
    pass


_DirectivesLoader.add_constructor("!Rpy", _rpy_constructor)


def _rotation_matrix(rotation) -> np.ndarray:
    """rotation: None | !Rpy {deg: [r,p,y]} | {deg: [...]} | 3x3 list."""
    if rotation is None:
        return np.eye(3)
    if isinstance(rotation, _RpyTag):
        deg = rotation.deg
    elif isinstance(rotation, dict) and "deg" in rotation:
        deg = np.asarray(rotation["deg"], np.float64)
    else:
        return np.asarray(rotation, np.float64).reshape(3, 3)
    r, p, y = np.deg2rad(deg)
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


@dataclasses.dataclass
class _Frame:
    body: int  # -1 = world
    R: np.ndarray  # X_BF rotation
    p: np.ndarray  # X_BF translation


@dataclasses.dataclass
class DirectivesResult:
    model: MultibodyModel
    params: MultibodyParams
    frames: Dict[str, _Frame]
    # scoped joint name -> default position value(s)
    default_positions: Dict[str, np.ndarray]
    model_names: List[str]

    def default_state(self, dtype=jnp.float32):
        """Model default state with the directives' default_joint_positions
        applied (the reference applies them at ProcessModelDirectives time)."""
        x = np.array(self.model.default_state(dtype))
        qoff = self.model.q_offsets
        for jname, val in self.default_positions.items():
            i = self.model.joint_names.index(jname)
            v = np.atleast_1d(np.asarray(val, x.dtype))
            x[qoff[i] : qoff[i] + v.shape[0]] = v
        return jnp.asarray(x)


# --------------------------------------------------------------------------
# Model merge machinery
# --------------------------------------------------------------------------


class _MergedModel:
    def __init__(self, gravity, dtype):
        self.parent: List[int] = []
        self.types: List[str] = []
        self.body_names: List[str] = []
        self.joint_names: List[str] = []
        self.rows: List[dict] = []  # per-body numeric rows (numpy)
        self.gravity = np.asarray(gravity, np.float64)
        self.dtype = dtype
        self.frames: Dict[str, _Frame] = {}
        self.default_positions: Dict[str, np.ndarray] = {}
        self.model_names: List[str] = []

    def add_model(self, name: str, model: MultibodyModel,
                  params: MultibodyParams):
        base = len(self.parent)
        self.model_names.append(name)
        for i in range(model.num_bodies):
            p = model.parent[i]
            self.parent.append(p if p < 0 else base + p)
            self.types.append(model.joint_types[i])
            self.body_names.append(f"{name}::{model.body_names[i]}")
            self.joint_names.append(f"{name}::{model.joint_names[i]}")
            self.rows.append(
                dict(
                    mass=np.asarray(params.mass[i], np.float64),
                    com=np.asarray(params.com[i], np.float64),
                    inertia_com=np.asarray(params.inertia_com[i], np.float64),
                    X_PJ_R=np.asarray(params.X_PJ_R[i], np.float64),
                    X_PJ_p=np.asarray(params.X_PJ_p[i], np.float64),
                    axis=np.asarray(params.axis[i], np.float64),
                    damping=np.asarray(params.damping[i], np.float64),
                    screw_pitch=np.asarray(params.screw_pitch[i], np.float64),
                )
            )

    def resolve_frame(self, name: str) -> _Frame:
        """'world', a registered frame, or a scoped body name."""
        if name == "world":
            return _Frame(body=-1, R=np.eye(3), p=np.zeros(3))
        if name in self.frames:
            return self.frames[name]
        if name in self.body_names:
            return _Frame(body=self.body_names.index(name), R=np.eye(3),
                          p=np.zeros(3))
        raise ValueError(f"unknown frame {name!r}")

    def add_frame(self, name: str, base_frame: str, R: np.ndarray,
                  p: np.ndarray):
        base = self.resolve_frame(base_frame)
        self.frames[name] = _Frame(
            body=base.body, R=base.R @ R, p=base.p + base.R @ p
        )

    def weld(self, parent: str, child: str, R_PC: np.ndarray,
             p_PC: np.ndarray):
        """Re-parent the child model's root body onto the parent frame."""
        pf = self.resolve_frame(parent)
        ci = self.body_names.index(child)
        if self.parent[ci] >= 0:
            raise ValueError(
                f"add_weld child {child!r} is not a root body (its parent is "
                f"{self.body_names[self.parent[ci]]!r})"
            )
        if pf.body >= ci:
            raise ValueError(
                f"add_weld would break topological order: parent body "
                f"{parent!r} (index {pf.body}) comes after child {child!r} "
                f"(index {ci}); order directives parent-first"
            )
        if self.types[ci] not in (WELD, FLOATING):
            raise ValueError(f"child root {child!r} has joint {self.types[ci]}")
        self.parent[ci] = pf.body
        self.types[ci] = WELD
        self.rows[ci]["X_PJ_R"] = pf.R @ R_PC
        self.rows[ci]["X_PJ_p"] = pf.p + pf.R @ p_PC

    def build(self) -> Tuple[MultibodyModel, MultibodyParams]:
        model = MultibodyModel(
            parent=tuple(self.parent),
            joint_types=tuple(self.types),
            body_names=tuple(self.body_names),
            joint_names=tuple(self.joint_names),
        )
        dt = self.dtype
        params = MultibodyParams(
            mass=jnp.asarray(np.array([r["mass"] for r in self.rows]), dt),
            com=jnp.asarray(np.stack([r["com"] for r in self.rows]), dt),
            inertia_com=jnp.asarray(
                np.stack([r["inertia_com"] for r in self.rows]), dt),
            X_PJ_R=jnp.asarray(
                np.stack([r["X_PJ_R"] for r in self.rows]), dt),
            X_PJ_p=jnp.asarray(
                np.stack([r["X_PJ_p"] for r in self.rows]), dt),
            axis=jnp.asarray(np.stack([r["axis"] for r in self.rows]), dt),
            damping=jnp.asarray(
                np.array([r["damping"] for r in self.rows]), dt),
            gravity=jnp.asarray(self.gravity, dt),
            screw_pitch=jnp.asarray(
                np.array([r["screw_pitch"] for r in self.rows]), dt),
        )
        return model, params


# --------------------------------------------------------------------------
# Directive execution
# --------------------------------------------------------------------------


def _resolve_file(file_ref: str, base_dir: str,
                  package_map: Optional[Dict[str, str]]) -> str:
    if file_ref.startswith("package://"):
        rest = file_ref[len("package://"):]
        pkg, _, rel = rest.partition("/")
        if not package_map or pkg not in package_map:
            raise ValueError(f"unresolved package {pkg!r} in {file_ref!r}")
        return os.path.join(package_map[pkg], rel)
    if os.path.isabs(file_ref):
        return file_ref
    return os.path.join(base_dir, file_ref)


def _parse_model_file(path: str, floating_base: bool, dtype):
    from drake_tpu.multibody import parsing, parsing_mjcf, parsing_sdf

    ext = os.path.splitext(path)[1].lower()
    if ext == ".urdf":
        return parsing.parse_urdf(path, floating_base=floating_base,
                                  dtype=dtype)
    if ext == ".sdf":
        return parsing_sdf.parse_sdf(path, floating_base=floating_base,
                                     dtype=dtype)
    if ext in (".xml", ".mjcf"):
        model, params, _geoms = parsing_mjcf.parse_mjcf(path, dtype=dtype)
        return model, params
    raise ValueError(f"unsupported model file type {ext!r} ({path})")


def _run_directives(doc: dict, merged: _MergedModel, base_dir: str,
                    package_map, namespace: str, dtype) -> None:
    def scoped(name: str) -> str:
        return f"{namespace}::{name}" if namespace else name

    for entry in doc.get("directives", []):
        if "add_model" in entry:
            d = entry["add_model"]
            name = scoped(d["name"])
            path = _resolve_file(d["file"], base_dir, package_map)
            floating = bool(d.get("floating_base", False))
            model, params = _parse_model_file(path, floating, dtype)
            merged.add_model(name, model, params)
            for jname, val in (d.get("default_joint_positions") or {}).items():
                merged.default_positions[f"{name}::{jname}"] = np.asarray(
                    val, np.float64
                )
        elif "add_frame" in entry:
            d = entry["add_frame"]
            xpf = d.get("X_PF", {})
            merged.add_frame(
                scoped(d["name"]),
                scoped(xpf["base_frame"])
                if xpf.get("base_frame", "world") != "world" else "world",
                _rotation_matrix(xpf.get("rotation")),
                np.asarray(xpf.get("translation", [0, 0, 0]), np.float64),
            )
        elif "add_weld" in entry:
            d = entry["add_weld"]
            xpc = d.get("X_PC", {})
            parent = d["parent"]
            if parent != "world":
                parent = scoped(parent)
            merged.weld(
                parent,
                scoped(d["child"]),
                _rotation_matrix(xpc.get("rotation")),
                np.asarray(xpc.get("translation", [0, 0, 0]), np.float64),
            )
        elif "add_directives" in entry:
            d = entry["add_directives"]
            path = _resolve_file(d["file"], base_dir, package_map)
            with open(path) as f:
                sub = yaml.load(f, Loader=_DirectivesLoader)
            ns = d.get("model_namespace")
            sub_ns = scoped(ns) if ns else namespace
            _run_directives(sub, merged, os.path.dirname(path), package_map,
                            sub_ns, dtype)
        else:
            raise ValueError(f"unknown directive {sorted(entry)!r}")


def process_model_directives(
    source: str,
    *,
    package_map: Optional[Dict[str, str]] = None,
    gravity=(0.0, 0.0, -9.81),
    dtype=jnp.float32,
) -> DirectivesResult:
    """Execute a .dmd.yaml directives program (path or YAML string).

    Returns the merged model/params plus the frame registry, scoped default
    joint positions, and model-instance names (ProcessModelDirectives +
    GetScopedFrameByName roles).
    """
    if "\n" in source or source.lstrip().startswith("directives"):
        doc = yaml.load(source, Loader=_DirectivesLoader)
        base_dir = os.getcwd()
    else:
        with open(source) as f:
            doc = yaml.load(f, Loader=_DirectivesLoader)
        base_dir = os.path.dirname(os.path.abspath(source))

    merged = _MergedModel(gravity, dtype)
    _run_directives(doc, merged, base_dir, package_map, "", dtype)
    model, params = merged.build()
    return DirectivesResult(
        model=model,
        params=params,
        frames=dict(merged.frames),
        default_positions=dict(merged.default_positions),
        model_names=list(merged.model_names),
    )
