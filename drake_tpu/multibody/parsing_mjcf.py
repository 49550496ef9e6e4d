"""MJCF (MuJoCo XML) parsing: host-side model ingestion to static arrays.

Re-derivation of Drake's MJCF parser (reference:
multibody/parsing/parser.h:30-33 format table, detail_mujoco_parser.cc)
scoped to the robot subset: nested <worldbody>/<body> trees with hinge /
slide / ball / free joints, <compiler angle=...> handling, <default> class
inheritance for joints and geoms, explicit <inertial> or geom-derived
inertia (sphere / capsule / cylinder / box with density), and geom
extraction for collision scenes.

Frame mapping (the one real translation step): an MJCF joint lives INSIDE
its child body, anchored at ``pos`` in the body frame, while this engine's
joint model is X_PB(q) = X_PJ . X_J(q) with the child frame rooted at the
joint.  Each MJCF body is therefore re-rooted at its (single) joint anchor:
com / geoms / child bodies shift by -joint_pos.  Multiple joints in one
body expand into a chain through massless intermediate bodies (same
technique as the universal joint in model.py).
"""

from __future__ import annotations

import dataclasses
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from drake_tpu.math import rotations as rot
from drake_tpu.multibody.model import (
    BALL,
    FLOATING,
    PRISMATIC,
    REVOLUTE,
    WELD,
    ModelBuilder,
    MultibodyModel,
    MultibodyParams,
)

_JOINT_MAP = {"hinge": REVOLUTE, "slide": PRISMATIC, "ball": BALL,
              "free": FLOATING}


@dataclasses.dataclass
class MjcfGeom:
    """A collision/visual geom attached to a body (in the re-rooted body
    frame), for feeding drake_tpu.geometry scenes."""

    body: str
    name: str
    type: str  # sphere | capsule | cylinder | box | plane
    size: np.ndarray
    pos: np.ndarray
    R: np.ndarray  # (3,3) rotation in body frame
    friction: float


def _floats(s, n=None, default=None):
    if s is None:
        return default
    v = np.fromstring(s, sep=" ")
    if n is not None and v.size < n:
        v = np.concatenate([v, np.zeros(n - v.size)])
    return v


def _quat_to_R(q):
    return np.asarray(
        rot.quat_to_rotation(
            jnp.asarray(q / np.linalg.norm(q), jnp.float64)
        )
    )


class _Ctx:
    """Parsed <compiler> + <default> state."""

    def __init__(self, root):
        comp = root.find("compiler")
        self.deg = (comp is None) or (comp.get("angle", "degree") == "degree")
        # default class tree: class name -> {tag -> merged attrib dict}
        self.defaults: Dict[str, Dict[str, dict]] = {}
        top = root.find("default")
        if top is not None:
            self._walk_defaults(top, {}, "main")

    def _walk_defaults(self, el, inherited, name):
        merged = {k: dict(v) for k, v in inherited.items()}
        for child in el:
            if child.tag == "default":
                continue
            d = merged.setdefault(child.tag, {})
            d.update(child.attrib)
        self.defaults[name] = merged
        for child in el.findall("default"):
            self._walk_defaults(child, merged, child.get("class", "main"))

    def attrs(self, el, childclass: Optional[str]) -> dict:
        """Element attributes merged over its default class chain."""
        cls = el.get("class") or childclass or "main"
        base = dict(self.defaults.get(cls, {}).get(el.tag, {}))
        base.update(el.attrib)
        return base

    def angle(self, x):
        return np.deg2rad(x) if self.deg else x

    def orient_R(self, a: dict) -> np.ndarray:
        if "quat" in a:
            return _quat_to_R(_floats(a["quat"], 4))
        if "euler" in a:
            e = self.angle(_floats(a["euler"], 3))
            # MJCF default eulerseq "xyz" (extrinsic) == intrinsic ZYX
            # reversed; MuJoCo applies rotations about the axes of the
            # PARENT frame in sequence: R = Rz(e3)? No: extrinsic xyz means
            # R = Rx(e1) then Ry(e2) then Rz(e3) about fixed axes:
            # R = Rz(e3) Ry(e2) Rx(e1) — that is exactly rpy_to_rotation.
            return np.asarray(
                rot.rpy_to_rotation(jnp.asarray(e, jnp.float64))
            )
        if "axisangle" in a:
            v = _floats(a["axisangle"], 4)
            ax = v[:3] / max(np.linalg.norm(v[:3]), 1e-12)
            return np.asarray(
                rot.axis_angle_to_rotation(
                    jnp.asarray(ax, jnp.float64), float(self.angle(v[3]))
                )
            )
        if "zaxis" in a:
            z = _floats(a["zaxis"], 3)
            z = z / max(np.linalg.norm(z), 1e-12)
            # Minimal rotation taking +z to z.
            e = np.array([0.0, 0.0, 1.0])
            v = np.cross(e, z)
            c = float(e @ z)
            if np.linalg.norm(v) < 1e-12:
                return np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
            vx = np.array(
                [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]]
            )
            return np.eye(3) + vx + vx @ vx / (1.0 + c)
        return np.eye(3)


def _geom_inertia(a: dict, ctx) -> Tuple[float, np.ndarray, np.ndarray, str,
                                         np.ndarray, np.ndarray]:
    """(mass, com, I_com, type, size, pos) for a geom dict with density."""
    gtype = a.get("type", "sphere")
    size = _floats(a.get("size"), default=np.zeros(3))
    pos = _floats(a.get("pos"), 3, default=np.zeros(3))
    density = float(a.get("density", "1000"))
    R = ctx.orient_R(a)

    fromto = _floats(a.get("fromto"))
    half_len = 0.0
    if fromto is not None:
        p1, p2 = fromto[:3], fromto[3:6]
        pos = 0.5 * (p1 + p2)
        d = p2 - p1
        half_len = 0.5 * float(np.linalg.norm(d))
        z = d / max(np.linalg.norm(d), 1e-12)
        a2 = dict(a)
        a2["zaxis"] = f"{z[0]} {z[1]} {z[2]}"
        a2.pop("quat", None), a2.pop("euler", None)
        R = ctx.orient_R(a2)

    if gtype == "sphere":
        r = float(size[0])
        m = density * 4.0 / 3.0 * np.pi * r**3
        I = np.eye(3) * (2.0 / 5.0 * m * r * r)
    elif gtype in ("capsule", "cylinder"):
        r = float(size[0])
        hl = half_len if fromto is not None else float(size[1])
        if gtype == "cylinder":
            m = density * np.pi * r * r * (2 * hl)
            izz = 0.5 * m * r * r
            ixx = m * (3 * r * r + (2 * hl) ** 2) / 12.0
            I = np.diag([ixx, ixx, izz])
        else:
            mc = density * np.pi * r * r * (2 * hl)  # cylinder part
            ms = density * 4.0 / 3.0 * np.pi * r**3  # two hemispheres
            m = mc + ms
            izz = 0.5 * mc * r * r + 0.4 * ms * r * r
            ixx = (
                mc * (3 * r * r + (2 * hl) ** 2) / 12.0
                + ms * (0.4 * r * r + hl * hl + 0.75 * hl * r)
            )
            I = np.diag([ixx, ixx, izz])
        I = R @ I @ R.T
        if gtype == "capsule" and fromto is None:
            pass
    elif gtype == "box":
        sx, sy, sz = size[:3]  # half-sizes
        m = density * 8.0 * sx * sy * sz
        I = (
            np.diag(
                [
                    (sy * sy + sz * sz),
                    (sx * sx + sz * sz),
                    (sx * sx + sy * sy),
                ]
            )
            * m
            / 3.0
        )
        I = R @ I @ R.T
    else:  # plane, mesh, ... : massless for inertia purposes
        m, I = 0.0, np.zeros((3, 3))
    return m, pos, I, gtype, size, pos


def parse_mjcf(
    source: str,
    *,
    gravity=(0.0, 0.0, -9.81),
    dtype=jnp.float32,
) -> Tuple[MultibodyModel, MultibodyParams, List[MjcfGeom]]:
    """Parse an MJCF file path or XML string.

    Returns (model, params, geoms); geoms are expressed in the re-rooted
    body frames, ready for scene construction.
    """
    if source.lstrip().startswith("<"):
        root = ET.fromstring(source)
    else:
        root = ET.parse(source).getroot()
    ctx = _Ctx(root)

    opt = root.find("option")
    if opt is not None and opt.get("gravity") is not None:
        gravity = tuple(_floats(opt.get("gravity"), 3))

    builder = ModelBuilder(gravity=gravity)
    geoms_out: List[MjcfGeom] = []

    world = root.find("worldbody")
    if world is None:
        raise ValueError("MJCF has no <worldbody>")

    for g in world.findall("geom"):
        a = ctx.attrs(g, None)
        geoms_out.append(
            MjcfGeom(
                body="world",
                name=a.get("name", "world_geom"),
                type=a.get("type", "plane"),
                size=_floats(a.get("size"), default=np.zeros(3)),
                pos=_floats(a.get("pos"), 3, default=np.zeros(3)),
                R=ctx.orient_R(a),
                friction=float(
                    _floats(a.get("friction"), default=np.array([1.0]))[0]
                ),
            )
        )

    def body_mass_props(body_el, childclass):
        """Explicit <inertial> or summed geom-derived inertia."""
        inertial = body_el.find("inertial")
        if inertial is not None:
            m = float(inertial.get("mass", "0"))
            com = _floats(inertial.get("pos"), 3, default=np.zeros(3))
            Ri = ctx.orient_R(inertial.attrib)
            if inertial.get("diaginertia") is not None:
                I = np.diag(_floats(inertial.get("diaginertia"), 3))
            elif inertial.get("fullinertia") is not None:
                f = _floats(inertial.get("fullinertia"), 6)
                I = np.array(
                    [
                        [f[0], f[3], f[4]],
                        [f[3], f[1], f[5]],
                        [f[4], f[5], f[2]],
                    ]
                )
            else:
                I = np.zeros((3, 3))
            return m, com, Ri @ I @ Ri.T
        # Sum geom inertias (parallel-axis to the combined com).
        parts = []
        for g in body_el.findall("geom"):
            a = ctx.attrs(g, childclass)
            m, gpos, I, *_ = _geom_inertia(a, ctx)
            parts.append((m, gpos, I))
        M = sum(p[0] for p in parts)
        if M <= 0:
            return 0.0, np.zeros(3), np.zeros((3, 3))
        com = sum(p[0] * p[1] for p in parts) / M
        I_tot = np.zeros((3, 3))
        for m, gpos, I in parts:
            d = gpos - com
            I_tot += I + m * ((d @ d) * np.eye(3) - np.outer(d, d))
        return M, com, I_tot

    def add_body(body_el, parent_name: Optional[str], childclass=None,
                 parent_shift=np.zeros(3)):
        childclass = body_el.get("childclass", childclass)
        name = body_el.get("name") or f"body{len(builder._body_names)}"
        # Positions are given in the MJCF parent frame; if the parent was
        # re-rooted at its joint anchor, compensate.
        bpos = (
            _floats(body_el.get("pos"), 3, default=np.zeros(3)) - parent_shift
        )
        bR = ctx.orient_R(body_el.attrib)
        b_rpy = np.asarray(
            rot.rotation_to_rpy(jnp.asarray(bR, jnp.float64))
        )

        joints = body_el.findall("joint")
        if body_el.find("freejoint") is not None:
            joints = [ET.Element("joint", {"type": "free"})] + joints

        mass, com, I_com = body_mass_props(body_el, childclass)

        # Joint chain expansion: all but the last joint get massless
        # intermediate bodies; geometry/inertia live on the last.
        shift = np.zeros(3)  # accumulated re-rooting offset in body frame
        pname = parent_name
        if not joints:
            builder.add_body(
                name,
                parent=pname,
                joint_type=WELD,
                mass=mass,
                com=com,
                inertia_com=I_com,
                X_PJ_rpy=b_rpy,
                X_PJ_xyz=bpos,
                joint_name=f"{name}_weld",
            )
        else:
            for k, j in enumerate(joints):
                a = ctx.attrs(j, childclass)
                jt = _JOINT_MAP[a.get("type", "hinge")]
                jpos = _floats(a.get("pos"), 3, default=np.zeros(3)) - shift
                axis = _floats(a.get("axis"), 3, default=np.array([0, 0, 1.0]))
                n = np.linalg.norm(axis)
                axis = axis / n if n > 0 else axis
                damping = float(a.get("damping", "0"))
                # MJCF "armature" IS reflected rotor inertia (added to the
                # joint-space mass-matrix diagonal); the reference parser
                # only warns-unsupported (detail_mujoco_parser.cc:396-398)
                # — here it maps straight onto reflected_inertia.
                armature = float(a.get("armature", "0"))
                last = k == len(joints) - 1
                is_first = k == 0
                builder.add_body(
                    name if last else f"{name}__j{k}",
                    parent=pname,
                    joint_type=jt,
                    mass=mass if last else 0.0,
                    com=(com - shift - jpos) if last else (0, 0, 0),
                    inertia_com=I_com if last else None,
                    X_PJ_rpy=b_rpy if is_first else (0, 0, 0),
                    X_PJ_xyz=(bpos + bR @ jpos) if is_first else jpos,
                    axis=axis,
                    damping=damping,
                    joint_name=a.get("name", f"{name}_joint{k}"),
                    rotor_inertia=armature,
                )
                pname = name if last else f"{name}__j{k}"
                shift = shift + jpos

        for g in body_el.findall("geom"):
            a = ctx.attrs(g, childclass)
            _, _, _, gtype, size, gpos = _geom_inertia(a, ctx)
            geoms_out.append(
                MjcfGeom(
                    body=name,
                    name=a.get("name", f"{name}_geom"),
                    type=gtype,
                    size=size,
                    pos=gpos - shift,
                    R=ctx.orient_R(a),
                    friction=float(
                        _floats(a.get("friction"), default=np.array([1.0]))[0]
                    ),
                )
            )

        for child in body_el.findall("body"):
            add_body(child, name, childclass, parent_shift=shift)

    for body_el in world.findall("body"):
        add_body(body_el, None)

    model, params = builder.build(dtype)
    return model, params, geoms_out


def mjcf_geoms_to_collision(
    geoms: List[MjcfGeom],
    model: MultibodyModel,
    *,
    default_stiffness: float = 1e6,
    default_dissipation: float = 0.1,
    roles=None,
) -> list:
    """MjcfGeom descriptors -> geometry.scene.CollisionGeometry list.

    The registration half of the reference's MJCF parsing
    (detail_mujoco_parser.cc -> SceneGraph).  MJCF size semantics: sphere
    [r], capsule/cylinder [r, half_length], box = HALF-sizes; plane ->
    HalfSpace (body 'world' -> anchored, body index -1).
    """
    from drake_tpu.geometry import scene_graph
    from drake_tpu.geometry import shapes as sh
    from drake_tpu.geometry.scene import CollisionGeometry

    out = []
    for g in geoms:
        if g.type == "sphere":
            shape = sh.Sphere(float(g.size[0]))
        elif g.type == "capsule":
            shape = sh.Capsule(float(g.size[0]), 2.0 * float(g.size[1]))
        elif g.type == "cylinder":
            shape = sh.Cylinder(float(g.size[0]), 2.0 * float(g.size[1]))
        elif g.type == "box":
            shape = sh.Box(tuple(2.0 * np.asarray(g.size[:3])))
        elif g.type == "ellipsoid":
            shape = sh.Ellipsoid(tuple(np.asarray(g.size[:3])))
        elif g.type == "plane":
            shape = sh.HalfSpace()
        else:  # mesh/ellipsoid/... not supported here
            continue
        body = -1 if g.body == "world" else model.body_index(g.body)
        out.append(
            CollisionGeometry(
                name=g.name, body=body, shape=shape, R_BG=np.asarray(g.R),
                p_BG=np.asarray(g.pos), friction=float(g.friction),
                stiffness=default_stiffness,
                dissipation=default_dissipation,
                roles=scene_graph.ALL_ROLES if roles is None else roles,
            )
        )
    return out
