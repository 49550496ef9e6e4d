"""SDFormat parsing — the detail_sdf_parser role.

Re-derivation of the reference's SDF ingestion (reference:
multibody/parsing/detail_sdf_parser.cc via Parser, parser.h:30-33) for the
subset the baseline configs use (e.g. examples/multibody/cart_pole/
cart_pole.sdf, acrobot SDF): <model>/<link> with <inertial> (pose, mass,
inertia), <joint> of type revolute/prismatic/fixed with <parent>/<child>,
<axis><xyz>, damping, limits; link <pose> chaining.

SDF differs from URDF in that link poses are given in the MODEL frame and
joint poses in the CHILD frame; this parser converts to the parent-joint
frame convention of MultibodyModel.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from drake_tpu.math import rotations as rot
from drake_tpu.multibody.model import (
    FLOATING,
    PRISMATIC,
    REVOLUTE,
    WELD,
    ModelBuilder,
    MultibodyModel,
    MultibodyParams,
)

_JOINT_MAP = {
    "revolute": REVOLUTE,
    "prismatic": PRISMATIC,
    "fixed": WELD,
}


def _pose(el) -> Tuple[np.ndarray, np.ndarray]:
    """SDF <pose>x y z roll pitch yaw</pose> -> (xyz, rpy)."""
    if el is None:
        return np.zeros(3), np.zeros(3)
    vals = np.fromstring(el.text, sep=" ")
    return vals[:3], vals[3:6]


def _rot(rpy):
    return np.asarray(rot.rpy_to_rotation(jnp.asarray(rpy, jnp.float64)))


def _compose(Ra, pa, Rb, pb):
    return Ra @ Rb, pa + Ra @ pb


def _invert(R, p):
    return R.T, -R.T @ p


def parse_sdf(
    source: str,
    *,
    floating_base: bool = False,
    gravity=(0.0, 0.0, -9.81),
    dtype=jnp.float32,
) -> Tuple[MultibodyModel, MultibodyParams]:
    """Parse an SDF file path or XML string into (model, params)."""
    if source.lstrip().startswith("<"):
        root = ET.fromstring(source)
    else:
        root = ET.parse(source).getroot()
    model_el = root.find("model") if root.tag != "model" else root
    if model_el is None:
        raise ValueError("no <model> element found")

    links = {}
    for link in model_el.findall("link"):
        name = link.get("name")
        xyz, rpy = _pose(link.find("pose"))
        R_ML, p_ML = _rot(rpy), xyz  # link pose in model frame

        inertial = link.find("inertial")
        mass, com, I_com = 0.0, np.zeros(3), np.zeros((3, 3))
        if inertial is not None:
            mass_el = inertial.find("mass")
            mass = float(mass_el.text) if mass_el is not None else 0.0
            ixyz, irpy = _pose(inertial.find("pose"))
            com = ixyz
            inertia_el = inertial.find("inertia")
            if inertia_el is not None:
                g = lambda tag: float(
                    inertia_el.find(tag).text
                ) if inertia_el.find(tag) is not None else 0.0
                I = np.array(
                    [
                        [g("ixx"), g("ixy"), g("ixz")],
                        [g("ixy"), g("iyy"), g("iyz")],
                        [g("ixz"), g("iyz"), g("izz")],
                    ]
                )
                Rl = _rot(irpy)
                I_com = Rl @ I @ Rl.T
        links[name] = dict(
            R_ML=R_ML, p_ML=p_ML, mass=mass, com=com, I_com=I_com
        )

    joints = []
    child_of = {}
    for j in model_el.findall("joint"):
        jtype = j.get("type")
        if jtype not in _JOINT_MAP:
            raise NotImplementedError(f"sdf joint type {jtype}")
        parent = j.find("parent").text.strip()
        child = j.find("child").text.strip()
        jxyz, jrpy = _pose(j.find("pose"))  # joint pose in CHILD frame
        axis_el = j.find("axis")
        axis = np.array([0.0, 0.0, 1.0])
        damping = 0.0
        lower = upper = None
        if axis_el is not None:
            xyz_el = axis_el.find("xyz")
            if xyz_el is not None:
                axis = np.fromstring(xyz_el.text, sep=" ")
            dyn = axis_el.find("dynamics")
            if dyn is not None and dyn.find("damping") is not None:
                damping = float(dyn.find("damping").text)
            lim = axis_el.find("limit")
            if lim is not None:
                lower = (
                    float(lim.find("lower").text)
                    if lim.find("lower") is not None
                    else None
                )
                upper = (
                    float(lim.find("upper").text)
                    if lim.find("upper") is not None
                    else None
                )
        joints.append(
            dict(
                name=j.get("name"), type=_JOINT_MAP[jtype],
                parent=parent, child=child,
                jxyz=jxyz, jrpy=jrpy, axis=axis, damping=damping,
                lower=lower, upper=upper,
            )
        )
        child_of[child] = joints[-1]

    roots = [n for n in links if n not in child_of and n != "world"]
    builder = ModelBuilder(gravity=gravity)
    limits = {}

    def add(name, parent_body, joint):
        L = links[name]
        if joint is None:
            jt = FLOATING if floating_base else WELD
            # Base link placed at its model-frame pose.
            R_PJ, p_PJ = L["R_ML"], L["p_ML"]
            axis = np.array([0.0, 0.0, 1.0])
            damping = 0.0
            jname = f"{name}_base"
        else:
            jt = joint["type"]
            # Joint frame: child-frame pose joint["jxyz"] in link C.
            # X_PJ = X_PM^-1... X_P C = X_MP^-1 X_MC; joint at X_CJ.
            P = links[joint["parent"]] if joint["parent"] in links else None
            if P is None:  # parent is world
                R_MP, p_MP = np.eye(3), np.zeros(3)
            else:
                R_MP, p_MP = P["R_ML"], P["p_ML"]
            R_MC, p_MC = L["R_ML"], L["p_ML"]
            R_CJ, p_CJ = _rot(joint["jrpy"]), joint["jxyz"]
            R_PM, p_PM = _invert(R_MP, p_MP)
            R_PC, p_PC = _compose(R_PM, p_PM, R_MC, p_MC)
            R_PJ, p_PJ = _compose(R_PC, p_PC, R_CJ, p_CJ)
            # MultibodyModel's child frame = joint frame; shift inertial data
            # into the joint frame: X_JC = X_CJ^-1.
            axis = joint["axis"]
            damping = joint["damping"]
            jname = joint["name"]
            if joint["lower"] is not None or joint["upper"] is not None:
                limits[jname] = (joint["lower"], joint["upper"])

        # Inertial given in the link frame C; if the joint frame J differs
        # from C, express com/inertia in J.
        if joint is not None:
            R_CJ, p_CJ = _rot(joint["jrpy"]), joint["jxyz"]
            R_JC, p_JC = _invert(R_CJ, p_CJ)
            com = p_JC + R_JC @ L["com"]
            I_com = R_JC @ L["I_com"] @ R_JC.T
        else:
            com = L["com"]
            I_com = L["I_com"]

        builder.add_body(
            name,
            parent=parent_body,
            joint_type=jt,
            mass=L["mass"],
            com=com,
            inertia_com=I_com,
            X_PJ_rpy=np.asarray(
                rot.rotation_to_rpy(jnp.asarray(R_PJ, jnp.float64))
            ),
            X_PJ_xyz=p_PJ,
            axis=axis,
            damping=damping,
            joint_name=jname,
        )
        for j in joints:
            if j["parent"] == name:
                add(j["child"], name, j)

    # World-attached joints first, then free roots.
    handled = set()
    for j in joints:
        if j["parent"] == "world":
            add(j["child"], None, j)
            handled.add(j["child"])
    for name in roots:
        if name not in handled and name not in [
            j["child"] for j in joints
        ]:
            add(name, None, None)

    model, params = builder.build(dtype)
    return model, params


def sdf_joint_limits(model: MultibodyModel, source: str, dtype=jnp.float32):
    """(q_lower, q_upper) arrays over v-dofs from the SDF limit tags."""
    if source.lstrip().startswith("<"):
        root = ET.fromstring(source)
    else:
        root = ET.parse(source).getroot()
    model_el = root.find("model") if root.tag != "model" else root
    lower = np.full(model.num_velocities, -np.inf)
    upper = np.full(model.num_velocities, np.inf)
    for j in model_el.findall("joint"):
        name = j.get("name")
        if name not in model.joint_names:
            continue
        i = model.joint_names.index(name)
        axis_el = j.find("axis")
        lim = axis_el.find("limit") if axis_el is not None else None
        if lim is None:
            continue
        vo = model.v_offsets[i]
        if lim.find("lower") is not None:
            lower[vo] = float(lim.find("lower").text)
        if lim.find("upper") is not None:
            upper[vo] = float(lim.find("upper").text)
    return jnp.asarray(lower, dtype), jnp.asarray(upper, dtype)


# ---------------------------------------------------------------------------
# Collision-geometry extraction (detail_sdf_geometry.cc role).
# ---------------------------------------------------------------------------


def _sdf_shape(geom_el, mesh_dir, mesh_mode, mesh_resolution):
    """SDF <geometry> element -> drake_tpu shape (or None).

    SDF uses child-element text (<box><size>x y z</size></box>), unlike
    URDF's attributes.  <plane> maps to HalfSpace (its pose supplies the
    orientation)."""
    from drake_tpu.geometry import shapes as sh

    box = geom_el.find("box")
    if box is not None:
        return sh.Box(tuple(np.fromstring(box.find("size").text, sep=" ")))
    sphere = geom_el.find("sphere")
    if sphere is not None:
        return sh.Sphere(float(sphere.find("radius").text))
    cyl = geom_el.find("cylinder")
    if cyl is not None:
        return sh.Cylinder(
            float(cyl.find("radius").text), float(cyl.find("length").text)
        )
    cap = geom_el.find("capsule")
    if cap is not None:
        return sh.Capsule(
            float(cap.find("radius").text), float(cap.find("length").text)
        )
    ell = geom_el.find("ellipsoid")
    if ell is not None:
        return sh.Ellipsoid(
            tuple(np.fromstring(ell.find("radii").text, sep=" "))
        )
    plane = geom_el.find("plane")
    if plane is not None:
        return sh.HalfSpace()
    mesh = geom_el.find("mesh")
    if mesh is not None:
        from drake_tpu.geometry.mesh_io import decimate_vertices, parse_obj

        uri = mesh.find("uri").text.strip()
        scale_el = mesh.find("scale")
        scale = (
            float(np.fromstring(scale_el.text, sep=" ")[0])
            if scale_el is not None else 1.0
        )
        path = uri
        if mesh_dir is not None and not os.path.isabs(uri):
            path = os.path.join(mesh_dir, uri)
        verts, faces = parse_obj(path, scale=scale)
        if mesh_mode == "sdf" and faces.shape[0] > 0:
            return sh.MeshSdf.from_mesh(verts, faces,
                                        resolution=mesh_resolution)
        return sh.Mesh(vertices=decimate_vertices(verts, 64))
    return None


def parse_sdf_geometry(
    source: str,
    model: MultibodyModel,
    *,
    mesh_dir: Optional[str] = None,
    default_friction: float = 1.0,
    default_stiffness: float = 1e6,
    default_dissipation: float = 0.1,
    mesh_mode: str = "points",
    mesh_resolution: int = 48,
) -> list:
    """Extract CollisionGeometry descriptors from SDFormat.

    The reference Parser's geometry registration for SDF models
    (multibody/parsing/detail_sdf_geometry.cc): <collision> elements get
    the proximity role, <visual> illustration+perception; element <pose>
    composes into the link frame.  Friction comes from
    <surface><friction><ode><mu>, drake:* proximity tags also apply
    (mu_dynamic/point_contact_stiffness/hunt_crossley_dissipation/
    hydroelastic_modulus, as in the URDF path).
    """
    from drake_tpu.geometry import scene_graph
    from drake_tpu.geometry.scene import CollisionGeometry
    from drake_tpu.multibody.parsing import (
        _drake_proximity_props,
        _find_drake,
    )

    if source.lstrip().startswith("<"):
        root = ET.fromstring(source)
    else:
        if mesh_dir is None:
            mesh_dir = os.path.dirname(os.path.abspath(source))
        root = ET.parse(source).getroot()

    geoms = []
    for link in root.iter("link"):
        lname = link.get("name")
        try:
            body = model.body_index(lname)
        except (KeyError, ValueError):
            continue
        for role, tag in (
            (scene_graph.PROXIMITY, "collision"),
            (scene_graph.ILLUSTRATION | scene_graph.PERCEPTION, "visual"),
        ):
            for k, el in enumerate(link.findall(tag)):
                geom_el = el.find("geometry")
                if geom_el is None:
                    continue
                shape = _sdf_shape(
                    geom_el, mesh_dir, mesh_mode, mesh_resolution
                )
                if shape is None:
                    continue
                xyz, rpy = _pose(el.find("pose"))
                mat = dict(
                    friction=default_friction,
                    stiffness=default_stiffness,
                    dissipation=default_dissipation,
                )
                mu_el = el.find("surface/friction/ode/mu")
                if mu_el is not None:
                    mat["friction"] = float(mu_el.text)
                mat.update(_drake_proximity_props(el))
                name = el.get("name") or f"{lname}_{tag}{k}"
                geoms.append(
                    CollisionGeometry(
                        name=name, body=body, shape=shape,
                        R_BG=_rot(rpy), p_BG=np.asarray(xyz),
                        roles=role, **mat,
                    )
                )
    return geoms
