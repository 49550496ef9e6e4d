"""Collision-geometry extraction from URDF / SDF / MJCF.

The reference Parser registers every <collision>/<visual> element with
SceneGraph (multibody/parsing/detail_urdf_geometry.cc,
detail_sdf_geometry.cc, detail_mujoco_parser.cc); these tests cover the
drake_tpu equivalents: shape mapping, poses into the link frame, role
assignment, material overrides, and an end-to-end settle through a scene
built purely from parsed geometry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.geometry import scene_graph
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.parsing import parse_urdf, parse_urdf_geometry
from drake_tpu.multibody.parsing_sdf import parse_sdf, parse_sdf_geometry

F64 = jnp.float64

URDF = """<?xml version="1.0"?>
<robot name="rig" xmlns:drake="http://drake.mit.edu">
  <link name="base">
    <inertial><mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision name="base_box">
      <origin xyz="0 0 0.05" rpy="0 0 0"/>
      <geometry><box size="0.2 0.2 0.1"/></geometry>
      <drake:proximity_properties>
        <drake:mu_dynamic value="0.25"/>
        <drake:point_contact_stiffness value="5e5"/>
      </drake:proximity_properties>
    </collision>
    <visual>
      <geometry><sphere radius="0.15"/></geometry>
    </visual>
  </link>
  <joint name="arm" type="revolute">
    <parent link="base"/><child link="tip"/>
    <origin xyz="0 0 0.1"/><axis xyz="0 0 1"/>
  </joint>
  <link name="tip">
    <inertial><mass value="0.2"/>
      <inertia ixx="0.001" iyy="0.001" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <geometry><cylinder radius="0.03" length="0.2"/></geometry>
    </collision>
    <collision>
      <geometry><capsule radius="0.02" length="0.1"/></geometry>
    </collision>
  </link>
</robot>
"""


class TestUrdfGeometry:
    def test_extraction(self):
        model, params = parse_urdf(URDF, dtype=F64)
        geoms = parse_urdf_geometry(URDF, model)
        by_name = {g.name: g for g in geoms}
        box = by_name["base_box"]
        assert isinstance(box.shape, sh.Box)
        assert box.body == model.body_index("base")
        np.testing.assert_allclose(box.p_BG, [0, 0, 0.05])
        assert box.friction == 0.25 and box.stiffness == 5e5
        assert box.roles == scene_graph.PROXIMITY
        vis = by_name["base_visual0"]
        assert isinstance(vis.shape, sh.Sphere)
        assert vis.roles & scene_graph.ILLUSTRATION
        assert not (vis.roles & scene_graph.PROXIMITY)
        tip = [g for g in geoms if g.body == model.body_index("tip")]
        kinds = sorted(type(g.shape).__name__ for g in tip)
        assert kinds == ["Capsule", "Cylinder"]

    def test_mesh_collision(self, tmp_path):
        obj = tmp_path / "tet.obj"
        obj.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
            "f 1 3 2\nf 1 2 4\nf 1 4 3\nf 2 3 4\n"
        )
        urdf = f"""<robot name="m"><link name="base">
          <inertial><mass value="1"/>
            <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
          </inertial>
          <collision><geometry>
            <mesh filename="{obj}" scale="2.0"/>
          </geometry></collision>
        </link></robot>"""
        model, _ = parse_urdf(urdf, dtype=F64)
        geoms = parse_urdf_geometry(urdf, model)
        assert isinstance(geoms[0].shape, sh.Mesh)
        assert float(np.max(geoms[0].shape.vertices)) == 2.0  # scaled
        geoms_sdf = parse_urdf_geometry(
            urdf, model, mesh_mode="sdf", mesh_resolution=16
        )
        assert isinstance(geoms_sdf[0].shape, sh.MeshSdf)

    def test_end_to_end_settle(self):
        """A floating body whose ONLY geometry comes from the parser
        settles on the ground at the parsed box's bottom face."""
        from drake_tpu.contact import plant as cplant

        urdf = """<robot name="s"><link name="base">
          <inertial><mass value="1"/>
            <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
          </inertial>
          <collision><origin xyz="0 0 0"/>
            <geometry><box size="0.2 0.2 0.1"/></geometry>
          </collision>
        </link></robot>"""
        model, params = parse_urdf(urdf, floating_base=True, dtype=F64)
        geoms = parse_urdf_geometry(urdf, model)
        geoms.append(
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=0.8)
        )
        scene = CollisionScene.build(geoms)
        dsys = cplant.make_discrete_system(model, params, scene, 2e-3)
        x = model.default_state(F64).at[6].set(0.3)

        def step(xx, _):
            return dsys.g(params, xx, jnp.zeros(0, F64)), ()

        xf, _ = jax.lax.scan(step, x, None, length=800)
        np.testing.assert_allclose(float(xf[6]), 0.05, atol=2e-3)


SDF = """<?xml version="1.0"?>
<sdf version="1.9"><model name="rig">
  <link name="base">
    <inertial><mass>1.0</mass>
      <inertia><ixx>0.01</ixx><iyy>0.01</iyy><izz>0.01</izz>
        <ixy>0</ixy><ixz>0</ixz><iyz>0</iyz></inertia>
    </inertial>
    <collision name="c0">
      <pose>0 0 0.05 0 0 0</pose>
      <geometry><box><size>0.2 0.2 0.1</size></box></geometry>
      <surface><friction><ode><mu>0.33</mu></ode></friction></surface>
    </collision>
    <visual name="v0">
      <geometry><cylinder><radius>0.05</radius><length>0.3</length>
      </cylinder></geometry>
    </visual>
  </link>
</model></sdf>
"""


class TestSdfGeometry:
    def test_extraction(self):
        model, params = parse_sdf(SDF, dtype=F64)
        geoms = parse_sdf_geometry(SDF, model)
        by_name = {g.name: g for g in geoms}
        c0 = by_name["c0"]
        assert isinstance(c0.shape, sh.Box)
        assert c0.friction == 0.33
        np.testing.assert_allclose(c0.p_BG, [0, 0, 0.05])
        assert c0.roles == scene_graph.PROXIMITY
        v0 = by_name["v0"]
        assert isinstance(v0.shape, sh.Cylinder)
        assert v0.roles & scene_graph.PERCEPTION


MJCF = """<mujoco model="rig">
  <worldbody>
    <geom name="floor" type="plane" size="1 1 0.1"/>
    <body name="puck" pos="0 0 0.3">
      <freejoint/>
      <geom name="puck_geom" type="cylinder" size="0.1 0.02"
            friction="0.4" density="1000"/>
    </body>
  </worldbody>
</mujoco>
"""


class TestMjcfGeometry:
    def test_conversion(self):
        from drake_tpu.multibody.parsing_mjcf import (
            mjcf_geoms_to_collision,
            parse_mjcf,
        )

        model, params, raw = parse_mjcf(MJCF, dtype=F64)
        geoms = mjcf_geoms_to_collision(raw, model)
        by_name = {g.name: g for g in geoms}
        floor = by_name["floor"]
        assert isinstance(floor.shape, sh.HalfSpace) and floor.body == -1
        puck = by_name["puck_geom"]
        assert isinstance(puck.shape, sh.Cylinder)
        assert puck.shape.radius == 0.1
        assert abs(puck.shape.length - 0.04) < 1e-12  # half-length doubled
        assert puck.friction == 0.4
        assert puck.body == model.body_index("puck")
