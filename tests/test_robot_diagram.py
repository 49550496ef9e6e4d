"""RobotDiagram / RobotDiagramBuilder (planning/robot_diagram.h role).

The reference bundles plant + scene graph into one diagram that the
planning stack (SceneGraphCollisionChecker etc.) consumes; here the bundle
is (model, params, scene) and the checker surface is method sugar over the
pure collision_checker functions.
"""

import jax.numpy as jnp
import numpy as np

from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry
from drake_tpu.planning.robot_diagram import RobotDiagram, RobotDiagramBuilder

_URDF = """
<robot name="planar2">
  <link name="base"/>
  <link name="upper">
    <inertial><mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><origin xyz="0 0 -0.25"/>
      <geometry><capsule radius="0.04" length="0.5"/></geometry>
    </collision>
  </link>
  <link name="lower">
    <inertial><mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><origin xyz="0 0 -0.25"/>
      <geometry><capsule radius="0.04" length="0.5"/></geometry>
    </collision>
  </link>
  <joint name="shoulder" type="continuous">
    <parent link="base"/><child link="upper"/><axis xyz="0 1 0"/>
  </joint>
  <joint name="elbow" type="continuous">
    <origin xyz="0 0 -0.5"/>
    <parent link="upper"/><child link="lower"/><axis xyz="0 1 0"/>
  </joint>
</robot>
"""


def _build():
    b = RobotDiagramBuilder(dtype=jnp.float64)
    b.add_urdf(_URDF)
    # Environment obstacle: a ball 0.35 m to the +x side of the base.
    b.add_geometry(
        CollisionGeometry(
            name="obstacle", body=-1, shape=sh.Sphere(0.15),
            p_BG=np.array([0.45, 0.0, -0.45]),
        )
    )
    return b.build()


class TestRobotDiagram:
    def test_build_and_dimensions(self):
        dia = _build()
        assert isinstance(dia, RobotDiagram)
        assert dia.num_positions == 2
        # robot-robot adjacent pair filtered; two robot-vs-obstacle pairs.
        names = [g.name for g in dia.scene.geometries]
        assert "obstacle" in names
        assert len(dia.scene.pairs) >= 2

    def test_free_vs_colliding_configs(self):
        dia = _build()
        q_free = jnp.array([0.0, 0.0])  # hanging straight down, obstacle at +x
        assert bool(dia.check_config(q_free))
        # Swing the arm toward the obstacle: -0.79 rad penetrates it.
        q_hit = jnp.array([-0.79, 0.0])
        assert float(dia.min_distance(q_hit)) < 0.0
        assert not bool(dia.check_config(q_hit))
        qs = jnp.stack([q_free, q_hit])
        free = np.asarray(dia.check_configs(qs))
        assert free[0] and not free[1]

    def test_edge_check_is_conservative(self):
        dia = _build()
        q1 = jnp.array([-0.3, 0.0])
        q2 = jnp.array([0.3, 0.0])
        assert bool(dia.check_edge(q1, q2, num_samples=8))

    def test_builder_guards(self):
        b = RobotDiagramBuilder()
        try:
            b.build()
            assert False, "build without a model must raise"
        except RuntimeError:
            pass
