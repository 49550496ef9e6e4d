"""Model-directives tests (reference: multibody/parsing/test/
process_model_directives_test.cc): composing models from YAML, scoped
names, frames, welds with offsets, recursion with namespaces, and dynamics
on the merged model.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.multibody.directives import process_model_directives

F64 = jnp.float64

ARM_URDF = """
<robot name="arm">
  <link name="base"/>
  <link name="upper">
    <inertial>
      <origin xyz="0 0 -0.5"/>
      <mass value="1.0"/>
      <inertia ixx="0.083" ixy="0" ixz="0" iyy="0.083" iyz="0" izz="0.001"/>
    </inertial>
  </link>
  <joint name="shoulder" type="continuous">
    <parent link="base"/>
    <child link="upper"/>
    <axis xyz="0 1 0"/>
  </joint>
</robot>
"""

BALL_URDF = """
<robot name="ball">
  <link name="body">
    <inertial>
      <mass value="2.0"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.01"/>
    </inertial>
  </link>
</robot>
"""


@pytest.fixture
def model_dir(tmp_path):
    (tmp_path / "arm.urdf").write_text(ARM_URDF)
    (tmp_path / "ball.urdf").write_text(BALL_URDF)
    return tmp_path


class TestProcessModelDirectives:
    def test_compose_two_models_with_frame_weld(self, model_dir):
        yaml_text = f"""
directives:
- add_model:
    name: robot
    file: {model_dir}/arm.urdf
    default_joint_positions:
      shoulder: [0.7]
- add_frame:
    name: tool_frame
    X_PF:
      base_frame: robot::upper
      translation: [0, 0, -1.0]
      rotation: !Rpy {{ deg: [0, 0, 90] }}
- add_model:
    name: payload
    file: {model_dir}/ball.urdf
- add_weld:
    parent: tool_frame
    child: payload::body
    X_PC:
      translation: [0, 0, -0.1]
"""
        res = process_model_directives(yaml_text, dtype=F64)
        model, params = res.model, res.params

        assert res.model_names == ["robot", "payload"]
        assert "robot::upper" in model.body_names
        assert "payload::body" in model.body_names

        # the payload root is welded under the arm's upper link
        ci = model.body_index("payload::body")
        assert model.parent[ci] == model.body_index("robot::upper")
        assert model.joint_types[ci] == "weld"
        # X_PJ = frame offset composed with X_PC
        np.testing.assert_allclose(
            np.asarray(params.X_PJ_p[ci]), [0, 0, -1.1], atol=1e-12)
        Rz90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
        np.testing.assert_allclose(
            np.asarray(params.X_PJ_R[ci]), Rz90, atol=1e-12)

        # default_joint_positions land in default_state
        x = res.default_state(F64)
        qi = model.q_offsets[model.body_index("robot::upper")]
        assert abs(float(x[qi]) - 0.7) < 1e-12

    def test_merged_dynamics_runs(self, model_dir):
        yaml_text = f"""
directives:
- add_model:
    name: robot
    file: {model_dir}/arm.urdf
- add_model:
    name: payload
    file: {model_dir}/ball.urdf
- add_weld:
    parent: robot::upper
    child: payload::body
    X_PC:
      translation: [0, 0, -1.0]
"""
        from drake_tpu.multibody import dynamics as dyn

        res = process_model_directives(yaml_text, dtype=F64)
        model, params = res.model, res.params
        nq, nv = model.num_positions, model.num_velocities
        assert nv == 1  # one revolute dof; everything else welded
        q = jnp.zeros(nq, F64)
        M = dyn.mass_matrix(model, params, q)
        # pendulum with 1 kg at 0.5 m (I=0.083+...) plus 2 kg payload at tip
        # (1.0 m): M = 0.083*? — just check it grew vs the arm alone and is
        # close to the analytic 1*0.5^2(+Iyy) + 2*1^2 composite
        assert M.shape == (1, 1)
        m_analytic = 0.083 + 1.0 * 0.5**2 + 0.01 + 2.0 * 1.0**2
        np.testing.assert_allclose(float(M[0, 0]), m_analytic, rtol=1e-6)

    def test_recursive_add_directives_with_namespace(self, model_dir):
        sub = model_dir / "station.dmd.yaml"
        sub.write_text(
            """
directives:
- add_model:
    name: arm
    file: arm.urdf
- add_model:
    name: ball
    file: ball.urdf
- add_weld:
    parent: arm::upper
    child: ball::body
"""
        )
        top = f"""
directives:
- add_directives:
    file: {sub}
    model_namespace: left
- add_directives:
    file: {sub}
    model_namespace: right
"""
        res = process_model_directives(top, dtype=F64)
        names = res.model.body_names
        assert "left::arm::upper" in names
        assert "right::ball::body" in names
        assert res.model.num_velocities == 2  # two shoulders

    def test_package_uri_resolution(self, model_dir):
        yaml_text = """
directives:
- add_model:
    name: robot
    file: package://mypkg/arm.urdf
"""
        res = process_model_directives(
            yaml_text, package_map={"mypkg": str(model_dir)}, dtype=F64)
        assert "robot::upper" in res.model.body_names

    def test_weld_order_violation_raises(self, model_dir):
        yaml_text = f"""
directives:
- add_model:
    name: a
    file: {model_dir}/ball.urdf
- add_model:
    name: b
    file: {model_dir}/ball.urdf
- add_weld:
    parent: b::body
    child: a::body
"""
        with pytest.raises(ValueError, match="topological"):
            process_model_directives(yaml_text, dtype=F64)
