"""MJCF parser tests (reference: multibody/parsing/detail_mujoco_parser.cc
test strategy — parse small models and check the resulting plant)."""

import jax.numpy as jnp
import numpy as np

from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.parsing import parse_urdf
from drake_tpu.multibody.parsing_mjcf import parse_mjcf

_PENDULUM_MJCF = """
<mujoco model="pendulum">
  <compiler angle="radian"/>
  <option gravity="0 0 -9.81"/>
  <worldbody>
    <body name="arm" pos="0 0 2">
      <joint name="shoulder" type="hinge" axis="0 1 0" damping="0.1"/>
      <inertial pos="0 0 -0.5" mass="1.0" diaginertia="0.05 0.05 0.001"/>
      <geom name="rod" type="capsule" size="0.02" fromto="0 0 0 0 0 -1"/>
    </body>
  </worldbody>
</mujoco>
"""

_PENDULUM_URDF = """
<robot name="pendulum">
  <link name="world_link"/>
  <link name="arm">
    <inertial>
      <origin xyz="0 0 -0.5"/>
      <mass value="1.0"/>
      <inertia ixx="0.05" iyy="0.05" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="shoulder" type="continuous">
    <origin xyz="0 0 2"/>
    <parent link="world_link"/>
    <child link="arm"/>
    <axis xyz="0 1 0"/>
    <dynamics damping="0.1"/>
  </joint>
</robot>
"""


class TestMjcfPendulum:
    def test_matches_urdf_dynamics(self):
        mj_model, mj_params, geoms = parse_mjcf(_PENDULUM_MJCF, dtype=jnp.float64)
        ur_model, ur_params = parse_urdf(_PENDULUM_URDF, dtype=jnp.float64)
        assert mj_model.num_positions == 1
        q = jnp.asarray([0.7], jnp.float64)
        v = jnp.asarray([1.3], jnp.float64)
        M_mj = dyn.mass_matrix(mj_model, mj_params, q)
        # URDF model has an extra world weld link with 0 dofs.
        M_ur = dyn.mass_matrix(ur_model, ur_params, q)
        np.testing.assert_allclose(
            np.asarray(M_mj), np.asarray(M_ur), rtol=1e-12
        )
        C_mj = dyn.bias_forces(mj_model, mj_params, q, v)
        C_ur = dyn.bias_forces(ur_model, ur_params, q, v)
        np.testing.assert_allclose(
            np.asarray(C_mj), np.asarray(C_ur), rtol=1e-10, atol=1e-12
        )

    def test_fk_and_geom(self):
        model, params, geoms = parse_mjcf(_PENDULUM_MJCF, dtype=jnp.float64)
        R, p = kin.forward_kinematics(
            model, params, jnp.zeros(1, jnp.float64)
        )
        arm = model.body_index("arm")
        np.testing.assert_allclose(np.asarray(p[arm]), [0, 0, 2], atol=1e-12)
        (rod,) = [g for g in geoms if g.name == "rod"]
        assert rod.type == "capsule"
        np.testing.assert_allclose(rod.pos, [0, 0, -0.5], atol=1e-12)
        # fromto along -z: capsule axis (geom frame z) is +-world z.
        np.testing.assert_allclose(abs(rod.R[2, 2]), 1.0, atol=1e-12)


class TestMjcfFeatures:
    def test_degrees_and_euler(self):
        src = """
        <mujoco>
          <worldbody>
            <body name="b" pos="1 0 0" euler="0 0 90">
              <joint type="hinge" axis="0 0 1"/>
              <inertial pos="0 0 0" mass="2" diaginertia="0.1 0.1 0.1"/>
            </body>
          </worldbody>
        </mujoco>
        """
        model, params, _ = parse_mjcf(src, dtype=jnp.float64)
        R, p = kin.forward_kinematics(model, params, jnp.zeros(1, jnp.float64))
        i = model.body_index("b")
        # euler="0 0 90" in degrees: Rz(90).
        np.testing.assert_allclose(
            np.asarray(R[i]),
            [[0, -1, 0], [1, 0, 0], [0, 0, 1]],
            atol=1e-12,
        )

    def test_default_class_inheritance(self):
        src = """
        <mujoco>
          <compiler angle="radian"/>
          <default>
            <joint damping="0.5"/>
            <default class="stiff">
              <joint damping="5.0"/>
            </default>
          </default>
          <worldbody>
            <body name="a">
              <joint name="ja" type="hinge"/>
              <inertial pos="0 0 0" mass="1" diaginertia="0.1 0.1 0.1"/>
              <body name="b">
                <joint name="jb" type="hinge" class="stiff"/>
                <inertial pos="0 0 0" mass="1" diaginertia="0.1 0.1 0.1"/>
              </body>
            </body>
          </worldbody>
        </mujoco>
        """
        model, params, _ = parse_mjcf(src, dtype=jnp.float64)
        ia = model.joint_names.index("ja")
        ib = model.joint_names.index("jb")
        assert float(params.damping[ia]) == 0.5
        assert float(params.damping[ib]) == 5.0

    def test_free_body_and_geom_inertia(self):
        src = """
        <mujoco>
          <compiler angle="radian"/>
          <worldbody>
            <geom name="floor" type="plane" size="5 5 0.1"/>
            <body name="ball" pos="0 0 1">
              <freejoint/>
              <geom type="sphere" size="0.1" density="1000"/>
            </body>
          </worldbody>
        </mujoco>
        """
        model, params, geoms = parse_mjcf(src, dtype=jnp.float64)
        assert model.num_positions == 7 and model.num_velocities == 6
        i = model.body_index("ball")
        m_expected = 1000 * 4 / 3 * np.pi * 0.1**3
        np.testing.assert_allclose(float(params.mass[i]), m_expected, rtol=1e-9)
        I_expected = 0.4 * m_expected * 0.01
        np.testing.assert_allclose(
            np.asarray(params.inertia_com[i]),
            np.eye(3) * I_expected,
            rtol=1e-9,
        )
        assert any(g.body == "world" and g.type == "plane" for g in geoms)

    def test_joint_anchor_rerooting(self):
        """A hinge anchored away from the body origin: FK of a marker body
        must match the closed-form rotation about the anchor point."""
        src = """
        <mujoco>
          <compiler angle="radian"/>
          <worldbody>
            <body name="door" pos="0 0 0">
              <joint name="hinge" type="hinge" axis="0 0 1" pos="0.5 0 0"/>
              <inertial pos="0 0 0" mass="1" diaginertia="0.1 0.1 0.1"/>
              <body name="knob" pos="-0.4 0 0">
                <inertial pos="0 0 0" mass="0.1" diaginertia="0.01 0.01 0.01"/>
              </body>
            </body>
          </worldbody>
        </mujoco>
        """
        model, params, _ = parse_mjcf(src, dtype=jnp.float64)
        th = 0.8
        R, p = kin.forward_kinematics(model, params, jnp.asarray([th]))
        anchor = np.array([0.5, 0, 0])
        Rz = np.array(
            [
                [np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1],
            ]
        )
        knob0 = np.array([-0.4, 0, 0])
        expected = anchor + Rz @ (knob0 - anchor)
        np.testing.assert_allclose(
            np.asarray(p[model.body_index("knob")]), expected, atol=1e-12
        )

    def test_multi_joint_chain_expansion(self):
        src = """
        <mujoco>
          <compiler angle="radian"/>
          <worldbody>
            <body name="g" pos="0 0 1">
              <joint name="gx" type="hinge" axis="1 0 0"/>
              <joint name="gy" type="hinge" axis="0 1 0"/>
              <inertial pos="0 0 -0.2" mass="1" diaginertia="0.02 0.02 0.01"/>
            </body>
          </worldbody>
        </mujoco>
        """
        model, params, _ = parse_mjcf(src, dtype=jnp.float64)
        assert model.num_positions == 2
        M = dyn.mass_matrix(
            model, params, jnp.asarray([0.3, 0.4], jnp.float64)
        )
        assert np.linalg.eigvalsh(np.asarray(M)).min() > 1e-6
