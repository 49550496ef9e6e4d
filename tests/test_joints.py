"""Joint zoo tests: ball, universal, planar, screw.

Validation style mirrors the reference's per-joint test pattern
(multibody/tree/test/ball_rpy_joint_test.cc, universal_joint_test.cc,
planar_joint_test.cc, screw_joint_test.cc): kinematic maps against closed
forms, mass-matrix structure against analytic reductions, and energy
conservation through the integrators.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.math import rotations as rot
from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.model import ModelBuilder
from drake_tpu.multibody.plant import qdot_from_v


def _simulate(model, params, x0, h, n):
    """Symplectic-ish rollout: vdot at (q, v), then q update with v_next."""

    def step(x, _):
        nq, nv = model.num_positions, model.num_velocities
        q, v = x[:nq], x[nq:]
        vdot = dyn.forward_dynamics(model, params, q, v, jnp.zeros(nv, x.dtype))
        v_new = v + h * vdot
        q_new = q + h * qdot_from_v(model, params, q, v_new)
        # renormalize quaternion charts
        for i, jt in enumerate(model.joint_types):
            if jt in ("floating", "ball"):
                qo = model.q_offsets[i]
                q_new = q_new.at[qo : qo + 4].set(
                    rot.quat_normalize(q_new[qo : qo + 4])
                )
        x_new = jnp.concatenate([q_new, v_new])
        return x_new, x_new

    return jax.lax.scan(step, x0, None, length=n)[1]


class TestBallJoint:
    def _pendulum(self):
        b = ModelBuilder()
        b.add_body(
            "bob", parent=None, joint_type="ball", mass=1.0,
            com=(0, 0, -0.5),
            inertia_com=np.diag([0.01, 0.01, 0.01]),
        )
        return b.build(jnp.float64)

    def test_fk_matches_quaternion(self):
        model, params = self._pendulum()
        quat = rot.quat_normalize(jnp.asarray([0.9, 0.1, -0.3, 0.2], jnp.float64))
        q = jnp.asarray(quat)
        R_WB, p_WB = kin.forward_kinematics(model, params, q)
        np.testing.assert_allclose(
            np.asarray(R_WB[0]), np.asarray(rot.quat_to_rotation(quat)),
            atol=1e-12,
        )
        np.testing.assert_allclose(np.asarray(p_WB[0]), 0.0, atol=1e-12)

    def test_reduces_to_revolute_pendulum(self):
        """Swing only about +x: ball pendulum == revolute pendulum."""
        model, params = self._pendulum()
        b2 = ModelBuilder()
        b2.add_body(
            "bob", parent=None, joint_type="revolute", mass=1.0,
            com=(0, 0, -0.5), inertia_com=np.diag([0.01, 0.01, 0.01]),
            axis=(1, 0, 0),
        )
        model_r, params_r = b2.build(jnp.float64)

        x0 = model.default_state(jnp.float64)
        x0 = x0.at[4].set(1.2)  # wx
        xs = _simulate(model, params, x0, 1e-3, 500)

        x0r = jnp.asarray([0.0, 1.2], jnp.float64)
        xsr = _simulate(model_r, params_r, x0r, 1e-3, 500)

        # Compare swing angle: extract rotation about x from the quaternion.
        quatf = xs[-1, :4]
        angle = 2 * jnp.arctan2(quatf[1], quatf[0])
        np.testing.assert_allclose(float(angle), float(xsr[-1, 0]), atol=1e-6)
        np.testing.assert_allclose(float(xs[-1, 4]), float(xsr[-1, 1]), atol=1e-6)

    def test_energy_conserved(self):
        model, params = self._pendulum()
        x0 = model.default_state(jnp.float64)
        x0 = x0.at[4:7].set(jnp.asarray([0.8, 0.5, 0.3]))
        nq = model.num_positions
        e0 = float(dyn.total_energy(model, params, x0[:nq], x0[nq:]))
        xs = _simulate(model, params, x0, 2e-4, 2000)
        e1 = float(dyn.total_energy(model, params, xs[-1, :nq], xs[-1, nq:]))
        assert abs(e1 - e0) < 2e-3 * max(1.0, abs(e0))


class TestUniversalJoint:
    def test_expansion_fk(self):
        """U-joint = Rx(q1) then Ry(q2) (reference universal_joint.h)."""
        b = ModelBuilder()
        b.add_body(
            "cross", parent=None, joint_type="universal", mass=2.0,
            com=(0, 0, -0.3), inertia_com=np.diag([0.02, 0.02, 0.01]),
            axis=(1, 0, 0), axis2=(0, 1, 0),
        )
        model, params = b.build(jnp.float64)
        assert model.num_positions == 2 and model.num_velocities == 2
        q = jnp.asarray([0.4, -0.7], jnp.float64)
        R_WB, _ = kin.forward_kinematics(model, params, q)
        ex = jnp.asarray([1.0, 0, 0], jnp.float64)
        ey = jnp.asarray([0, 1.0, 0], jnp.float64)
        expected = np.asarray(
            rot.axis_angle_to_rotation(ex, q[0])
            @ rot.axis_angle_to_rotation(ey, q[1])
        )
        np.testing.assert_allclose(
            np.asarray(R_WB[model.body_index("cross")]), expected, atol=1e-12
        )

    def test_mass_matrix_spd_and_energy(self):
        b = ModelBuilder()
        b.add_body(
            "cross", parent=None, joint_type="universal", mass=2.0,
            com=(0, 0, -0.3), inertia_com=np.diag([0.02, 0.02, 0.01]),
        )
        model, params = b.build(jnp.float64)
        q = jnp.asarray([0.3, 0.2], jnp.float64)
        M = dyn.mass_matrix(model, params, q)
        w = np.linalg.eigvalsh(np.asarray(M))
        assert w.min() > 1e-6  # SPD despite the massless intermediate body
        x0 = jnp.asarray([0.5, 0.2, 0.7, -0.4], jnp.float64)
        e0 = float(dyn.total_energy(model, params, x0[:2], x0[2:]))
        xs = _simulate(model, params, x0, 2e-4, 2000)
        e1 = float(dyn.total_energy(model, params, xs[-1, :2], xs[-1, 2:]))
        assert abs(e1 - e0) < 2e-3 * max(1.0, abs(e0))


class TestPlanarJoint:
    def _slider(self, gravity=(0.0, 0.0, -9.81)):
        b = ModelBuilder(gravity=gravity)
        # Plane = world x-z plane: joint frame rotated so Jz = world y.
        b.add_body(
            "puck", parent=None, joint_type="planar", mass=1.5,
            inertia_com=np.diag([0.01, 0.01, 0.02]),
            X_PJ_rpy=(-np.pi / 2, 0, 0),  # Jx=Wx, Jy=Wz, Jz=-Wy
        )
        return b.build(jnp.float64)

    def test_fk(self):
        model, params = self._slider()
        q = jnp.asarray([0.3, -0.2, 0.5], jnp.float64)
        R_WB, p_WB = kin.forward_kinematics(model, params, q)
        # Joint-frame translation [x, y] maps to world [x, 0, -0.2]? Jy = Wz
        # with rpy(-pi/2,0,0): R = Rx(-pi/2) sends ey -> -ez... check via R.
        R_PJ = np.asarray(params.X_PJ_R[0])
        expected_p = R_PJ @ np.array([0.3, -0.2, 0.0])
        np.testing.assert_allclose(np.asarray(p_WB[0]), expected_p, atol=1e-12)
        expected_R = R_PJ @ np.asarray(
            rot.axis_angle_to_rotation(jnp.asarray([0.0, 0, 1.0]), q[2])
        )
        np.testing.assert_allclose(np.asarray(R_WB[0]), expected_R, atol=1e-12)

    def test_inplane_free_fall(self):
        """Gravity has a component in the plane: the puck accelerates like a
        free particle in that direction; no out-of-plane motion exists."""
        model, params = self._slider()
        x0 = model.default_state(jnp.float64)
        xs = _simulate(model, params, x0, 1e-3, 100)
        t = 0.1
        # Joint frame: Jx=Wx horizontal, Jy vertical-ish; g projects onto Jy.
        R_PJ = np.asarray(params.X_PJ_R[0])
        g_J = R_PJ.T @ np.array([0, 0, -9.81])
        assert abs(g_J[2]) < 1e-12  # gravity is in-plane by construction
        q_final = np.asarray(xs[-1, :3])
        # Backward-Euler-ish rollout: x ~= g t^2/2 within integrator error.
        np.testing.assert_allclose(
            q_final[:2], 0.5 * g_J[:2] * t * t, atol=6e-3
        )
        assert abs(q_final[2]) < 1e-12  # no spin induced

    def test_spin_constant(self):
        model, params = self._slider(gravity=(0.0, 0.0, 0.0))
        x0 = model.default_state(jnp.float64)
        x0 = x0.at[5].set(3.0)  # wz
        xs = _simulate(model, params, x0, 1e-3, 200)
        np.testing.assert_allclose(float(xs[-1, 5]), 3.0, atol=1e-10)
        np.testing.assert_allclose(float(xs[-1, 2]), 3.0 * 0.2, atol=1e-9)


class TestScrewJoint:
    def _screw(self, pitch=0.1):
        b = ModelBuilder(gravity=(0.0, 0.0, 0.0))
        b.add_body(
            "nut", parent=None, joint_type="screw", mass=2.0,
            inertia_com=np.diag([0.01, 0.01, 0.05]),
            axis=(0, 0, 1), screw_pitch=pitch,
        )
        return b.build(jnp.float64)

    def test_fk_translation_coupling(self):
        model, params = self._screw(pitch=0.1)
        th = 3.0
        q = jnp.asarray([th], jnp.float64)
        R_WB, p_WB = kin.forward_kinematics(model, params, q)
        np.testing.assert_allclose(
            float(p_WB[0, 2]), 0.1 * th / (2 * np.pi), rtol=1e-12
        )
        expected_R = np.asarray(
            rot.axis_angle_to_rotation(jnp.asarray([0.0, 0, 1.0]), th)
        )
        np.testing.assert_allclose(np.asarray(R_WB[0]), expected_R, atol=1e-12)

    def test_mass_matrix_analytic(self):
        """M = Izz + m lead^2 for a screw about z through the com."""
        pitch = 0.3
        model, params = self._screw(pitch=pitch)
        M = dyn.mass_matrix(model, params, jnp.asarray([0.7], jnp.float64))
        lead = pitch / (2 * np.pi)
        np.testing.assert_allclose(
            float(M[0, 0]), 0.05 + 2.0 * lead**2, rtol=1e-12
        )

    def test_momentum_under_torque(self):
        """Constant tau: M qddot = tau (no velocity-product terms: the axis
        is through the com, S constant)."""
        model, params = self._screw(pitch=0.2)
        q = jnp.asarray([0.0], jnp.float64)
        v = jnp.asarray([1.0], jnp.float64)
        tau = jnp.asarray([0.5], jnp.float64)
        vdot = dyn.forward_dynamics(model, params, q, v, tau)
        M = dyn.mass_matrix(model, params, q)
        np.testing.assert_allclose(
            float(vdot[0]), 0.5 / float(M[0, 0]), rtol=1e-10
        )

    def test_screw_gravity_converts_height_to_spin(self):
        """With gravity along -z, the screw constraint couples fall and spin;
        energy stays conserved."""
        b = ModelBuilder()
        b.add_body(
            "nut", parent=None, joint_type="screw", mass=2.0,
            inertia_com=np.diag([0.01, 0.01, 0.05]),
            axis=(0, 0, 1), screw_pitch=0.5,
        )
        model, params = b.build(jnp.float64)
        x0 = model.default_state(jnp.float64)
        e0 = float(dyn.total_energy(model, params, x0[:1], x0[1:]))
        xs = _simulate(model, params, x0, 2e-4, 2000)
        e1 = float(dyn.total_energy(model, params, xs[-1, :1], xs[-1, 1:]))
        assert float(xs[-1, 0]) < 0  # fell -> spun negative (z descends)
        assert abs(e1 - e0) < 2e-3 * max(1.0, abs(e0))


class TestReflectedInertia:
    """JointActuator reflected rotor inertia (reference
    multibody/tree/joint_actuator.h @ref reflected_inertia)."""

    def _pendulum(self, rotor=0.0, gear=1.0):
        b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
        b.add_body(
            "arm", parent=None, joint_type="revolute", mass=1.0,
            com=(0, 0, -0.5), inertia_com=np.eye(3) * 1e-3,
            axis=(0, 1, 0), rotor_inertia=rotor, gear_ratio=gear,
        )
        return b.build(jnp.float64)

    def test_mass_matrix_diagonal_gains_G2_Ir(self):
        from drake_tpu.multibody import dynamics as dyn

        q = jnp.asarray([0.3])
        m0, p0 = self._pendulum()
        m1, p1 = self._pendulum(rotor=0.005, gear=50.0)
        M0 = dyn.mass_matrix(m0, p0, q)
        M1 = dyn.mass_matrix(m1, p1, q)
        np.testing.assert_allclose(
            float(M1[0, 0] - M0[0, 0]), 50.0**2 * 0.005, rtol=1e-12
        )

    def test_forward_dynamics_slows_down(self):
        from drake_tpu.multibody import dynamics as dyn

        q = jnp.asarray([0.5])
        v = jnp.zeros(1)
        tau = jnp.asarray([1.0])
        m0, p0 = self._pendulum()
        m1, p1 = self._pendulum(rotor=0.005, gear=50.0)
        a0 = float(dyn.forward_dynamics(m0, p0, q, v, tau)[0])
        a1 = float(dyn.forward_dynamics(m1, p1, q, v, tau)[0])
        # Same torque, extra reflected inertia -> smaller acceleration,
        # with the exact ratio M0 / (M0 + G^2 Ir).
        M0 = float(dyn.mass_matrix(m0, p0, q)[0, 0])
        np.testing.assert_allclose(a1 / a0, M0 / (M0 + 12.5), rtol=1e-9)

    def test_urdf_transmission_tags(self):
        from drake_tpu.multibody import parsing

        urdf = """<?xml version="1.0"?>
        <robot name="r" xmlns:drake="http://drake.mit.edu">
          <link name="base"/>
          <link name="arm">
            <inertial><mass value="1.0"/>
              <inertia ixx="0.01" iyy="0.01" izz="0.01"
                       ixy="0" ixz="0" iyz="0"/>
            </inertial>
          </link>
          <joint name="shoulder" type="revolute">
            <parent link="base"/><child link="arm"/>
            <axis xyz="0 1 0"/>
            <limit effort="100" lower="-3" upper="3"/>
          </joint>
          <transmission name="t1">
            <joint name="shoulder"/>
            <actuator name="m1">
              <drake:rotor_inertia value="0.002"/>
              <drake:gear_ratio value="100"/>
            </actuator>
          </transmission>
        </robot>"""
        model, params = parsing.parse_urdf(urdf, floating_base=False)
        i = model.joint_names.index("shoulder")
        np.testing.assert_allclose(
            float(params.reflected_inertia[i]), 100.0**2 * 0.002
        )

    def test_mjcf_armature(self):
        from drake_tpu.multibody import parsing_mjcf

        xml = """<mujoco model="m">
          <worldbody>
            <body name="arm" pos="0 0 0">
              <joint name="j" type="hinge" axis="0 1 0" armature="0.11"/>
              <geom type="sphere" size="0.05" mass="1"/>
            </body>
          </worldbody>
        </mujoco>"""
        model, params, _ = parsing_mjcf.parse_mjcf(xml)
        i = model.joint_names.index("j")
        np.testing.assert_allclose(float(params.reflected_inertia[i]), 0.11)


class TestUrdfMimic:
    """URDF <mimic> -> coupler constraints (reference
    detail_urdf_parser.cc maps mimic onto AddCouplerConstraint)."""

    URDF = """<?xml version="1.0"?>
    <robot name="g">
      <link name="base"/>
      <link name="left">
        <inertial><mass value="0.2"/>
          <inertia ixx="1e-4" iyy="1e-4" izz="1e-4"
                   ixy="0" ixz="0" iyz="0"/>
        </inertial>
      </link>
      <link name="right">
        <inertial><mass value="0.2"/>
          <inertia ixx="1e-4" iyy="1e-4" izz="1e-4"
                   ixy="0" ixz="0" iyz="0"/>
        </inertial>
      </link>
      <joint name="left_slider" type="prismatic">
        <parent link="base"/><child link="left"/>
        <axis xyz="1 0 0"/>
        <limit effort="20" lower="-0.05" upper="0.05"/>
      </joint>
      <joint name="right_slider" type="prismatic">
        <parent link="base"/><child link="right"/>
        <axis xyz="1 0 0"/>
        <limit effort="20" lower="-0.05" upper="0.05"/>
        <mimic joint="left_slider" multiplier="-1" offset="0"/>
      </joint>
    </robot>"""

    def test_parse_and_track(self):
        from drake_tpu.contact import plant as cplant
        from drake_tpu.geometry.scene import CollisionScene
        from drake_tpu.multibody import parsing

        model, params = parsing.parse_urdf(self.URDF, dtype=jnp.float64)
        couplers = parsing.parse_urdf_couplers(self.URDF)
        assert couplers == [("right_slider", "left_slider", -1.0, 0.0)]

        dsys = cplant.make_discrete_system(
            model, params, CollisionScene.build([]), 1e-3,
            actuated_joints=["left_slider"], couplers=couplers,
        )
        x = jnp.zeros(4, jnp.float64)
        u = jnp.asarray([0.5], jnp.float64)  # push only the LEFT joint
        step = jax.jit(lambda xx: dsys.g(params, xx, u))
        for _ in range(200):
            x = step(x)
        qL, qR = float(x[0]), float(x[1])
        assert abs(qL) > 1e-3  # it moved
        np.testing.assert_allclose(qR, -qL, atol=1e-5)  # mirror tracking
