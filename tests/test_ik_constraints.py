"""IK constraint-zoo tests (multibody/inverse_kinematics/ constraint set):
each constraint solved on a 2-link arm and verified against forward
kinematics.
"""

import jax.numpy as jnp
import numpy as np

from drake_tpu.multibody import ik_constraints as ikc
from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.model import ModelBuilder

F64 = jnp.float64


def _two_link():
    b = ModelBuilder()
    b.add_body("link1", parent=None, joint_type="revolute", mass=1.0,
               axis=(0, 1, 0), inertia_com=np.eye(3) * 0.1,
               com=(0, 0, -0.5))
    b.add_body("link2", parent="link1", joint_type="revolute", mass=1.0,
               axis=(0, 1, 0), X_PJ_xyz=(0, 0, -1.0),
               inertia_com=np.eye(3) * 0.1, com=(0, 0, -0.5))
    return b.build(F64)


def _tip(model, params, q):
    R, p = kin.forward_kinematics(model, params, q)
    i = model.body_index("link2")
    return np.asarray(p[i] + R[i] @ jnp.asarray([0.0, 0, -1.0], F64))


class TestIkConstraintZoo:
    def test_position_box(self):
        model, params = _two_link()
        tip = model.body_index("link2")
        target = np.array([-0.8, 0.0, -1.2])
        cons = [ikc.position_constraint(
            tip, (0, 0, -1.0), -1, target - 1e-4, target + 1e-4)]
        q0 = jnp.asarray([0.3, 0.3], F64)
        q, res = ikc.solve_ik_constraints(model, params, q0, cons)
        assert bool(res.success)
        np.testing.assert_allclose(_tip(model, params, q), target, atol=1e-3)

    def test_point_to_point_distance(self):
        model, params = _two_link()
        tip = model.body_index("link2")
        cons = [ikc.point_to_point_distance_constraint(
            tip, (0, 0, -1.0), -1, (0.5, 0, -1.0), 0.3, 0.3)]
        q, res = ikc.solve_ik_constraints(
            model, params, jnp.asarray([0.2, -0.1], F64), cons)
        assert bool(res.success)
        d = np.linalg.norm(_tip(model, params, q) - [0.5, 0, -1.0])
        np.testing.assert_allclose(d, 0.3, atol=1e-3)

    def test_orientation(self):
        model, params = _two_link()
        l2 = model.body_index("link2")
        # link2 within 0.05 rad of world orientation: q1 + q2 ~ 0
        cons = [ikc.orientation_constraint(-1, l2, 0.05)]
        q, res = ikc.solve_ik_constraints(
            model, params, jnp.asarray([0.4, -0.1], F64), cons)
        assert bool(res.success)
        assert abs(float(q[0] + q[1])) < 0.05 + 1e-6

    def test_gaze_target(self):
        model, params = _two_link()
        l2 = model.body_index("link2")
        # the -z axis of link2 (its length direction) must gaze at a world
        # point, within a 0.1 rad cone
        target = np.array([-0.9, 0.0, -0.9])
        cons = [ikc.gaze_target_constraint(
            l2, (0, 0, 0), (0, 0, -1.0), -1, target, 0.1)]
        q, res = ikc.solve_ik_constraints(
            model, params, jnp.asarray([0.2, 0.2], F64), cons)
        assert bool(res.success)
        R, p = kin.forward_kinematics(model, params, q)
        n_W = np.asarray(R[l2] @ jnp.asarray([0, 0, -1.0], F64))
        d = target - np.asarray(p[l2])
        cosang = n_W @ d / np.linalg.norm(d)
        assert cosang > np.cos(0.1) - 1e-6

    def test_angle_between_vectors(self):
        model, params = _two_link()
        l1 = model.body_index("link1")
        l2 = model.body_index("link2")
        # link axes at exactly 0.7 rad relative angle: |q2| = 0.7
        cons = [ikc.angle_between_vectors_constraint(
            l1, (0, 0, 1), l2, (0, 0, 1), 0.7, 0.7)]
        q, res = ikc.solve_ik_constraints(
            model, params, jnp.asarray([0.1, 0.5], F64), cons)
        assert bool(res.success)
        np.testing.assert_allclose(abs(float(q[1])), 0.7, atol=1e-4)

    def test_com_position(self):
        model, params = _two_link()
        # swing the arm so the whole-model com sits at x = -0.4
        cons = [ikc.com_position_constraint(
            (-0.401, -1, -10), (-0.399, 1, 10))]
        q, res = ikc.solve_ik_constraints(
            model, params, jnp.asarray([0.3, 0.3], F64), cons)
        assert bool(res.success)
        R, p = kin.forward_kinematics(model, params, q)
        com = np.zeros(3)
        for i in range(2):
            com += np.asarray(p[i] + R[i] @ params.com[i])
        com /= 2.0
        np.testing.assert_allclose(com[0], -0.4, atol=2e-3)

    def test_multiple_constraints_and_limits(self):
        model, params = _two_link()
        tip = model.body_index("link2")
        cons = [
            ikc.position_constraint(
                tip, (0, 0, -1.0), -1,
                (-1.2, -0.1, -1.8), (-0.2, 0.1, -0.8)),
            ikc.orientation_constraint(-1, tip, 1.2),
        ]
        q, res = ikc.solve_ik_constraints(
            model, params, jnp.asarray([0.2, 0.2], F64), cons,
            q_lower=jnp.asarray([-1.5, -1.5], F64),
            q_upper=jnp.asarray([1.5, 1.5], F64))
        assert bool(res.success)
        t = _tip(model, params, q)
        assert -1.2 - 1e-5 <= t[0] <= -0.2 + 1e-5
        assert abs(float(q[0] + q[1])) <= 1.2 + 1e-6
        assert np.all(np.abs(np.asarray(q)) <= 1.5 + 1e-9)
