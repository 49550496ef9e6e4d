"""Rational forward kinematics vs numeric FK
(multibody/rational/rational_forward_kinematics.h role)."""

import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.model import ModelBuilder
from drake_tpu.multibody.rational_fk import RationalForwardKinematics


def _three_link():
    b = ModelBuilder()
    b.add_body("l1", parent=None, joint_type="revolute", mass=1.0,
               axis=(0, 0, 1), X_PJ_xyz=(0, 0, 0.1))
    b.add_body("l2", parent="l1", joint_type="revolute", mass=1.0,
               axis=(0, 1, 0), X_PJ_xyz=(0.5, 0, 0))
    b.add_body("l3", parent="l2", joint_type="prismatic", mass=0.5,
               axis=(1, 0, 0), X_PJ_xyz=(0.4, 0, 0))
    return b.build(jnp.float64)


class TestRationalFk:
    def test_matches_numeric_fk(self):
        model, params = _three_link()
        q_star = np.array([0.3, -0.2, 0.05])
        rfk = RationalForwardKinematics(model, params, q_star)
        rng = np.random.default_rng(0)
        for _ in range(5):
            q = q_star + rng.uniform(-1.0, 1.0, size=3)
            R_WB, p_WB = kin.forward_kinematics(
                model, params, jnp.asarray(q))
            for body in range(model.num_bodies):
                R, p = rfk.evaluate_pose(body, q)
                np.testing.assert_allclose(R, np.asarray(R_WB[body]),
                                           atol=1e-10)
                np.testing.assert_allclose(p, np.asarray(p_WB[body]),
                                           atol=1e-10)

    def test_pose_is_rational_polynomial_pair(self):
        """Numerators are polynomial, denominator = prod (1+s_i^2) — the
        RationalFunction property C-IRIS certification relies on."""
        model, params = _three_link()
        rfk = RationalForwardKinematics(model, params, np.zeros(3))
        NR, Np, denom = rfk.pose_expressions(2)
        from drake_tpu.math import symbolic as sym

        s0, s1, s2 = rfk.s
        expect = ((1.0 + s0 * s0) * (1.0 + s1 * s1)).Expand()
        assert sym.to_expression(denom).Expand().equal_to(expect)
        for r in range(3):
            assert sym.to_expression(Np[r]).Expand().is_polynomial()
            for c in range(3):
                assert sym.to_expression(NR[r, c]).Expand().is_polynomial()

    def test_rejects_floating(self):
        b = ModelBuilder()
        b.add_body("ball", parent=None, joint_type="floating", mass=1.0)
        model, params = b.build(jnp.float64)
        with pytest.raises(ValueError):
            RationalForwardKinematics(model, params, np.zeros(7))
