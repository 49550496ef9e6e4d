"""C-IRIS-role tests (geometry/optimization/cspace_free_polytope.h):
Handelman certification of collision-free C-space polytopes over the
rational forward kinematics.
"""

import numpy as np
import pytest

from drake_tpu.math import symbolic as sym
from drake_tpu.multibody.model import ModelBuilder
from drake_tpu.multibody.rational_fk import RationalForwardKinematics
from drake_tpu.planning.cspace_free import (
    SpherePair,
    certify_cspace_polytope,
    certify_positive_on_polytope,
    pair_distance_polynomial,
)


class TestHandelman:
    def test_certifies_positive_poly_on_box(self):
        s = sym.Variable("s")
        # 1 + s^2 = 0.5 (1-s)^2 + 0.5 (1+s)^2 on [-1, 1]
        g = sym.Polynomial(1.0 + s * s, indeterminates=[s])
        C = np.array([[1.0], [-1.0]])
        d = np.array([1.0, 1.0])
        res = certify_positive_on_polytope(g, C, d, [s])
        assert res.certified, res

    def test_rejects_negative_poly(self):
        s = sym.Variable("s")
        # s^2 - 0.5 is negative at s=0: no certificate can exist
        g = sym.Polynomial(s * s - 0.5, indeterminates=[s])
        C = np.array([[1.0], [-1.0]])
        d = np.array([1.0, 1.0])
        res = certify_positive_on_polytope(g, C, d, [s], degree=6)
        assert not res.certified

    def test_two_variable_positive(self):
        s1, s2 = sym.Variable("s1"), sym.Variable("s2")
        g = sym.Polynomial(
            0.5 + s1 * s1 + s2 * s2 - s1 * s2, indeterminates=[s1, s2])
        C = np.array([[1.0, 0], [-1, 0], [0, 1], [0, -1]])
        d = np.ones(4)
        res = certify_positive_on_polytope(g, C, d, [s1, s2], degree=4)
        assert res.certified, res


def _pendulum_rfk():
    b = ModelBuilder()
    b.add_body("link", parent=None, joint_type="revolute", mass=1.0,
               axis=(0, 1, 0), inertia_com=np.eye(3) * 0.1)
    b.add_body("obstacle", parent=None, joint_type="weld", mass=0.0)
    import jax.numpy as jnp

    model, params = b.build(jnp.float64)
    rfk = RationalForwardKinematics(model, params, q_star=[0.0])
    return model, rfk


class TestCspaceFreePendulum:
    """Pendulum tip sphere vs a world obstacle sphere.

    Tip traces (-sin q, 0, -cos q); the obstacle sits on that circle at
    q = 0.8 rad, so configurations near q=0.8 collide and everything with
    |q| < ~0.5 is safe.
    """

    def _pair(self, model):
        qc = 0.8
        p_obs = np.array([-np.sin(qc), 0.0, -np.cos(qc)])
        return SpherePair(
            body_a=model.body_index("link"),
            p_Aa=np.array([0.0, 0.0, -1.0]), radius_a=0.05,
            body_b=model.body_index("obstacle"),
            p_Bb=p_obs, radius_b=0.10,
        )

    def test_distance_polynomial_signs(self):
        model, rfk = _pendulum_rfk()
        g = pair_distance_polynomial(rfk, self._pair(model))
        env0 = {rfk.s[0]: 0.0}
        assert g.Evaluate(env0) > 0  # home is collision-free
        s_coll = float(np.tan(0.8 / 2))
        assert g.Evaluate({rfk.s[0]: s_coll}) < 0  # contact config collides

    def test_certifies_safe_polytope(self):
        model, rfk = _pendulum_rfk()
        ok, results = certify_cspace_polytope(
            rfk, [self._pair(model)],
            C=np.array([[1.0], [-1.0]]), d=np.array([0.2, 0.2]),
        )
        assert ok, results

    def test_refuses_colliding_polytope(self):
        model, rfk = _pendulum_rfk()
        ok, results = certify_cspace_polytope(
            rfk, [self._pair(model)],
            C=np.array([[1.0], [-1.0]]), d=np.array([0.5, 0.2]),
        )
        assert not ok  # the polytope contains the collision at s=0.423


class TestCspaceFreeTwoLink:
    def test_two_link_safe_region(self):
        b = ModelBuilder()
        b.add_body("link1", parent=None, joint_type="revolute", mass=1.0,
                   axis=(0, 1, 0), inertia_com=np.eye(3) * 0.1)
        b.add_body("link2", parent="link1", joint_type="revolute", mass=1.0,
                   axis=(0, 1, 0), X_PJ_xyz=(0, 0, -1.0),
                   inertia_com=np.eye(3) * 0.1)
        b.add_body("obstacle", parent=None, joint_type="weld", mass=0.0)
        import jax.numpy as jnp

        model, params = b.build(jnp.float64)
        rfk = RationalForwardKinematics(model, params, q_star=[0.0, 0.0])
        # obstacle well off to the side of the hanging arm
        pair = SpherePair(
            body_a=model.body_index("link2"),
            p_Aa=np.array([0.0, 0.0, -1.0]), radius_a=0.05,
            body_b=model.body_index("obstacle"),
            p_Bb=np.array([-1.8, 0.0, -1.0]), radius_b=0.10,
        )
        g = pair_distance_polynomial(rfk, pair)
        assert g.TotalDegree() <= 8
        C = np.array([[1.0, 0], [-1, 0], [0, 1], [0, -1]])
        ok, results = certify_cspace_polytope(
            rfk, [pair], C=C, d=0.15 * np.ones(4))
        assert ok, results
        # a region reaching the obstacle (tip can reach x=-1.8 when both
        # joints fold toward it) must NOT certify
        ok2, _ = certify_cspace_polytope(
            rfk, [pair], C=C, d=np.array([1.5, 0.15, 1.5, 0.15]))
        assert not ok2


class TestCapsulePairs:
    """C-IRIS beyond sphere-sphere (VERDICT round-4 item 9): capsule
    link geometry certified by adding the segment parameters t, u in
    [0, 1] as box-bounded Handelman indeterminates."""

    def _capsule_pair(self, model, p_obs0, p_obs1, r_obs=0.10):
        from drake_tpu.planning.cspace_free import CapsulePair

        # The pendulum LINK carries a capsule along its length (the real
        # link collision geometry an iiwa would have)...
        return CapsulePair(
            body_a=model.body_index("link"),
            p_Aa0=np.array([0.0, 0.0, -0.3]),
            p_Aa1=np.array([0.0, 0.0, -1.0]),
            radius_a=0.05,
            body_b=model.body_index("obstacle"),
            p_Bb0=np.asarray(p_obs0, float),
            p_Bb1=np.asarray(p_obs1, float),
            radius_b=r_obs,
        )

    def test_distance_polynomial_signs(self):
        from drake_tpu.planning.cspace_free import (
            capsule_pair_distance_polynomial,
        )

        model, rfk = _pendulum_rfk()
        # Vertical world capsule near the swing circle at q ~ 0.8.
        qc = 0.8
        p0 = np.array([-np.sin(qc), 0.0, -np.cos(qc) - 0.3])
        p1 = np.array([-np.sin(qc), 0.0, -np.cos(qc) + 0.3])
        g, (t, u) = capsule_pair_distance_polynomial(
            rfk, self._capsule_pair(model, p0, p1)
        )
        # Home config, obstacle mid-point: positive (separated).
        assert g.Evaluate({rfk.s[0]: 0.0, t: 1.0, u: 0.5}) > 0
        # Contact config: the link TIP (t=1) meets the obstacle MIDDLE
        # (u=0.5) -> penetration, negative.
        s_c = float(np.tan(qc / 2))
        assert g.Evaluate({rfk.s[0]: s_c, t: 1.0, u: 0.5}) < 0

    def test_certifies_safe_polytope_capsule_capsule(self):
        model, rfk = _pendulum_rfk()
        qc = 0.8
        p0 = np.array([-np.sin(qc), 0.0, -np.cos(qc) - 0.3])
        p1 = np.array([-np.sin(qc), 0.0, -np.cos(qc) + 0.3])
        pair = self._capsule_pair(model, p0, p1)
        ok, results = certify_cspace_polytope(
            rfk, [pair],
            C=np.array([[1.0], [-1.0]]), d=np.array([0.15, 0.15]),
        )
        assert ok, results

    def test_refuses_colliding_polytope(self):
        model, rfk = _pendulum_rfk()
        qc = 0.8
        p0 = np.array([-np.sin(qc), 0.0, -np.cos(qc) - 0.3])
        p1 = np.array([-np.sin(qc), 0.0, -np.cos(qc) + 0.3])
        pair = self._capsule_pair(model, p0, p1)
        # Polytope reaching the contact configuration s = tan(0.4) = 0.42.
        ok, _ = certify_cspace_polytope(
            rfk, [pair],
            C=np.array([[1.0], [-1.0]]), d=np.array([0.5, 0.15]),
        )
        assert not ok

    def test_sphere_capsule_mixed_list(self):
        model, rfk = _pendulum_rfk()
        qc = 0.8
        sph = SpherePair(
            body_a=model.body_index("link"),
            p_Aa=np.array([0.0, 0.0, -1.0]), radius_a=0.05,
            body_b=model.body_index("obstacle"),
            p_Bb=np.array([-np.sin(qc), 0.0, -np.cos(qc)]), radius_b=0.10,
        )
        # Sphere-capsule: zero-length segment on body A.
        from drake_tpu.planning.cspace_free import CapsulePair

        cap = CapsulePair(
            body_a=model.body_index("link"),
            p_Aa0=np.array([0.0, 0.0, -1.0]),
            p_Aa1=np.array([0.0, 0.0, -1.0]),
            radius_a=0.05,
            body_b=model.body_index("obstacle"),
            p_Bb0=np.array([-np.sin(qc), 0.0, -np.cos(qc) - 0.3]),
            p_Bb1=np.array([-np.sin(qc), 0.0, -np.cos(qc) + 0.3]),
            radius_b=0.10,
        )
        ok, results = certify_cspace_polytope(
            rfk, [sph, cap],
            C=np.array([[1.0], [-1.0]]), d=np.array([0.15, 0.15]),
        )
        assert ok, results
