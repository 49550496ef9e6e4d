"""LCP solvers + legacy rigid constraint solver tests.

Reference roles: solvers/moby_lcp_solver.h (Lemke),
multibody/constraint/constraint_solver.h (Stewart-Trinkle pyramid LCP).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.multibody.constraint import solve_rigid_contact
from drake_tpu.solvers.lcp import lemke, solve_lcp_fb


class TestLemke:
    def test_trivial_q_nonnegative(self):
        res = lemke(np.eye(3), np.array([1.0, 0.5, 2.0]))
        assert res.success and np.all(res.z == 0)

    def test_known_solution(self):
        # M z + q = w, complementary. M SPD -> unique solution.
        M = np.array([[2.0, 1.0], [1.0, 2.0]])
        q = np.array([-5.0, -6.0])
        res = lemke(M, q)
        assert res.success
        w = M @ res.z + q
        assert np.all(res.z >= -1e-9) and np.all(w >= -1e-9)
        assert abs(res.z @ w) < 1e-8
        # Analytic: interior solution z = M^{-1}(-q) if positive.
        z_exact = np.linalg.solve(M, -q)
        np.testing.assert_allclose(res.z, z_exact, atol=1e-9)

    def test_mixed_active_set(self):
        M = np.array([[1.0, 0.0], [2.0, 1.0]])
        q = np.array([1.0, -1.0])
        res = lemke(M, q)
        assert res.success
        w = M @ res.z + q
        assert np.all(res.z >= -1e-9) and np.all(w >= -1e-9)
        assert abs(res.z @ w) < 1e-8

    def test_random_spd_batch(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            n = rng.integers(2, 8)
            A = rng.normal(size=(n, n))
            M = A @ A.T + 0.1 * np.eye(n)
            q = rng.normal(size=n)
            res = lemke(M, q)
            assert res.success
            w = M @ res.z + q
            assert np.all(res.z >= -1e-7) and np.all(w >= -1e-7)
            assert abs(res.z @ w) < 1e-6


class TestFbNewton:
    def test_matches_lemke_on_spd(self):
        rng = np.random.default_rng(1)
        for _ in range(10):
            n = int(rng.integers(2, 10))
            A = rng.normal(size=(n, n))
            M = A @ A.T + 0.5 * np.eye(n)
            q = rng.normal(size=n)
            ref = lemke(M, q)
            z, resid = solve_lcp_fb(jnp.asarray(M), jnp.asarray(q))
            assert float(resid) < 1e-8
            np.testing.assert_allclose(np.asarray(z), ref.z, atol=1e-6)

    def test_jit_vmap(self):
        import jax

        rng = np.random.default_rng(2)
        A = rng.normal(size=(16, 4, 4))
        M = A @ np.swapaxes(A, 1, 2) + np.eye(4)
        q = rng.normal(size=(16, 4))
        z, resid = jax.jit(jax.vmap(solve_lcp_fb))(
            jnp.asarray(M), jnp.asarray(q))
        assert float(jnp.max(resid)) < 1e-7


class TestRigidContact:
    """Single point mass on the ground plane; analytic Coulomb outcomes."""

    def _setup(self, vx, vz=-1.0, mu=0.5, m=2.0):
        M = m * jnp.eye(3, dtype=jnp.float64)  # planar: (x, y, z)
        v_star = jnp.asarray([vx, 0.0, vz], jnp.float64)
        Jn = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
        Jt = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], jnp.float64)
        return M, v_star, Jn, Jt, jnp.asarray([mu], jnp.float64)

    @pytest.mark.parametrize("use_lemke", [True, False])
    def test_sliding_coulomb_limit(self, use_lemke):
        # Fast slide: friction impulse = mu * normal impulse, opposing vx.
        M, v_star, Jn, Jt, mu = self._setup(vx=10.0, vz=-1.0)
        res = solve_rigid_contact(M, v_star, Jn, Jt, mu, use_lemke=use_lemke)
        # Normal: inelastic stop, cn = m |vz| = 2.
        np.testing.assert_allclose(float(res.cn[0]), 2.0, rtol=1e-5)
        np.testing.assert_allclose(float(res.v[2]), 0.0, atol=1e-6)
        # Tangential impulse capped at mu*cn = 1 -> dvx = -0.5.
        np.testing.assert_allclose(float(res.v[0]), 10.0 - 0.5, rtol=1e-4)

    @pytest.mark.parametrize("use_lemke", [True, False])
    def test_stiction(self, use_lemke):
        # Slow slide: friction can stop it entirely (|impulse| < mu cn).
        M, v_star, Jn, Jt, mu = self._setup(vx=0.1, vz=-1.0)
        res = solve_rigid_contact(M, v_star, Jn, Jt, mu, use_lemke=use_lemke)
        np.testing.assert_allclose(float(res.v[2]), 0.0, atol=1e-6)
        assert abs(float(res.v[0])) < 5e-3

    def test_matches_sap_qualitatively(self):
        # The pyramid (nd=8) sliding direction approximates the smooth cone.
        M, v_star, Jn, Jt, mu = self._setup(vx=3.0, vz=-2.0)
        res = solve_rigid_contact(M, v_star, Jn, Jt, mu, nd=8)
        np.testing.assert_allclose(float(res.cn[0]), 4.0, rtol=1e-4)
        np.testing.assert_allclose(float(res.v[0]), 3.0 - 1.0, rtol=1e-3)
