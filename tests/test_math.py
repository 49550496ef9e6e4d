"""Rotation/transform/spatial/Riccati math tests.

Mirrors the reference's math test strategy (math/test/rotation_matrix_test.cc,
math/test/riccati_test.cc idioms): compare against closed forms and
round-trips with tight f64 tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.math import rotations as rot
from drake_tpu.math import spatial as sp
from drake_tpu.math.riccati import (
    solve_care,
    solve_dare,
    solve_lyapunov_continuous,
    solve_lyapunov_discrete,
)
from drake_tpu.math.transforms import RigidTransform


def rng_rpy(seed, n=16):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1.4, 1.4, size=(n, 3)))


class TestRotations:
    def test_rpy_round_trip(self):
        rpy = rng_rpy(0)
        R = rot.rpy_to_rotation(rpy)
        rpy2 = rot.rotation_to_rpy(R)
        np.testing.assert_allclose(rpy, rpy2, atol=1e-12)

    def test_orthonormal(self):
        R = rot.rpy_to_rotation(rng_rpy(1))
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-14)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-14)

    def test_quat_round_trip(self):
        rpy = rng_rpy(2)
        R = rot.rpy_to_rotation(rpy)
        q = rot.rotation_to_quat(R)
        R2 = rot.quat_to_rotation(q)
        np.testing.assert_allclose(R, R2, atol=1e-12)

    def test_quat_rotate_matches_matrix(self):
        rpy = rng_rpy(3)
        R = rot.rpy_to_rotation(rpy)
        q = rot.rotation_to_quat(R)
        v = jnp.asarray(np.random.default_rng(4).normal(size=(16, 3)))
        np.testing.assert_allclose(
            rot.quat_rotate(q, v),
            jnp.einsum("...ij,...j->...i", R, v),
            atol=1e-12,
        )

    def test_hat_vee(self):
        v = jnp.asarray(np.random.default_rng(5).normal(size=(8, 3)))
        u = jnp.asarray(np.random.default_rng(6).normal(size=(8, 3)))
        np.testing.assert_allclose(
            jnp.einsum("...ij,...j->...i", rot.hat(v), u), jnp.cross(v, u), atol=1e-14
        )
        np.testing.assert_allclose(rot.vee(rot.hat(v)), v, atol=1e-14)

    def test_angular_velocity_consistency(self):
        """w from rpy rates must equal numerical dR/dt relation: hat(w_A) = Rdot R^T."""
        rpy = jnp.array([0.3, -0.4, 0.7])
        rpy_dot = jnp.array([0.11, -0.23, 0.31])
        w_A = rot.rpy_rates_to_angular_velocity_in_parent(rpy, rpy_dot)
        Rdot = jax.jacfwd(rot.rpy_to_rotation)(rpy) @ rpy_dot
        R = rot.rpy_to_rotation(rpy)
        w_A_expected = rot.vee(Rdot @ R.T)
        np.testing.assert_allclose(w_A, w_A_expected, atol=1e-12)
        # child-frame version: w_B = R^T w_A
        w_B = rot.rpy_rates_to_angular_velocity_in_child(rpy, rpy_dot)
        np.testing.assert_allclose(w_B, R.T @ w_A, atol=1e-12)

    def test_rpy_ddt_inverts_angular_accel(self):
        """rpy_ddt(alpha(rpy_ddt0)) == rpy_ddt0 for consistency."""
        rpy = jnp.array([0.2, 0.5, -0.3])
        rpy_dot = jnp.array([0.4, -0.1, 0.2])
        rpy_ddt0 = jnp.array([0.3, 0.8, -0.5])

        # alpha_A = d/dt (M rpy_dot) = M rpy_ddt + Mdot rpy_dot; get via jvp.
        def w_fn(state):
            return rot.rpy_rates_to_angular_velocity_in_parent(state[:3], state[3:])

        state = jnp.concatenate([rpy, rpy_dot])
        state_dot = jnp.concatenate([rpy_dot, rpy_ddt0])
        _, alpha_A = jax.jvp(w_fn, (state,), (state_dot,))
        rpy_ddt = rot.rpy_ddt_from_angular_accel_in_parent(rpy, rpy_dot, alpha_A)
        np.testing.assert_allclose(rpy_ddt, rpy_ddt0, atol=1e-10)

    def test_quat_integrate(self):
        """Integrating constant w_B matches axis-angle rotation."""
        q0 = rot.quat_identity(jnp.float64)
        w = jnp.array([0.0, 0.0, 1.0])
        q1 = rot.quat_integrate(q0, w, jnp.pi / 2)
        R = rot.quat_to_rotation(q1)
        np.testing.assert_allclose(R, rot.rot_z(jnp.pi / 2), atol=1e-12)


class TestRigidTransform:
    def test_compose_inverse(self):
        rng = np.random.default_rng(7)
        X1 = RigidTransform(
            R=rot.rpy_to_rotation(jnp.asarray(rng.normal(size=3))),
            p=jnp.asarray(rng.normal(size=3)),
        )
        X2 = RigidTransform(
            R=rot.rpy_to_rotation(jnp.asarray(rng.normal(size=3))),
            p=jnp.asarray(rng.normal(size=3)),
        )
        X12 = X1 @ X2
        pt = jnp.asarray(rng.normal(size=3))
        np.testing.assert_allclose(X12.apply(pt), X1.apply(X2.apply(pt)), atol=1e-12)
        ident = X1 @ X1.inverse()
        np.testing.assert_allclose(ident.R, jnp.eye(3), atol=1e-12)
        np.testing.assert_allclose(ident.p, jnp.zeros(3), atol=1e-12)

    def test_matrix(self):
        X = RigidTransform.from_rpy_xyz(jnp.array([0.1, 0.2, 0.3]), [1.0, 2.0, 3.0])
        M = X.as_matrix()
        pt = jnp.array([0.5, -0.5, 1.5])
        hom = jnp.concatenate([pt, jnp.ones(1)])
        np.testing.assert_allclose((M @ hom)[:3], X.apply(pt), atol=1e-12)


class TestSpatial:
    def test_shift_velocity_force_power(self):
        """Power is invariant under shifting the measurement point."""
        rng = np.random.default_rng(8)
        V = jnp.asarray(rng.normal(size=6))
        F = jnp.asarray(rng.normal(size=6))
        p = jnp.asarray(rng.normal(size=3))
        power = V @ F
        V_q = sp.shift_velocity(V, p)
        F_q = sp.shift_force(F, p)
        np.testing.assert_allclose(V_q @ F_q, power, atol=1e-12)

    def test_spatial_inertia_shift(self):
        """Point mass about its own location has zero rotational inertia;
        shifting to an offset point produces the parallel-axis value."""
        m = jnp.asarray(2.0)
        zero3 = jnp.zeros(3)
        M_com = sp.spatial_inertia_matrix(m, zero3, jnp.zeros((3, 3)))
        p = jnp.array([0.0, 0.0, 1.0])
        M_shift = sp.shift_spatial_inertia(M_com, -p)
        M_direct = sp.spatial_inertia_point_mass(m, p)
        np.testing.assert_allclose(M_shift, M_direct, atol=1e-12)


class TestRiccati:
    def test_care_double_integrator(self):
        """CARE for the double integrator has a known closed form.

        A=[[0,1],[0,0]], B=[[0],[1]], Q=I, R=I -> S = [[sqrt(3),1],[1,sqrt(3)]]."""
        A = jnp.array([[0.0, 1.0], [0.0, 0.0]])
        B = jnp.array([[0.0], [1.0]])
        Q = jnp.eye(2)
        R = jnp.eye(1)
        S = solve_care(A, B, Q, R)
        s3 = np.sqrt(3.0)
        np.testing.assert_allclose(S, [[s3, 1.0], [1.0, s3]], atol=1e-8)

    def test_care_random_residual(self):
        rng = np.random.default_rng(9)
        n, m = 5, 2
        A = jnp.asarray(rng.normal(size=(n, n)))
        B = jnp.asarray(rng.normal(size=(n, m)))
        Qh = rng.normal(size=(n, n))
        Q = jnp.asarray(Qh @ Qh.T + n * np.eye(n))
        R = jnp.eye(m)
        S = solve_care(A, B, Q, R)
        res = A.T @ S + S @ A - S @ B @ jnp.linalg.solve(R, B.T @ S) + Q
        assert float(jnp.abs(res).max()) < 1e-6
        # stabilizing: closed-loop eigenvalues in LHP
        K = jnp.linalg.solve(R, B.T @ S)
        eigs = np.linalg.eigvals(np.asarray(A - B @ K))
        assert np.all(eigs.real < 0)

    def test_dare_residual(self):
        rng = np.random.default_rng(10)
        n, m = 4, 2
        A = jnp.asarray(rng.normal(size=(n, n)) * 0.9)
        B = jnp.asarray(rng.normal(size=(n, m)))
        Q = jnp.eye(n)
        R = jnp.eye(m)
        S = solve_dare(A, B, Q, R)
        G = jnp.linalg.solve(R + B.T @ S @ B, B.T @ S @ A)
        res = A.T @ S @ A - S - A.T @ S @ B @ G + Q
        assert float(jnp.abs(res).max()) < 1e-6
        eigs = np.linalg.eigvals(np.asarray(A - B @ G))
        assert np.all(np.abs(eigs) < 1.0)

    def test_lyapunov(self):
        rng = np.random.default_rng(11)
        n = 4
        A = jnp.asarray(rng.normal(size=(n, n)) - 3 * np.eye(n))  # Hurwitz-ish
        Qh = rng.normal(size=(n, n))
        Q = jnp.asarray(Qh @ Qh.T + np.eye(n))
        X = solve_lyapunov_continuous(A, Q)
        np.testing.assert_allclose(A @ X + X @ A.T, -Q, atol=1e-6)

        Ad_raw = rng.normal(size=(n, n))
        Ad = jnp.asarray(0.9 * Ad_raw / np.abs(np.linalg.eigvals(Ad_raw)).max())
        Xd = solve_lyapunov_discrete(Ad, Q)
        np.testing.assert_allclose(Ad @ Xd @ Ad.T - Xd, -Q, atol=1e-6)

    def test_vmap_batched_care(self):
        """The whole point: Riccati solves batch under vmap."""
        rng = np.random.default_rng(12)
        A = jnp.asarray(rng.normal(size=(8, 3, 3)))
        B = jnp.asarray(rng.normal(size=(8, 3, 1)))
        Q = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
        R = jnp.broadcast_to(jnp.eye(1), (8, 1, 1))
        Ss = jax.vmap(solve_care)(A, B, Q, R)
        for i in range(8):
            res = (
                A[i].T @ Ss[i]
                + Ss[i] @ A[i]
                - Ss[i] @ B[i] @ jnp.linalg.solve(R[i], B[i].T @ Ss[i])
                + Q[i]
            )
            assert float(jnp.abs(res).max()) < 1e-5


class TestRotationLog:
    def test_round_trip_with_rodrigues(self):
        """rotation_log(axis_angle_to_rotation(a, t)) == a * t."""
        from drake_tpu.math import rotations as rot

        rng = np.random.default_rng(7)
        for _ in range(10):
            a = rng.normal(size=3)
            a = a / np.linalg.norm(a)
            t = rng.uniform(0.01, 2.5)
            R = rot.axis_angle_to_rotation(jnp.asarray(a), jnp.asarray(t))
            w = np.asarray(rot.rotation_log(R))
            np.testing.assert_allclose(w, a * t, atol=1e-8)

    def test_identity_and_small_angle_gradient(self):
        from drake_tpu.math import rotations as rot

        np.testing.assert_allclose(
            np.asarray(rot.rotation_log(jnp.eye(3))), np.zeros(3), atol=1e-12
        )
        # Smooth near identity: gradient through the log of a tiny rotation
        # must be finite (the where-branch trap).
        def f(t):
            R = rot.axis_angle_to_rotation(jnp.asarray([0.0, 0.0, 1.0]), t)
            return jnp.sum(rot.rotation_log(R) ** 2)

        g = jax.grad(f)(jnp.asarray(1e-8))
        assert np.isfinite(float(g))
