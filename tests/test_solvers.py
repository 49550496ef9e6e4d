"""QP/IPM/SQP solver tests.

Mirrors the reference's solver test strategy (solvers/test/osqp_solver_test.cc,
snopt_solver_test.cc idioms): known-solution QPs, degenerate cases, and
batched (vmap) solves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.solvers.ipm import IpmOptions, solve_qp_ipm
from drake_tpu.solvers.qp import QpOptions, solve_qp
from drake_tpu.solvers import sqp


def random_qp(seed, n=10, m=3):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(n, n))
    P = jnp.asarray(L @ L.T + np.eye(n))
    q = jnp.asarray(rng.normal(size=n))
    G = jnp.asarray(rng.normal(size=(m, n)))
    b = jnp.asarray(rng.normal(size=m))
    return P, q, G, b


class TestIpm:
    def test_unconstrained_matches_closed_form(self):
        P, q, _, _ = random_qp(0)
        n = q.shape[0]
        sol = solve_qp_ipm(
            P, q, jnp.zeros((1, n)), jnp.zeros(1), jnp.full(n, -jnp.inf), jnp.full(n, jnp.inf)
        )
        np.testing.assert_allclose(sol.w, -jnp.linalg.solve(P, q), atol=1e-7)

    def test_equality_constrained(self):
        P, q, G, b = random_qp(1)
        n = q.shape[0]
        sol = solve_qp_ipm(P, q, G, b, jnp.full(n, -jnp.inf), jnp.full(n, jnp.inf))
        # KKT: Pw + q + G'y = 0, Gw = b
        np.testing.assert_allclose(G @ sol.w, b, atol=1e-7)
        np.testing.assert_allclose(P @ sol.w + q + G.T @ sol.y, 0.0, atol=1e-6)

    def test_box_active(self):
        """Minimize ||w||^2 - 2 e'w with box [0, 0.5]: solution all at 0.5."""
        n = 6
        P = 2 * jnp.eye(n)
        q = -2 * jnp.ones(n)
        sol = solve_qp_ipm(
            P, q, jnp.zeros((1, n)), jnp.zeros(1), jnp.zeros(n), jnp.full(n, 0.5)
        )
        np.testing.assert_allclose(sol.w, 0.5, atol=1e-7)
        # upper duals positive, lower zero
        assert float(sol.z_upper.min()) > 0.5  # z_u = 2 - 2*0.5*... = 1
        np.testing.assert_allclose(sol.z_lower, 0.0, atol=1e-6)

    def test_ill_conditioned(self):
        P, q, G, b = random_qp(2)
        n = q.shape[0]
        sol = solve_qp_ipm(
            P + 1e8 * jnp.eye(n), q * 1e5, G, b,
            jnp.full(n, -10.0), jnp.full(n, 10.0),
        )
        assert bool(sol.converged)

    def test_vmap_batch(self):
        n, m = 8, 2
        Ps, qs, Gs, bs = [], [], [], []
        for s in range(16):
            P, q, G, b = random_qp(s, n, m)
            Ps.append(P); qs.append(q); Gs.append(G); bs.append(b)
        Ps, qs, Gs, bs = map(jnp.stack, (Ps, qs, Gs, bs))
        lb = jnp.full((n,), -2.0)
        ub = jnp.full((n,), 2.0)
        sols = jax.vmap(lambda P, q, G, b: solve_qp_ipm(P, q, G, b, lb, ub))(
            Ps, qs, Gs, bs
        )
        assert bool(jnp.all(sols.converged))
        # Each batched solution satisfies its own KKT system.
        for i in range(16):
            w = sols.w[i]
            assert float(jnp.abs(Gs[i] @ w - bs[i]).max()) < 1e-6
            grad = Ps[i] @ w + qs[i] + Gs[i].T @ sols.y[i] - sols.z_lower[i] + sols.z_upper[i]
            assert float(jnp.abs(grad).max()) < 1e-5


class TestAdmmQp:
    def test_matches_ipm(self):
        P, q, G, b = random_qp(3)
        n = q.shape[0]
        lb, ub = jnp.full(n, -1.5), jnp.full(n, 1.5)
        A = jnp.concatenate([G, jnp.eye(n)], axis=0)
        l = jnp.concatenate([b, lb])
        u = jnp.concatenate([b, ub])
        admm = solve_qp(P, q, A, l, u)
        ipm = solve_qp_ipm(P, q, G, b, lb, ub)
        np.testing.assert_allclose(admm.x, ipm.w, atol=1e-5)


class TestSqp:
    def test_equality_constrained_rosenbrock(self):
        """min (1-x)^2 + 100(y-x^2)^2  s.t.  x + y = 1."""

        def cost(z):
            return (1 - z[0]) ** 2 + 100 * (z[1] - z[0] ** 2) ** 2

        def con(z):
            return jnp.array([z[0] + z[1] - 1.0])

        res = sqp.solve(lambda z: cost(z), lambda z: con(z), jnp.array([-1.0, 2.0]))
        assert bool(res.success)
        # Known solution: x + y = 1 with minimal Rosenbrock; x ~ 0.6188...
        np.testing.assert_allclose(float(res.z[0] + res.z[1]), 1.0, atol=1e-6)
        g = jax.grad(cost)(res.z)
        C = jax.jacfwd(con)(res.z)
        # Stationarity: g + C'lam = 0 for some lam (project out C direction).
        lam = -jnp.linalg.lstsq(C.T, g)[0]
        np.testing.assert_allclose(g + C.T @ lam, 0.0, atol=1e-4)

    def test_box_constrained(self):
        """min ||z - 2|| s.t. sum z = 1, 0 <= z <= 0.4, n=4: active boxes."""

        def cost(z):
            return jnp.sum((z - 2.0) ** 2)

        def con(z):
            return jnp.array([jnp.sum(z) - 1.0])

        n = 4
        res = sqp.solve(
            lambda z: cost(z),
            lambda z: con(z),
            jnp.full(n, 0.25),
            jnp.zeros(n),
            jnp.full(n, 0.4),
        )
        assert bool(res.success)
        np.testing.assert_allclose(float(jnp.sum(res.z)), 1.0, atol=1e-6)
        np.testing.assert_allclose(res.z, 0.25, atol=1e-6)  # symmetric solution
