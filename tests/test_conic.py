"""Conic (SOCP/SDP) solver + mixed-integer branch-and-bound tests.

Reference roles covered: solvers/scs_solver.cc + clarabel_solver.cc (conic
backends), solvers/branch_and_bound.h (MIP), LorentzConeConstraint /
RotatedLorentzConeConstraint / PositiveSemidefiniteConstraint /
LinearMatrixInequalityConstraint from solvers/constraint.h.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.solvers import conic
from drake_tpu.solvers.program import MathematicalProgram, Solve


def test_soc_projection():
    # Inside stays, polar-inside zeros, shell projects.
    v_in = jnp.asarray([2.0, 1.0, 0.5])
    assert jnp.allclose(conic._project_soc(v_in), v_in)
    v_polar = jnp.asarray([-2.0, 1.0, 0.0])
    assert jnp.allclose(conic._project_soc(v_polar), 0.0)
    v_shell = jnp.asarray([0.0, 2.0, 0.0])
    p = conic._project_soc(v_shell)
    assert jnp.allclose(p, jnp.asarray([1.0, 1.0, 0.0]), atol=1e-12)


def test_psd_projection():
    A = jnp.asarray([[1.0, 0.0], [0.0, -2.0]])
    P = conic._project_psd(A.reshape(4), 2).reshape(2, 2)
    assert jnp.allclose(P, jnp.asarray([[1.0, 0.0], [0.0, 0.0]]), atol=1e-12)


def test_conic_lp():
    # min -x0 - x1 s.t. x0 + x1 <= 1, x >= 0  -> cost -1 on the simplex edge.
    c = jnp.asarray([-1.0, -1.0])
    # rows: s0 = 1 - x0 - x1 >= 0; s1 = x0 >= 0; s2 = x1 >= 0.
    A = jnp.asarray([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    b = jnp.asarray([1.0, 0.0, 0.0])
    sol = conic.solve_conic(None, c, A, b, conic.ConeDims(nonneg=3))
    assert bool(sol.converged)
    assert float(c @ sol.x) == pytest.approx(-1.0, abs=1e-5)


def test_socp_min_norm():
    # min t s.t. ||x - p|| <= t, x on the plane x0 + x1 = 1.
    # p = (1, 1): distance to the plane is |1+1-1|/sqrt(2) = 1/sqrt(2).
    p = np.array([1.0, 1.0])
    tx = MathematicalProgram()
    z = tx.NewContinuousVariables(3, "z")  # z = (t, x0, x1)
    tx.AddLinearCost([1.0, 0.0, 0.0], z)
    tx.AddLinearEqualityConstraint([[0.0, 1.0, 1.0]], [1.0], z)
    A = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    b = np.array([0.0, -p[0], -p[1]])
    tx.AddLorentzConeConstraint(A, b, z)
    res = Solve(tx)
    assert res.is_success()
    assert res.optimal_cost == pytest.approx(1.0 / np.sqrt(2.0), abs=1e-4)


def test_rotated_lorentz_cone():
    # min x0 + x1 s.t. x0 * x1 >= 1, x0, x1 >= 0  -> min at x0 = x1 = 1.
    prog = MathematicalProgram()
    z = prog.NewContinuousVariables(3, "z")  # (x0, x1, u) with u fixed 1
    prog.AddLinearCost([1.0, 1.0, 0.0], z)
    prog.AddLinearEqualityConstraint([[0.0, 0.0, 1.0]], [1.0], z)
    prog.AddRotatedLorentzConeConstraint(np.eye(3), np.zeros(3), z)
    res = Solve(prog)
    assert res.is_success()
    assert res.optimal_cost == pytest.approx(2.0, abs=1e-4)


def test_sdp_max_eigenvalue():
    # min t s.t. t*I - A >= 0 (PSD)  -> t* = lambda_max(A).
    A = np.array([[2.0, 1.0], [1.0, 3.0]])
    lam_max = np.linalg.eigvalsh(A)[-1]
    prog = MathematicalProgram()
    t = prog.NewContinuousVariables(1, "t")
    prog.AddLinearCost([1.0], t)
    eye = np.eye(2)
    prog.AddLinearMatrixInequalityConstraint([-A, eye], t)
    res = Solve(prog)
    assert res.is_success()
    assert res.optimal_cost == pytest.approx(lam_max, abs=1e-4)


def test_sdp_matrix_variable():
    # min tr(X) s.t. X >= 0 (PSD), X00 + X11 >= 2, X01 = 0.3.
    # Solution: diag entries split to meet the trace bound -> tr = 2.
    prog = MathematicalProgram()
    X = prog.NewSymmetricContinuousVariables(2, "X")  # svec: (X00, X10, X11)
    prog.AddPositiveSemidefiniteConstraint(X)
    prog.AddLinearCost([1.0, 0.0, 1.0], X)  # trace
    prog.AddLinearConstraint([[1.0, 0.0, 1.0]], 2.0, np.inf, X)
    prog.AddLinearEqualityConstraint([[0.0, 1.0, 0.0]], [0.3], X)
    res = Solve(prog)
    assert res.is_success()
    assert res.optimal_cost == pytest.approx(2.0, abs=1e-3)
    # And the returned matrix really is PSD.
    sv = res.GetSolution(X)
    M = np.array([[sv[0], sv[1]], [sv[1], sv[2]]])
    assert np.linalg.eigvalsh(M).min() >= -1e-5


def test_conic_qp_matches_ipm():
    # The same strictly-convex QP through both backends.
    rng = np.random.default_rng(0)
    L = rng.normal(size=(4, 4))
    P = L @ L.T + np.eye(4)
    q = rng.normal(size=4)
    prog = MathematicalProgram()
    x = prog.NewContinuousVariables(4, "x")
    prog.AddQuadraticCost(P, q, x)
    prog.AddBoundingBoxConstraint(-0.1, 0.1, x)
    res_qp = Solve(prog)  # dispatches to IPM ('qp' type)
    # Force the conic path by adding a vacuous SOC: t >= ||0||, t = 1.
    t = prog.NewContinuousVariables(1, "t")
    prog.AddLinearEqualityConstraint([[1.0]], [1.0], t)
    prog.AddLorentzConeConstraint([[1.0]], [0.0], t)
    assert prog.program_type() == "conic"
    res_conic = Solve(prog)
    assert res_conic.is_success()
    np.testing.assert_allclose(
        res_conic.GetSolution(x), res_qp.GetSolution(x), atol=2e-4
    )


def test_mip_knapsack():
    # max 3b0 + 4b1 + 2b2 s.t. 2b0 + 3b1 + b2 <= 4  -> b = (1, 0, 1) or
    # (0, 1, 1): values 5 vs 6 -> optimum picks (0,1,1) with value 6.
    prog = MathematicalProgram()
    b = prog.NewBinaryVariables(3, "b")
    prog.AddLinearCost([-3.0, -4.0, -2.0], b)
    prog.AddLinearConstraint([[2.0, 3.0, 1.0]], -np.inf, 4.0, b)
    res = Solve(prog)
    assert res.is_success()
    sol = np.round(res.GetSolution(b))
    np.testing.assert_allclose(sol, [0.0, 1.0, 1.0])
    assert res.optimal_cost == pytest.approx(-6.0, abs=1e-4)


def test_mip_quadratic():
    # min (x - 0.4)^2 + (y - 0.7)^2 with x, y binary -> (0, 1).
    prog = MathematicalProgram()
    b = prog.NewBinaryVariables(2, "b")
    prog.AddQuadraticCost(
        2.0 * np.eye(2), -2.0 * np.array([0.4, 0.7]), b, c=0.4**2 + 0.7**2
    )
    res = Solve(prog)
    assert res.is_success()
    np.testing.assert_allclose(np.round(res.GetSolution(b)), [0.0, 1.0])
    assert res.optimal_cost == pytest.approx(0.4**2 + 0.3**2, abs=1e-4)


def test_conic_solver_vmappable():
    # A batch of SOCPs in one program: min t s.t. ||x - p_k|| <= t, batched
    # over targets p_k (vmap over the solver itself).
    import jax

    # z = (t, x0, x1); pin x = 0 via zero-cone rows so t* = ||p||.
    A = jnp.asarray(
        [[-1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]]
    )
    c = jnp.asarray([1.0, 0.0, 0.0])
    ps = jnp.asarray([[0.0, 0.0], [3.0, 4.0], [1.0, 1.0]])
    A2 = jnp.concatenate(
        [jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]), A], axis=0
    )

    def solve_pinned(p):
        b = jnp.concatenate([jnp.zeros(2), jnp.zeros(1), -p])
        sol = conic.solve_conic(
            None, c, A2, b, conic.ConeDims(zero=2, socs=(3,)),
            conic.ConicOptions(max_iters=4000, tol=1e-8),
        )
        return sol.x[0]

    ts = jax.vmap(solve_pinned)(ps)
    np.testing.assert_allclose(
        np.asarray(ts), [0.0, 5.0, np.sqrt(2.0)], atol=1e-4
    )
