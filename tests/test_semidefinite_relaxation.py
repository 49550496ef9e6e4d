"""Shor semidefinite relaxation tests
(solvers/semidefinite_relaxation.py — the MakeSemidefiniteRelaxation
role, reference solvers/semidefinite_relaxation.h)."""

import numpy as np

from drake_tpu.solvers.program import MathematicalProgram
from drake_tpu.solvers.semidefinite_relaxation import (
    extract_x,
    make_semidefinite_relaxation,
)


class TestShorRelaxation:
    def test_convex_qp_is_tight(self):
        # min |x|^2 - 2 x0 - 4 x1 on [-1, 1]^2 -> x* = (1, 1).
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2)
        prog.AddQuadraticCost(np.eye(2) * 2, np.array([-2.0, -4.0]), x)
        prog.AddBoundingBoxConstraint(-1.0, 1.0, x)
        sdp, M = make_semidefinite_relaxation(prog)
        res = sdp.Solve()
        assert res.is_success()
        np.testing.assert_allclose(extract_x(res, M, 2), [1.0, 1.0],
                                   atol=2e-3)

    def test_nonconvex_box_needs_rlt(self):
        # min -|x|^2 on [-1, 1]^2: true min -2.  The bare Shor relaxation
        # is UNBOUNDED (-X_ii free below); the RLT products of the box
        # rows give X_ii <= 1 and make the bound exact.
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2)
        prog.AddQuadraticCost(-2.0 * np.eye(2), np.zeros(2), x)
        prog.AddBoundingBoxConstraint(-1.0, 1.0, x)
        sdp, _ = make_semidefinite_relaxation(prog)
        res = sdp.Solve()
        assert res.is_success()
        np.testing.assert_allclose(float(res.optimal_cost), -2.0, atol=5e-3)

    def test_binary_quadratic_bound(self):
        # min x'Wx with x_i^2 = 1 (AddQuadraticConstraint equality): the
        # classic max-cut SDP; on this 2-node graph the bound is exact
        # (x = [1, -1], value -2).
        W = np.array([[0.0, 1.0], [1.0, 0.0]])
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2)
        prog.AddQuadraticCost(2 * W, np.zeros(2), x)
        for i in range(2):
            Q = np.zeros((2, 2))
            Q[i, i] = 2.0
            prog.AddQuadraticConstraint(Q, np.zeros(2), 1.0, 1.0, x)
        sdp, _ = make_semidefinite_relaxation(prog)
        res = sdp.Solve()
        assert res.is_success()
        np.testing.assert_allclose(float(res.optimal_cost), -2.0, atol=5e-3)

    def test_quadratic_constraint_record_solves_as_nlp(self):
        # AddQuadraticConstraint doubles as a generic record: the NLP
        # path solves the original (nonconvex) program directly.
        import jax.numpy as jnp

        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2)
        prog.AddQuadraticCost(np.eye(2) * 2, np.array([-2.0, 0.0]), x)
        # ring constraint |x|^2 = 1
        prog.AddQuadraticConstraint(2 * np.eye(2), np.zeros(2), 1.0, 1.0, x)
        prog.SetInitialGuess(x, np.array([0.5, 0.5]))
        res = prog.Solve()
        assert res.is_success()
        sol = np.asarray(res.GetSolution(x))
        np.testing.assert_allclose(np.linalg.norm(sol), 1.0, atol=1e-4)
        np.testing.assert_allclose(sol, [1.0, 0.0], atol=1e-3)
