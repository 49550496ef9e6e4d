"""MathematicalProgram container tests (reference solvers/test/
mathematical_program_test.cc patterns: QP/LP/NLP classification, known
optima, constraint satisfaction)."""

import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.solvers.program import (
    MathematicalProgram,
    Solve,
)


class TestQp:
    def test_unconstrained_quadratic(self):
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2)
        # min (x0-1)^2 + (x1+2)^2
        prog.AddQuadraticErrorCost(np.eye(2), [1.0, -2.0], x)
        res = Solve(prog)
        assert res.is_success()
        np.testing.assert_allclose(res.GetSolution(x), [1.0, -2.0], atol=1e-6)
        assert abs(res.optimal_cost) < 1e-8

    def test_equality_constrained_qp(self):
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2)
        prog.AddQuadraticCost(np.eye(2), np.zeros(2), x)
        prog.AddLinearEqualityConstraint([[1.0, 1.0]], [1.0], x)
        res = Solve(prog)
        assert res.is_success()
        np.testing.assert_allclose(res.GetSolution(x), [0.5, 0.5], atol=1e-6)

    def test_box_and_two_sided_rows(self):
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2)
        prog.AddQuadraticErrorCost(np.eye(2), [2.0, 2.0], x)
        prog.AddBoundingBoxConstraint([0.0, 0.0], [1.0, 5.0], x)
        # 2-sided general row: 0 <= x0 + x1 <= 2.5
        prog.AddLinearConstraint([[1.0, 1.0]], 0.0, 2.5, x)
        res = Solve(prog)
        assert res.is_success()
        sol = res.GetSolution(x)
        # x0 capped at 1; then x1 limited by the row to 1.5.
        np.testing.assert_allclose(sol, [1.0, 1.5], atol=1e-5)

    def test_lp(self):
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2)
        prog.AddLinearCost([-1.0, -1.0], x)
        prog.AddBoundingBoxConstraint(0.0, 1.0, x)
        assert prog.program_type() == "lp"
        res = Solve(prog)
        assert res.is_success()
        np.testing.assert_allclose(res.GetSolution(x), [1.0, 1.0], atol=1e-5)

    def test_program_type_detection(self):
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(1)
        prog.AddLinearCost([1.0], x)
        assert prog.program_type() == "lp"
        prog.AddQuadraticCost(np.eye(1), np.zeros(1), x)
        assert prog.program_type() == "qp"
        prog.AddCost(lambda xx: jnp.sum(xx**4), x)
        assert prog.program_type() == "nlp"


class TestNlp:
    def test_rosenbrock_with_constraint(self):
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2)
        prog.AddCost(
            lambda z: (1 - z[0]) ** 2 + 100 * (z[1] - z[0] ** 2) ** 2, x
        )
        prog.SetInitialGuess(x, [-1.0, 1.0])
        res = Solve(prog)
        assert res.is_success()
        np.testing.assert_allclose(res.GetSolution(x), [1.0, 1.0], atol=1e-4)

    def test_nonlinear_equality(self):
        """min x0 + x1 s.t. x0^2 + x1^2 = 1, x >= 0 is infeasible for both
        negative; optimum at boundary of circle in the first quadrant: the
        minimum of x0+x1 on the quarter circle is at an axis point (value 1)."""
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2)
        prog.AddLinearCost([1.0, 1.0], x)
        prog.AddConstraint(lambda z: jnp.sum(z**2), 1.0, 1.0, x)
        prog.AddBoundingBoxConstraint(0.0, np.inf, x)
        prog.SetInitialGuess(x, [0.9, 0.4])
        res = Solve(prog)
        assert res.is_success()
        sol = res.GetSolution(x)
        np.testing.assert_allclose(float(np.sum(sol**2)), 1.0, atol=1e-5)
        assert res.optimal_cost < 1.0 + 1e-3

    def test_nonlinear_inequality_slack(self):
        """min (x-3)^2 s.t. x^2 <= 4 -> x = 2."""
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(1)
        prog.AddCost(lambda z: (z[0] - 3.0) ** 2, x)
        prog.AddConstraint(lambda z: z[0] ** 2, -np.inf, 4.0, x)
        prog.SetInitialGuess(x, [0.5])
        res = Solve(prog)
        assert res.is_success()
        np.testing.assert_allclose(res.GetSolution(x), 2.0, atol=1e-4)

    def test_mixed_linear_and_generic(self):
        """min x'x s.t. x0 + x1 = 2 (linear eq) and x0*x1 >= 0.75."""
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2)
        prog.AddQuadraticCost(2.0 * np.eye(2), np.zeros(2), x)
        prog.AddLinearEqualityConstraint([[1.0, 1.0]], [2.0], x)
        prog.AddConstraint(lambda z: z[0] * z[1], 0.75, np.inf, x)
        prog.SetInitialGuess(x, [1.5, 0.5])
        res = Solve(prog)
        assert res.is_success()
        sol = res.GetSolution(x)
        np.testing.assert_allclose(sol.sum(), 2.0, atol=1e-5)
        # Symmetric optimum x = [1, 1] satisfies the product constraint.
        np.testing.assert_allclose(sol, [1.0, 1.0], atol=1e-3)

    def test_variable_slicing(self):
        prog = MathematicalProgram()
        xy = prog.NewContinuousVariables(4, "xy")
        head = xy[:2]
        tail = xy[2:]
        prog.AddQuadraticErrorCost(np.eye(2), [1.0, 1.0], head)
        prog.AddQuadraticErrorCost(np.eye(2), [-1.0, -1.0], tail)
        res = Solve(prog)
        assert res.is_success()
        np.testing.assert_allclose(
            res.GetSolution(xy), [1, 1, -1, -1], atol=1e-6
        )
