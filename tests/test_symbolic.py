"""Symbolic layer tests (common/symbolic/expression.h, polynomial.h,
decompose.h, codegen.h roles)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.math import symbolic as sym
from drake_tpu.math.symbolic import (
    Expression, Monomial, Polynomial, Variable,
    decompose_affine_expressions, decompose_linear_expressions,
    decompose_quadratic_polynomial, to_jax,
)


class TestExpression:
    def test_arithmetic_and_evaluate(self):
        x, y = Variable("x"), Variable("y")
        e = (x + 2 * y) * (x - y) / 2 + sym.sin(x) ** 2
        env = {x: 1.3, y: -0.4}
        expect = (1.3 + 2 * -0.4) * (1.3 + 0.4) / 2 + math.sin(1.3) ** 2
        assert abs(e.Evaluate(env) - expect) < 1e-12

    def test_canonical_add_collects_terms(self):
        x = Variable("x")
        e = x + x + 3 * x - 5 * x
        # collapses to 0 * x = 0
        assert e.is_constant() and e.payload == 0.0

    def test_mul_power_collection(self):
        x = Variable("x")
        e = x * x * x / x
        env = {x: 2.0}
        assert abs(e.Evaluate(env) - 4.0) < 1e-12

    def test_substitute(self):
        x, y, z = Variable("x"), Variable("y"), Variable("z")
        e = x * y + sym.cos(x)
        e2 = e.Substitute({x: z + 1.0})
        env = {y: 2.0, z: 0.5}
        assert abs(e2.Evaluate(env) - (1.5 * 2.0 + math.cos(1.5))) < 1e-12

    def test_differentiate_matches_jax(self):
        x, y = Variable("x"), Variable("y")
        e = sym.exp(x * y) + sym.atan2(y, x) + x ** 3 / (1.0 + y * y)
        de = e.Differentiate(x)
        f = to_jax(e, [x, y])
        g = jax.grad(f)
        pt = jnp.asarray([0.7, -1.2])
        env = {x: 0.7, y: -1.2}
        np.testing.assert_allclose(
            de.Evaluate(env), float(g(pt)[0]), rtol=1e-6)

    def test_expand(self):
        x, y = Variable("x"), Variable("y")
        e = ((x + y) ** 2).Expand()
        # After expansion every term is a monomial: polynomial extraction works.
        p = Polynomial(e)
        assert p.TotalDegree() == 2
        cmap = p.monomial_to_coefficient_map()
        assert cmap[Monomial({x: 1, y: 1})] == 2.0

    def test_formula_and_if_then_else(self):
        x = Variable("x")
        f = x >= 2.0
        assert f.Evaluate({x: 3.0}) and not f.Evaluate({x: 1.0})
        e = sym.if_then_else(f, x * x, -x)
        assert e.Evaluate({x: 3.0}) == 9.0
        assert e.Evaluate({x: 1.0}) == -1.0

    def test_is_polynomial(self):
        x = Variable("x")
        assert (x ** 2 + 3 * x).is_polynomial()
        assert not sym.sin(x).is_polynomial()
        assert not (1.0 / x).is_polynomial()


class TestPolynomial:
    def test_mul_and_differentiate(self):
        x, y = Variable("x"), Variable("y")
        p = Polynomial(x ** 2 + y) * Polynomial(x - 1.0)
        dp = p.Differentiate(x)  # d/dx (x^3 - x^2 + xy - y) = 3x^2 - 2x + y
        env = {x: 2.0, y: 5.0}
        assert abs(dp.Evaluate(env) - (12.0 - 4.0 + 5.0)) < 1e-12

    def test_to_expression_round_trip(self):
        x = Variable("x")
        p = Polynomial(3 * x ** 2 - x + 7)
        assert abs(p.ToExpression().Evaluate({x: 1.5}) - (6.75 - 1.5 + 7)) < 1e-12


class TestDecompose:
    def test_affine(self):
        x, y = Variable("x"), Variable("y")
        A, b = decompose_affine_expressions(
            [2 * x - 3 * y + 1, x + 4], [x, y])
        np.testing.assert_allclose(A, [[2, -3], [1, 0]])
        np.testing.assert_allclose(b, [1, 4])

    def test_linear_rejects_affine(self):
        x = Variable("x")
        with pytest.raises(ValueError):
            decompose_linear_expressions([x + 1], [x])

    def test_quadratic(self):
        x, y = Variable("x"), Variable("y")
        e = x ** 2 + 4 * x * y - 2 * y ** 2 + 3 * x - 5
        Q, b, c = decompose_quadratic_polynomial(e, [x, y])
        np.testing.assert_allclose(Q, [[2, 4], [4, -4]])
        np.testing.assert_allclose(b, [3, 0])
        assert c == -5.0

    def test_nonaffine_raises(self):
        x = Variable("x")
        with pytest.raises(ValueError):
            decompose_affine_expressions([x * x], [x])


class TestCodegen:
    def test_to_jax_jit_and_vmap(self):
        x, y = Variable("x"), Variable("y")
        exprs = [x * y + 1.0, sym.sqrt(x * x + y * y), sym.maximum(x, y)]
        f = jax.jit(to_jax(exprs, [x, y]))
        pts = jnp.asarray([[3.0, 4.0], [1.0, -1.0]])
        out = jax.vmap(f)(pts)
        np.testing.assert_allclose(
            np.asarray(out), [[13.0, 5.0, 4.0], [0.0, math.sqrt(2), 1.0]],
            rtol=1e-6)


class TestSymbolicVectorSystem:
    def test_continuous_pendulum(self):
        from drake_tpu.systems.primitives import symbolic_vector_system

        th, w = Variable("theta"), Variable("w")
        u = Variable("u")
        sys = symbolic_vector_system(
            state=[th, w],
            dynamics=[w, -9.81 * sym.sin(th) + u],
            inputs=[u],
        )
        x = jnp.asarray([0.3, 0.1])
        xdot = sys(None, x, jnp.asarray([0.5]))
        np.testing.assert_allclose(
            np.asarray(xdot), [0.1, -9.81 * math.sin(0.3) + 0.5], rtol=1e-6)
        # Linearize through the compiled dynamics (ToAutoDiffXd role).
        A, B = sys.linearize(None, jnp.zeros(2), jnp.zeros(1))
        np.testing.assert_allclose(np.asarray(A), [[0, 1], [-9.81, 0]],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(B), [[0], [1]], atol=1e-6)

    def test_discrete_logistic(self):
        from drake_tpu.systems.primitives import symbolic_vector_system

        z = Variable("z")
        sys = symbolic_vector_system(
            state=[z], dynamics=[3.7 * z * (1.0 - z)], time_period=1.0)
        x = jnp.asarray([0.4])
        x1 = sys(None, x, jnp.zeros(0))
        np.testing.assert_allclose(float(x1[0]), 3.7 * 0.4 * 0.6, rtol=1e-6)
