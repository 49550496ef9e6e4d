"""Dynamic-analysis utilities (SURVEY §5 sanitizer role) + systems/
optimization adapter tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.utils.debug import (
    assert_all_finite, checkify_nans, nan_guard, where_finite,
)


class TestNanGuard:
    def test_raises_at_nan_source(self):
        def bad(x):
            return jnp.log(x) * 0.0 + jnp.sqrt(x - 2.0)

        with nan_guard():
            with pytest.raises(FloatingPointError):
                jax.jit(bad)(jnp.asarray(1.0)).block_until_ready()

    def test_restores_setting(self):
        prev = jax.config.jax_debug_nans
        with nan_guard():
            assert jax.config.jax_debug_nans is True
        assert jax.config.jax_debug_nans == prev


class TestCheckify:
    def test_catches_nan_in_jit(self):
        def f(x):
            return jnp.sqrt(x)

        checked = jax.jit(checkify_nans(f))
        err, out = checked(jnp.asarray(-1.0))
        assert err.get() is not None
        err, out = checked(jnp.asarray(4.0))
        assert err.get() is None and float(out) == 2.0


class TestAssertAllFinite:
    def test_clean_tree_passes(self):
        assert_all_finite({"a": jnp.ones(3), "b": np.zeros(2)})

    def test_reports_bad_leaf(self):
        with pytest.raises(FloatingPointError, match="'b'"):
            assert_all_finite(
                {"a": jnp.ones(3), "b": jnp.asarray([1.0, jnp.nan])})

    def test_where_finite(self):
        x = jnp.asarray([1.0, jnp.nan])
        fb = jnp.zeros(2)
        np.testing.assert_allclose(np.asarray(where_finite(x, fb)), 0.0)
        y = jnp.asarray([1.0, 2.0])
        np.testing.assert_allclose(np.asarray(where_finite(y, fb)), [1, 2])


class TestSystemConstraintAdapter:
    def test_fixed_point_pendulum(self):
        """Find the upright equilibrium of a torque-driven pendulum."""
        from drake_tpu.systems.base import ContinuousSystem
        from drake_tpu.systems.optimization import find_fixed_point

        def f(params, x, u, t):
            th, w = x
            return jnp.asarray([w, -9.81 * jnp.sin(th) - 0.1 * w + u[0]])

        sys = ContinuousSystem(f=f, num_states=2, num_inputs=1)
        x0 = np.array([3.0, 0.1])
        u0 = np.array([0.0])
        xs, us, ok = find_fixed_point(sys, x0, u0, x_cost_weight=1e-4)
        assert ok
        # Equilibrium: sin(th) = u / 9.81 with w = 0; near-upright seed
        # converges to th ~= pi with tiny torque.
        resid = np.asarray(
            f(None, jnp.asarray(xs), jnp.atleast_1d(jnp.asarray(us)), 0.0))
        np.testing.assert_allclose(resid, 0.0, atol=1e-6)
        assert abs(xs[1]) < 1e-6

    def test_add_system_constraint_requires_contiguous(self):
        from drake_tpu.solvers.program import MathematicalProgram
        from drake_tpu.systems.base import ContinuousSystem
        from drake_tpu.systems.optimization import add_system_constraint

        sys = ContinuousSystem(
            f=lambda p, x, u, t: x, num_states=2, num_inputs=1)
        prog = MathematicalProgram()
        x = prog.NewContinuousVariables(2, "x")
        _gap = prog.NewContinuousVariables(1, "gap")
        u = prog.NewContinuousVariables(1, "u")
        with pytest.raises(ValueError):
            add_system_constraint(
                prog, sys, lambda p, x_, u_, t: x_, x, u, 0.0, 0.0)
