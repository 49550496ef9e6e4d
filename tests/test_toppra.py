"""TOPPRA tests (reference multibody/optimization/test/toppra_test.cc
patterns: straight-line trapezoid profile, limit satisfaction)."""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.trajopt.toppra import toppra

F64 = jnp.float64


class TestToppra:
    def test_straight_line_trapezoid(self):
        """1-D line of length 1 with vmax=0.5, amax=1: the time-optimal
        profile is the trapezoid with T = L/v + v/a = 2.5 s."""
        path = lambda s: jnp.asarray([s], F64) * 1.0
        res = toppra(
            path, vmax=jnp.asarray([0.5], F64), amax=jnp.asarray([1.0], F64),
            num_grid=201,
        )
        assert bool(res.feasible)
        np.testing.assert_allclose(float(res.duration), 2.5, rtol=0.03)
        # Peak speed hits the velocity limit.
        sd = np.sqrt(np.asarray(res.x))
        assert abs(sd.max() - 0.5) < 1e-6

    def test_short_line_triangle(self):
        """Short segment never reaches vmax: triangular profile with
        T = 2 sqrt(L / a)."""
        L = 0.1
        path = lambda s: jnp.asarray([s], F64) * L
        res = toppra(
            path, vmax=jnp.asarray([10.0], F64), amax=jnp.asarray([1.0], F64),
            num_grid=201,
        )
        assert bool(res.feasible)
        np.testing.assert_allclose(
            float(res.duration), 2 * np.sqrt(L / 1.0), rtol=0.05
        )

    def test_limits_respected_curved_path(self):
        """2-D quarter circle: velocity and acceleration stay within limits
        along the reconstructed timing."""
        R = 0.8

        def path(s):
            th = 0.5 * jnp.pi * s
            return R * jnp.stack([jnp.cos(th), jnp.sin(th)])

        vmax = jnp.asarray([0.6, 0.6], F64)
        amax = jnp.asarray([2.0, 2.0], F64)
        res = toppra(path, vmax=vmax, amax=amax, num_grid=301)
        assert bool(res.feasible)
        # Monotone time, positive duration.
        t = np.asarray(res.t_grid)
        assert (np.diff(t) > 0).all()
        # qdot = q'(s) sdot within limits everywhere.
        qp = jax.vmap(jax.jacfwd(path))(res.s_grid)
        qdot = np.asarray(qp) * np.sqrt(np.asarray(res.x))[:, None]
        assert (np.abs(qdot) <= np.asarray(vmax) + 1e-6).all()
        # Acceleration via finite differences in time (interior points).
        dq = np.diff(qdot, axis=0)
        dt = np.diff(t)[:, None]
        acc = dq / np.maximum(dt, 1e-9)
        assert np.abs(acc).max() <= 2.0 * 1.10  # 10% discretization slack

    def test_rest_to_rest_endpoints(self):
        path = lambda s: jnp.asarray([s, -2.0 * s], F64)
        res = toppra(
            path, vmax=jnp.asarray([1.0, 1.0], F64),
            amax=jnp.asarray([3.0, 3.0], F64), num_grid=151,
        )
        assert bool(res.feasible)
        assert float(res.x[0]) == 0.0
        np.testing.assert_allclose(float(res.x[-1]), 0.0, atol=1e-9)

    def test_vmap_over_limit_sets(self):
        path = lambda s: jnp.asarray([s], F64)
        vmaxes = jnp.asarray([[0.25], [0.5], [1.0]], F64)
        run = jax.jit(
            jax.vmap(
                lambda v: toppra(
                    path, vmax=v, amax=jnp.asarray([1.0], F64), num_grid=101
                ).duration
            )
        )
        durs = np.asarray(run(vmaxes))
        # Faster limits -> shorter durations, matching trapezoid formula.
        np.testing.assert_allclose(
            durs, [1 / 0.25 + 0.25, 1 / 0.5 + 0.5, 1 / 1 + 1], rtol=0.06
        )
