"""Tensor-parallel SAP tests: constraint-sharded Newton vs the dense solver.

SURVEY §2.9 TP row: Hessian/gradient psum reductions over a device mesh.
Runs on the virtual 8-device CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from drake_tpu.contact import sap
from drake_tpu.parallel.tp_sap import solve_sap_sharded

F64 = jnp.float64


def _synthetic_problem(nc=96, nv=12, seed=0):
    """A well-posed convex SAP problem with a mix of contact regimes."""
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(nv, nv))
    A = jnp.asarray(B @ B.T + nv * np.eye(nv), F64)
    v_star = jnp.asarray(rng.normal(size=nv), F64)
    J = jnp.asarray(rng.normal(size=(nc, 3, nv)) * 0.5, F64)
    Rt = np.abs(rng.normal(size=nc)) * 0.1 + 0.01
    Rn = np.abs(rng.normal(size=nc)) * 0.1 + 0.01
    R = jnp.asarray(np.stack([Rt, Rt, Rn], axis=1), F64)
    vhat = jnp.asarray(
        np.stack([np.zeros(nc), np.zeros(nc), rng.normal(size=nc) * 0.2],
                 axis=1), F64)
    mu = jnp.asarray(np.abs(rng.normal(size=nc)) * 0.5 + 0.1, F64)
    zero1 = jnp.zeros((0,), F64)
    data = sap.SapData(
        A=A, v_star=v_star, J=J, R=R, vhat=vhat, mu=mu,
        J_lim=jnp.zeros((0, nv), F64), R_lim=zero1, vhat_lim=zero1,
        J_eq=jnp.zeros((0, nv), F64), R_eq=zero1, vhat_eq=zero1,
        J_pd=jnp.zeros((0, nv), F64), R_pd=zero1, vhat_pd=zero1,
        glim_pd=zero1, hc=None,
    )
    return data


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("c",))


class TestShardedSap:
    def test_matches_dense_solver(self, mesh):
        data = _synthetic_problem(nc=96, nv=12)
        v0 = jnp.zeros(12, F64)
        dense = sap.solve_sap(data, v0, sap.SapParameters(max_iterations=50))
        sharded = solve_sap_sharded(data, v0, mesh, iterations=25)
        np.testing.assert_allclose(
            np.asarray(sharded.v), np.asarray(dense.v), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sharded.gamma), np.asarray(dense.gamma), atol=1e-6)

    def test_padding_is_exact(self, mesh):
        # nc = 91 is not a multiple of 8 -> 5 zero rows of padding
        data = _synthetic_problem(nc=91, nv=10, seed=3)
        v0 = jnp.zeros(10, F64)
        dense = sap.solve_sap(data, v0, sap.SapParameters(max_iterations=50))
        sharded = solve_sap_sharded(data, v0, mesh, iterations=25)
        assert sharded.gamma.shape == (91, 3)
        np.testing.assert_allclose(
            np.asarray(sharded.v), np.asarray(dense.v), atol=1e-6)

    def test_jit_compiles_once_and_runs(self, mesh):
        data = _synthetic_problem(nc=64, nv=8, seed=1)
        v0 = jnp.zeros(8, F64)
        f = jax.jit(
            lambda d: solve_sap_sharded(d, v0, mesh, iterations=15).v)
        v = f(data)
        assert bool(jnp.all(jnp.isfinite(v)))

    def test_full_families_match_dense_solver(self, mesh):
        """Limit/holonomic/PD rows fold in REPLICATED (VERDICT round-2
        item 9: the former NotImplementedError) — the sharded solve matches
        the dense solver on a problem exercising every family."""
        rng = np.random.default_rng(3)
        nv = 12
        data = _synthetic_problem(nc=96, nv=nv, seed=3)
        eye = np.eye(nv)
        data = data._replace(
            # Two active-ish joint limits.
            J_lim=jnp.asarray(eye[[0, 5]], F64),
            R_lim=jnp.asarray([0.05, 0.08], F64),
            vhat_lim=jnp.asarray([0.3, -0.1], F64),
            # One coupler-style equality between v1 and v2.
            J_eq=jnp.asarray((eye[1] - 2.0 * eye[2])[None], F64),
            R_eq=jnp.asarray([0.02], F64),
            vhat_eq=jnp.asarray([0.1], F64),
            # Two effort-limited PD rows (one saturating).
            J_pd=jnp.asarray(eye[[3, 7]], F64),
            R_pd=jnp.asarray([0.04, 0.04], F64),
            vhat_pd=jnp.asarray([2.0, 0.05], F64),
            glim_pd=jnp.asarray([0.5, 5.0], F64),
        )
        v0 = jnp.zeros(nv, F64)
        dense = sap.solve_sap(data, v0, sap.SapParameters(max_iterations=60))
        sharded = solve_sap_sharded(data, v0, mesh, iterations=30)
        np.testing.assert_allclose(
            np.asarray(sharded.v), np.asarray(dense.v), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sharded.gamma), np.asarray(dense.gamma), atol=1e-6)
