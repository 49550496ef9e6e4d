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

    def test_rejects_unsupported_families(self, mesh):
        data = _synthetic_problem(nc=16, nv=6)
        data = data._replace(
            J_lim=jnp.ones((1, 6), F64),
            R_lim=jnp.ones((1,), F64),
            vhat_lim=jnp.zeros((1,), F64),
        )
        with pytest.raises(NotImplementedError):
            solve_sap_sharded(data, jnp.zeros(6, F64), mesh)
