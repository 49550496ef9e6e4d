"""Block-sparse supernodal Cholesky tests (supernodal_solver.h role)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.solvers.block_cholesky import BlockSparseCholesky, schur_complement


def _random_block_spd(rng, n, b, couplings):
    """SPD with the given coupling pattern (diagonally dominant)."""
    diag = rng.normal(size=(n, b, b))
    diag = diag @ np.swapaxes(diag, 1, 2) + (b * (len(couplings) + 2)) * np.eye(b)
    off = {}
    for (i, j) in couplings:
        off[(i, j)] = rng.normal(size=(b, b)) * 0.5
    return jnp.asarray(diag), {k: jnp.asarray(v) for k, v in off.items()}


class TestBlockSparseCholesky:
    @pytest.mark.parametrize("couplings", [
        [],  # block diagonal
        [(1, 0), (2, 1), (3, 2)],  # chain (articulated tree)
        [(3, 0), (3, 1), (3, 2)],  # arrow (everything couples to one body)
        [(1, 0), (2, 0), (3, 1), (3, 2)],  # cycle -> fill-in required
    ])
    def test_matches_dense(self, couplings):
        rng = np.random.default_rng(0)
        n, b = 4, 3
        diag, off = _random_block_spd(rng, n, b, couplings)
        chol = BlockSparseCholesky(n, b, couplings)
        Ld, Lo = chol.factor(diag, off)
        H = chol.to_dense(diag, off)
        rhs = jnp.asarray(rng.normal(size=n * b))
        x = chol.solve(Ld, Lo, rhs)
        np.testing.assert_allclose(
            np.asarray(H @ x), np.asarray(rhs), atol=1e-9)

    def test_fill_in_computed(self):
        # Cycle 0-1, 0-2, 1-3, 2-3: eliminating 0 fills (2,1); eliminating 1
        # fills (3,2) if absent (it is present), etc.
        chol = BlockSparseCholesky(4, 2, [(1, 0), (2, 0), (3, 1), (3, 2)])
        assert (2, 1) in chol.pattern  # fill-in block

    def test_jit_and_vmap(self):
        rng = np.random.default_rng(1)
        n, b, batch = 5, 6, 8
        couplings = [(i + 1, i) for i in range(n - 1)]
        chol = BlockSparseCholesky(n, b, couplings)
        diags, offs, rhss, dense = [], [], [], []
        for _ in range(batch):
            d, o = _random_block_spd(rng, n, b, couplings)
            diags.append(d)
            offs.append(jnp.stack([o[c] for c in couplings]))
            rhss.append(rng.normal(size=n * b))
        diags = jnp.stack(diags)
        offs = jnp.stack(offs)
        rhss = jnp.asarray(np.stack(rhss))

        @jax.jit
        @jax.vmap
        def solve(diag, off_arr, rhs):
            off = {c: off_arr[k] for k, c in enumerate(couplings)}
            Ld, Lo = chol.factor(diag, off)
            return chol.solve(Ld, Lo, rhs)

        xs = solve(diags, offs, rhss)
        for t in range(batch):
            off = {c: offs[t, k] for k, c in enumerate(couplings)}
            H = np.asarray(chol.to_dense(diags[t], off))
            np.testing.assert_allclose(
                H @ np.asarray(xs[t]), np.asarray(rhss[t]), atol=1e-8)

    def test_rejects_unknown_block(self):
        chol = BlockSparseCholesky(3, 2, [(1, 0)])
        diag = jnp.tile(jnp.eye(2)[None], (3, 1, 1)) * 10
        with pytest.raises(KeyError):
            chol.factor(diag, {(2, 0): jnp.zeros((2, 2))})


class TestSchurComplement:
    def test_condensation(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(4, 4)); A = A @ A.T + 4 * np.eye(4)
        B = rng.normal(size=(4, 3))
        C = rng.normal(size=(3, 3)); C = C @ C.T + 4 * np.eye(3)
        S, AinvB = schur_complement(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(C))
        S_ref = C - B.T @ np.linalg.solve(A, B)
        np.testing.assert_allclose(np.asarray(S), S_ref, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(AinvB), np.linalg.solve(A, B), atol=1e-10)
