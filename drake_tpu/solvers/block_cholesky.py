"""Block-sparse (supernodal) Cholesky for SAP-shaped Hessians.

Reference role: multibody/contact_solvers' sparse tier — SuperNodalSolver,
BlockSparseSupernodalSolver, BlockSparseCholeskySolver, MinimumDegreeOrdering
(supernodal_solver.h, block_sparse_cholesky_solver.h, ~11k LoC of C++).

The SAP Hessian H = A + J' G J is block-sparse over *cliques* (one block per
kinematic tree; contacts couple pairs of cliques).  At robot scale
(nv <= ~20) the dense factorization is optimal on TPU, but a scene with B
free bodies is block-banded with B 6x6 diagonal blocks — dense is O((6B)^3),
supernodal is O(B) in the chain case.

TPU-first design: the sparsity PATTERN is static (scene topology doesn't
change under jit), so symbolic analysis — elimination order + fill-in — runs
in Python at trace time; the numeric factorization is a Python-unrolled
right-looking blocked Cholesky whose per-block ops (b x b potrf/trsm/syrk)
are jnp calls XLA fuses and tiles onto the MXU.  vmap over scenarios
batches every block op.  No dynamic shapes, no while_loops.

Ordering: blocks are eliminated in the given order; callers with tree
structure should pass leaves-first (the minimum-degree role for trees —
exact, no fill beyond parent paths).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BlockSparseCholesky:
    """Symbolic-then-numeric Cholesky over a fixed block pattern.

    Pattern: ``n_blocks`` square diagonal blocks of size ``block_size`` and a
    set of LOWER-triangle off-diagonal coupling blocks ``(i, j)`` with i > j.
    Symmetry is implied.  Fill-in is computed once at construction.
    """

    def __init__(self, n_blocks: int, block_size: int,
                 couplings: Sequence[Tuple[int, int]]):
        self.n = n_blocks
        self.b = block_size
        # Symbolic elimination: track the lower-triangle structure as a set
        # of (i, j), i > j; eliminating column k adds fill (i, j) for every
        # pair i > j of neighbors of k below k (standard chordal completion).
        struct = {(max(i, j), min(i, j)) for i, j in couplings if i != j}
        below: List[set] = [set() for _ in range(n_blocks)]
        for i, j in struct:
            below[j].add(i)
        fill = set(struct)
        for k in range(n_blocks):
            nb = sorted(below[k])
            for a_i in range(len(nb)):
                for b_i in range(a_i + 1, len(nb)):
                    i, j = nb[b_i], nb[a_i]
                    if (i, j) not in fill:
                        fill.add((i, j))
                        below[j].add(i)
        self.pattern = sorted(fill)  # all (i>j) blocks present in L
        self._idx = {ij: t for t, ij in enumerate(self.pattern)}
        # Per-column row lists for the factorization loop.
        self._cols: List[List[int]] = [[] for _ in range(n_blocks)]
        for i, j in self.pattern:
            self._cols[j].append(i)
        for c in self._cols:
            c.sort()

    def factor(self, diag: jnp.ndarray, off: Dict[Tuple[int, int], jnp.ndarray]):
        """Factor H = L L'.

        diag: (n_blocks, b, b) symmetric diagonal blocks.
        off: {(i, j) i > j: (b, b) block H[i, j]} — must be a subset of the
        constructed coupling pattern.

        Returns (Ldiag (n,b,b) lower-triangular, Loff {(i,j): (b,b)}).
        """
        b = self.b
        dtype = diag.dtype
        zero = jnp.zeros((b, b), dtype)
        # Work blocks (mutable dicts of traced arrays; Python-side supernodal
        # schedule, XLA-side numerics).
        D = [diag[k] for k in range(self.n)]
        O = {ij: off.get(ij, zero) for ij in self.pattern}
        for ij in off:
            if ij not in self._idx:
                raise KeyError(f"block {ij} not in the symbolic pattern")

        Ld: List[jnp.ndarray] = [None] * self.n
        Lo: Dict[Tuple[int, int], jnp.ndarray] = {}
        for k in range(self.n):
            Lk = jnp.linalg.cholesky(D[k])
            Ld[k] = Lk
            rows = self._cols[k]
            if not rows:
                continue
            # L[i,k] = O[i,k] @ Lk^{-T}  (triangular solve, batched over rows)
            S = jnp.stack([O[(i, k)] for i in rows])  # (m, b, b)
            X = jax.vmap(
                lambda Bm: jax.scipy.linalg.solve_triangular(
                    Lk, Bm.T, lower=True).T)(S)
            for t, i in enumerate(rows):
                Lo[(i, k)] = X[t]
            # Schur updates: D[i] -= X_i X_i'; O[i,j] -= X_i X_j' (i > j).
            for a_i, i in enumerate(rows):
                D[i] = D[i] - X[a_i] @ X[a_i].T
                for b_i in range(a_i):
                    j = rows[b_i]
                    O[(i, j)] = O[(i, j)] - X[a_i] @ X[b_i].T
        return jnp.stack(Ld), Lo

    def solve(self, Ld: jnp.ndarray, Lo: Dict[Tuple[int, int], jnp.ndarray],
              rhs: jnp.ndarray) -> jnp.ndarray:
        """Solve H x = rhs given the factor; rhs: (n_blocks * b,)."""
        b = self.b
        y = [rhs[k * b : (k + 1) * b] for k in range(self.n)]
        # Forward: L y = rhs.
        for k in range(self.n):
            y[k] = jax.scipy.linalg.solve_triangular(Ld[k], y[k], lower=True)
            for i in self._cols[k]:
                y[i] = y[i] - Lo[(i, k)] @ y[k]
        # Backward: L' x = y.
        for k in reversed(range(self.n)):
            acc = y[k]
            for i in self._cols[k]:
                acc = acc - Lo[(i, k)].T @ y[i]
            y[k] = jax.scipy.linalg.solve_triangular(
                Ld[k].T, acc, lower=False)
        return jnp.concatenate(y)

    def to_dense(self, diag, off) -> jnp.ndarray:
        """Assemble the dense symmetric H (testing/diagnostics)."""
        n, b = self.n, self.b
        H = jnp.zeros((n * b, n * b), diag.dtype)
        for k in range(n):
            H = H.at[k * b:(k + 1) * b, k * b:(k + 1) * b].set(diag[k])
        for (i, j), blk in off.items():
            H = H.at[i * b:(i + 1) * b, j * b:(j + 1) * b].set(blk)
            H = H.at[j * b:(j + 1) * b, i * b:(i + 1) * b].set(blk.T)
        return H


def schur_complement(
    A: jnp.ndarray, B: jnp.ndarray, C: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(S, A^{-1}B) with S = C - B' A^{-1} B — the SchurComplement role
    (contact_solvers/schur_complement.h) used to condense deformable/FEM
    cliques into the rigid SAP problem (deformable_driver.cc)."""
    L = jax.scipy.linalg.cho_factor(A)
    AinvB = jax.scipy.linalg.cho_solve(L, B)
    return C - B.T @ AinvB, AinvB
