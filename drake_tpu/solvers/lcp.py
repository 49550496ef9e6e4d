"""Linear complementarity solvers (the MobyLCPSolver role).

Reference: solvers/moby_lcp_solver.h — Lemke's algorithm + fast pivoting,
used by the legacy multibody/constraint rigid-contact path and exposed as a
MathematicalProgram backend.

Two solvers, TPU-split by job:

  - ``lemke``: the classic complementary-pivot method on the host (NumPy).
    The reference's MobyLCP is likewise a CPU Eigen solver; pivoting is
    data-dependent control flow that has no good XLA shape.  Robust for the
    one-off setup/analysis solves the legacy constraint path needs.

  - ``solve_lcp_fb``: semismooth Newton on the Fischer-Burmeister NCP
    function phi(z, w) = sqrt(z^2 + w^2) - z - w, w = M z + q.  Fixed
    iteration count, branch-free, jit/vmap-safe — the TPU-shaped batched
    solver for per-step physics use.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class LcpResult(NamedTuple):
    z: np.ndarray
    success: bool
    iterations: int


def lemke(M, q, max_pivots: Optional[int] = None, tol: float = 1e-10):
    """Solve w = M z + q, w >= 0, z >= 0, w'z = 0 by Lemke's method.

    Returns LcpResult; success=False on ray termination (secondary ray) or
    pivot-limit, mirroring MobyLCPSolver::SolveLcpLemke's failure modes.
    """
    M = np.asarray(M, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64).ravel()
    n = q.size
    if np.all(q >= -tol):
        return LcpResult(np.zeros(n), True, 0)
    if max_pivots is None:
        max_pivots = 50 * n

    # Tableau: columns [w | z | z0 | q]; basis starts all-w.
    T = np.hstack([np.eye(n), -M, -np.ones((n, 1)), q.reshape(-1, 1)])
    basis = list(range(n))  # column indices of basic variables (w_i)
    # Entering: z0 (column 2n). Leaving: most negative q row.
    r = int(np.argmin(q))
    entering = 2 * n
    for it in range(max_pivots):
        # Pivot on (r, entering).
        piv = T[r, entering]
        if abs(piv) < tol:
            return LcpResult(np.zeros(n), False, it)
        T[r] = T[r] / piv
        for i in range(n):
            if i != r:
                T[i] = T[i] - T[i, entering] * T[r]
        leaving = basis[r]
        basis[r] = entering
        if entering == 2 * n or leaving == 2 * n:
            if leaving == 2 * n:
                break  # z0 left the basis: solution found
        # Complementary pivot rule: the complement of the leaving variable
        # enters next (w_i <-> z_i).
        entering = leaving + n if leaving < n else leaving - n
        # Minimum ratio test over rows with positive pivot column.
        col = T[:, entering]
        rhs = T[:, -1]
        mask = col > tol
        if not mask.any():
            return LcpResult(np.zeros(n), False, it + 1)  # secondary ray
        ratios = np.where(mask, rhs / np.where(mask, col, 1.0), np.inf)
        # Prefer dropping z0 when tied (standard anti-cycling choice).
        r = int(np.argmin(ratios))
        z0_row = basis.index(2 * n) if 2 * n in basis else -1
        if z0_row >= 0 and mask[z0_row] and ratios[z0_row] <= ratios[r] + tol:
            r = z0_row
    else:
        return LcpResult(np.zeros(n), False, max_pivots)

    z = np.zeros(n)
    for row, b in enumerate(basis):
        if n <= b < 2 * n:
            z[b - n] = T[row, -1]
    z = np.maximum(z, 0.0)
    w = M @ z + q
    ok = bool(np.all(w >= -1e-6) and abs(z @ w) < 1e-6 * (1 + n))
    return LcpResult(z, ok, it + 1)


def solve_lcp_fb(M, q, iterations: int = 30, reg: float = 1e-10):
    """Batched/differentiable LCP via semismooth Newton on Fischer-Burmeister.

    Fixed ``iterations`` (lax.fori_loop), damped Newton with a projected
    fallback step; returns (z, residual_inf).  Requires M to be a P-matrix
    (unique solution) for convergence — the regime the rigid constraint
    assembly produces (Delassus operator + regularization).
    """
    M = jnp.asarray(M)
    q = jnp.asarray(q)
    n = q.shape[0]
    eps = jnp.asarray(1e-12, M.dtype)

    def phi_and_jac(z):
        w = M @ z + q
        r = jnp.sqrt(z * z + w * w + eps)
        phi = r - z - w
        # dphi/dz = diag(z/r - 1) + diag(w/r - 1) M
        a = z / r - 1.0
        b = w / r - 1.0
        J = jnp.diag(a) + b[:, None] * M
        return phi, J

    def body(_, z):
        phi, J = phi_and_jac(z)
        J = J + reg * jnp.eye(n, dtype=M.dtype)
        dz = -jnp.linalg.solve(J, phi)
        # Backtracking on |phi| over fixed candidates (branch-free argmin).
        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.01], M.dtype)
        cands = z[None] + alphas[:, None] * dz[None]
        cands = jnp.maximum(cands, 0.0)

        def merit(zz):
            ww = M @ zz + q
            rr = jnp.sqrt(zz * zz + ww * ww + eps) - zz - ww
            return jnp.sum(rr * rr)

        merits = jax.vmap(merit)(cands)
        merits = jnp.where(jnp.isfinite(merits), merits, jnp.inf)
        return cands[jnp.argmin(merits)]

    z0 = jnp.maximum(-q, 0.0)
    z = jax.lax.fori_loop(0, iterations, body, z0)
    w = M @ z + q
    resid = jnp.max(jnp.abs(jnp.minimum(z, w)))
    return z, resid
