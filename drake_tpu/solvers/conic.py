"""First-order conic solver: LP / QP / SOCP / SDP over a cone product.

The reference dispatches conic programs to external backends — SCS
(reference: solvers/scs_solver.cc) and Clarabel (solvers/clarabel_solver.cc,
a vendored Rust solver built via tools/workspace/clarabel_cpp_internal).
Neither is portable to a TPU-resident solve: both are sparse host codes.

The TPU-native replacement is operator splitting (ADMM, the SCS family
algorithm) on the conic standard form

    minimize    0.5 x'Px + c'x
    subject to  A x + s = b,   s in K = {0}^z x R+^l x SOC(d_1) x ...
                                        x PSD(m_1) x ...

ADMM iteration (rho-scaled dual y):
    x+ = argmin_x 0.5 x'Px + c'x + rho/2 ||Ax + s - b + y||^2
         -> one pre-factored dense Cholesky solve of (P + rho A'A + eps I)
    s+ = Pi_K(b - A x+ - y)
    y+ = y + (A x+ + s+ - b)

Everything is fixed-shape: cone dimensions are Python ints, the iteration
is a lax.while_loop on primal/dual residuals, and the whole solve jits and
vmaps (a batch of SDPs is one XLA program).  PSD projection uses
jnp.linalg.eigh — batched eigendecompositions map well to XLA.

Termination mirrors SCS: ||Ax + s - b|| (primal) and ||Px + A'y + c||
(dual) below tol * (1 + scale).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ConeDims:
    """Dimensions of the cone product, in this fixed order.

    zero: number of equality rows (s = 0).
    nonneg: number of one-sided inequality rows (s >= 0).
    socs: tuple of second-order cone dims d (s = (t, u), ||u|| <= t).
    psds: tuple of PSD matrix sizes m (s = vec of the full m*m matrix,
          row-major; the projection symmetrizes first).
    """

    zero: int = 0
    nonneg: int = 0
    socs: Tuple[int, ...] = ()
    psds: Tuple[int, ...] = ()

    @property
    def total(self) -> int:
        return (
            self.zero
            + self.nonneg
            + sum(self.socs)
            + sum(m * m for m in self.psds)
        )


@dataclasses.dataclass(frozen=True)
class ConicOptions:
    max_iters: int = 4000
    tol: float = 1e-7
    rho: float = 1.0
    # Over-relaxation factor (1.5-1.8 speeds ADMM; 1.0 = plain).
    alpha: float = 1.6
    ridge: float = 1e-9


class ConicSolution(NamedTuple):
    x: jnp.ndarray
    s: jnp.ndarray
    y: jnp.ndarray  # dual (scaled by rho at the solution -> unscaled)
    iterations: jnp.ndarray
    primal_residual: jnp.ndarray
    dual_residual: jnp.ndarray
    converged: jnp.ndarray


def _project_soc(v):
    """Projection onto {(t, u): ||u|| <= t}."""
    t, u = v[0], v[1:]
    nu = jnp.linalg.norm(u)
    # Three zones: inside (keep), polar-inside (zero), shell (scale).
    coef = jnp.clip((t + nu) / jnp.maximum(2.0 * nu, 1e-30), 0.0, 1.0)
    proj = jnp.concatenate([jnp.maximum((t + nu) / 2.0, 0.0)[None], coef * u])
    inside = nu <= t
    polar = nu <= -t
    out = jnp.where(inside, v, jnp.where(polar, jnp.zeros_like(v), proj))
    return out


def _project_psd(v, m):
    """Projection of a (flattened m*m) matrix onto the PSD cone."""
    S = v.reshape(m, m)
    S = 0.5 * (S + S.T)
    w, V = jnp.linalg.eigh(S)
    w = jnp.maximum(w, 0.0)
    return ((V * w) @ V.T).reshape(m * m)


def make_cone_projection(cone: ConeDims):
    """Build Pi_K over the stacked s vector (static slicing)."""

    def project(s):
        parts = []
        off = 0
        if cone.zero:
            parts.append(jnp.zeros(cone.zero, s.dtype))
            off += cone.zero
        if cone.nonneg:
            parts.append(jnp.maximum(s[off : off + cone.nonneg], 0.0))
            off += cone.nonneg
        for d in cone.socs:
            parts.append(_project_soc(s[off : off + d]))
            off += d
        for m in cone.psds:
            parts.append(_project_psd(s[off : off + m * m], m))
            off += m * m
        if not parts:
            return jnp.zeros(0, s.dtype)
        return jnp.concatenate(parts)

    return project


def solve_conic(
    P,
    c,
    A,
    b,
    cone: ConeDims,
    options: ConicOptions = ConicOptions(),
    x0=None,
) -> ConicSolution:
    """Solve the conic program.  jit/vmap friendly (static cone dims).

    P may be None for a linear objective.
    """
    c = jnp.asarray(c)
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    dtype = c.dtype
    n = c.shape[0]
    m = A.shape[0]
    assert cone.total == m, f"cone dims {cone.total} != rows {m}"
    P = jnp.zeros((n, n), dtype) if P is None else jnp.asarray(P)
    opts = options
    rho = jnp.asarray(opts.rho, dtype)

    # Pre-factored x-update matrix.
    M = P + rho * (A.T @ A) + opts.ridge * jnp.eye(n, dtype=dtype)
    L = jax.scipy.linalg.cho_factor(M)
    project = make_cone_projection(cone)

    b_scale = 1.0 + jnp.linalg.norm(b)
    c_scale = 1.0 + jnp.linalg.norm(c)

    def residuals(x, s, y):
        rp = jnp.linalg.norm(A @ x + s - b)
        rd = jnp.linalg.norm(P @ x + A.T @ (rho * y) + c)
        return rp, rd

    def body(state):
        x, s, y, it, _, _ = state
        rhs = -c - rho * (A.T @ (s - b + y))
        x_new = jax.scipy.linalg.cho_solve(L, rhs)
        Ax = A @ x_new
        # Over-relaxation on the Ax term.
        Ax_r = opts.alpha * Ax - (1.0 - opts.alpha) * (s - b)
        s_new = project(b - Ax_r - y)
        y_new = y + (Ax_r + s_new - b)
        rp, rd = residuals(x_new, s_new, y_new)
        return (x_new, s_new, y_new, it + 1, rp, rd)

    def cond(state):
        _, _, _, it, rp, rd = state
        done = jnp.logical_and(rp <= opts.tol * b_scale, rd <= opts.tol * c_scale)
        return jnp.logical_and(~done, it < opts.max_iters)

    x_init = jnp.zeros(n, dtype) if x0 is None else jnp.asarray(x0, dtype)
    s_init = project(b - A @ x_init)
    y_init = jnp.zeros(m, dtype)
    rp0, rd0 = residuals(x_init, s_init, y_init)
    x, s, y, it, rp, rd = jax.lax.while_loop(
        cond, body, (x_init, s_init, y_init, jnp.array(0), rp0, rd0)
    )
    converged = jnp.logical_and(rp <= opts.tol * b_scale, rd <= opts.tol * c_scale)
    return ConicSolution(
        x=x,
        s=s,
        y=rho * y,
        iterations=it,
        primal_residual=rp,
        dual_residual=rd,
        converged=converged,
    )


# ---------------------------------------------------------------------------
# Symmetric-matrix helpers (the reference's math::ToSymmetricMatrixFromLower
# role, solvers/sdpa_free_format.cc conventions).
# ---------------------------------------------------------------------------


def svec_size(m: int) -> int:
    return m * (m + 1) // 2


def svec_to_full_matrix_rows(m: int) -> np.ndarray:
    """(m*m, svec_size) scatter matrix: full row-major vec = S @ svec.

    svec order: lower-triangular column-major (diagonal included),
    matching NewSymmetricContinuousVariables block layout.
    """
    S = np.zeros((m * m, svec_size(m)))
    k = 0
    for j in range(m):
        for i in range(j, m):
            S[i * m + j, k] = 1.0
            S[j * m + i, k] = 1.0
            k += 1
    return S
