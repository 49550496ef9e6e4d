"""Algebraic Riccati solvers (CARE/DARE) as fixed-iteration jittable JAX.

Drake solves CARE/DARE with Schur-decomposition-based LAPACK routines
(reference: math/continuous_algebraic_riccati_equation.h,
math/discrete_algebraic_riccati_equation.h).  Schur is host-only and not
batchable; on TPU we instead use:

  - CARE: the matrix sign function of the Hamiltonian (Newton iteration with
    determinant scaling — quadratically convergent, pure matmul/solve, so it
    batches under vmap and maps onto the MXU).
  - DARE: the structure-preserving doubling algorithm (SDA), also quadratic.

Both run a fixed number of iterations under ``lax.fori_loop`` so the result is
jit/vmap/grad friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_care(A, B, Q, R, iters: int = 40):
    """Continuous-time algebraic Riccati equation.

    Solves  A'X + XA - XB R^{-1} B'X + Q = 0  for the stabilizing X.

    Matches drake::math::ContinuousAlgebraicRiccatiEquation semantics
    (used by LinearQuadraticRegulator, linear_quadratic_regulator.cc:89).
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    G = B @ jnp.linalg.solve(R, jnp.swapaxes(B, -1, -2))
    H = jnp.block([[A, -G], [-Q, -jnp.swapaxes(A, -1, -2)]])

    def body(_, Z):
        # Newton iteration for sign(Z) with determinant scaling.
        Zinv = jnp.linalg.inv(Z)
        _, logdet = jnp.linalg.slogdet(Z)
        c = jnp.exp(-logdet / (2 * n))
        return 0.5 * (c * Z + Zinv / c)

    Z = jax.lax.fori_loop(0, iters, body, H)
    # Stable invariant subspace: (Z + I) [I; X] = 0.
    I = jnp.eye(n, dtype=A.dtype)
    Z11, Z12 = Z[:n, :n], Z[:n, n:]
    Z21, Z22 = Z[n:, :n], Z[n:, n:]
    M = jnp.concatenate([Z12, Z22 + I], axis=0)  # (2n, n)
    rhs = -jnp.concatenate([Z11 + I, Z21], axis=0)
    X = jnp.linalg.lstsq(M, rhs)[0]
    return 0.5 * (X + X.T)


def solve_dare(A, B, Q, R, iters: int = 30):
    """Discrete-time algebraic Riccati equation.

    Solves  X = A'XA - A'XB (R + B'XB)^{-1} B'XA + Q  for the stabilizing X
    via the structure-preserving doubling algorithm.

    Matches drake::math::DiscreteAlgebraicRiccatiEquation semantics.
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    I = jnp.eye(n, dtype=A.dtype)
    G0 = B @ jnp.linalg.solve(R, jnp.swapaxes(B, -1, -2))

    def body(_, carry):
        Ak, Gk, Hk = carry
        W = I + Gk @ Hk
        W_inv_A = jnp.linalg.solve(W, Ak)
        W_inv_G = jnp.linalg.solve(W, Gk)
        A1 = Ak @ W_inv_A
        G1 = Gk + Ak @ W_inv_G @ Ak.T
        H1 = Hk + W_inv_A.T @ Hk @ Ak
        return (A1, G1, H1)

    _, _, H = jax.lax.fori_loop(0, iters, body, (A, G0, Q))
    return 0.5 * (H + H.T)


def solve_lyapunov_continuous(A, Q, iters: int = 40):
    """Solve  A X + X A' + Q = 0  (continuous Lyapunov) via the sign method.

    Matches drake::math::RealContinuousLyapunovEquation.
    sign([[A, Q], [0, -A']]) = [[-I, 2X], [0, I]] for Hurwitz A.
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    Z = jnp.block([[A, Q], [jnp.zeros_like(A), -jnp.swapaxes(A, -1, -2)]])

    def body(_, Z):
        Zinv = jnp.linalg.inv(Z)
        _, logdet = jnp.linalg.slogdet(Z)
        c = jnp.exp(-logdet / (2 * n))
        return 0.5 * (c * Z + Zinv / c)

    Z = jax.lax.fori_loop(0, iters, body, Z)
    X = 0.5 * Z[:n, n:]
    return 0.5 * (X + X.T)


def solve_lyapunov_discrete(A, Q, iters: int = 30):
    """Solve  A X A' - X + Q = 0  (discrete Lyapunov) by doubling.

    X = sum_k A^k Q (A')^k; doubling: Q <- Q + A Q A', A <- A A.
    Matches drake::math::RealDiscreteLyapunovEquation.
    """

    def body(_, carry):
        Ak, Xk = carry
        return (Ak @ Ak, Xk + Ak @ Xk @ Ak.T)

    _, X = jax.lax.fori_loop(0, iters, body, (jnp.asarray(A), jnp.asarray(Q)))
    return 0.5 * (X + X.T)
