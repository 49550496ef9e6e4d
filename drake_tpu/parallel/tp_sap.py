"""Tensor-parallel SAP: the constraint axis sharded over a device mesh.

SURVEY §2.9's TP row: the reference has NO tensor/model parallelism — its
SAP Hessian is factorized on one host (supernodal Cholesky,
multibody/contact_solvers/sap/sap_solver.h:167).  The TPU-native design for
LARGE problems (MPM-coupled scenes, mesh contact: thousands of contact
constraints against a modest nv) shards the CONSTRAINT axis:

    grad = A (v - v*) - Σ_c J_cᵀ γ_c          (psum over the mesh axis)
    H    = A + Σ_c J_cᵀ G_c J_c               (psum over the mesh axis)

Every device holds its shard of (J, R, vhat, mu), computes partial
gradient/Hessian/cost sums, and one `psum` per quantity rides the ICI.  The
small (nv × nv) Newton solve is replicated — cheaper than distributing it at
robot scale.  The whole Newton loop (including the vectorized alpha-grid
line search, whose directional scalars are also psum reductions) runs INSIDE
`shard_map`, so the entire solve is one compiled SPMD program with no host
round trips.

Scope: the dense contact family only (the axis worth sharding).  Joint
limits / holonomic / PD rows are O(nv) — assemble them on the replicated
side or fold their Jacobians into A beforehand.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from drake_tpu.contact.sap import (
    SapData,
    SapParameters,
    SapSolution,
    _contact_cost,
    _project_gamma,
)


def _pad_constraints(data: SapData, n_shards: int) -> SapData:
    """Pad nc up to a multiple of n_shards with zero-Jacobian rows.

    A zero row contributes γ = Π(vhat/R) with vhat = 0 → γ = 0 and
    G J = 0, so padding is exact (no mass, no force)."""
    nc = data.J.shape[0]
    rem = (-nc) % n_shards
    if rem == 0:
        return data
    nv = data.J.shape[2]
    dtype = data.J.dtype
    return data._replace(
        J=jnp.concatenate([data.J, jnp.zeros((rem, 3, nv), dtype)]),
        R=jnp.concatenate([data.R, jnp.ones((rem, 3), dtype)]),
        vhat=jnp.concatenate([data.vhat, jnp.zeros((rem, 3), dtype)]),
        mu=jnp.concatenate([data.mu, jnp.zeros((rem,), dtype)]),
    )


def solve_sap_sharded(
    data: SapData,
    v_guess: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "c",
    sap_params: SapParameters = SapParameters(),
    iterations: Optional[int] = None,
) -> SapSolution:
    """Fixed-iteration SAP Newton with the constraint axis sharded on `mesh`.

    iterations: Newton iteration count (default: sap_params.unroll_iterations
    or 8).  Fixed-trip-count keeps the SPMD program free of cross-device
    while_loop divergence — every device runs the same schedule by
    construction.
    """
    iters = iterations or (sap_params.unroll_iterations or 8)
    n_shards = mesh.shape[axis_name]
    nc0 = data.J.shape[0]
    data = _pad_constraints(data, n_shards)
    nv = v_guess.shape[0]
    dtype = v_guess.dtype
    K = sap_params.line_search_points

    # Small (O(nv)-row) constraint families — joint limits, holonomic
    # equalities, implicit PD — are REPLICATED on every device: their
    # gradient/Hessian terms are identical everywhere and add after the
    # contact psum (folding them as extra contact rows would waste a 3-row
    # cone projection per scalar row).
    aux = (
        data.J_lim, data.R_lim, data.vhat_lim,
        data.J_eq, data.R_eq, data.vhat_eq,
        data.J_pd, data.R_pd, data.vhat_pd, data.glim_pd,
    )

    def local_newton(A, v_star, J, R, vhat, mu, aux, v0):
        """Runs on every device with its constraint shard; psum reductions."""
        (J_lim, R_lim, vhat_lim, J_eq, R_eq, vhat_eq,
         J_pd, R_pd, vhat_pd, glim_pd) = aux

        def gamma_all(vc):
            return jax.vmap(_project_gamma)(
                (vhat - vc) / R, R, mu
            )

        def G_all(vc):
            def gamma_one(vc1, R1, vhat1, mu1):
                return _project_gamma((vhat1 - vc1) / R1, R1, mu1)

            return -jax.vmap(jax.jacfwd(gamma_one))(vc, R, vhat, mu)

        def aux_gammas(v):
            g_l = jnp.maximum((vhat_lim - J_lim @ v) / R_lim, 0.0)
            g_e = (vhat_eq - J_eq @ v) / R_eq
            g_p = jnp.clip((vhat_pd - J_pd @ v) / R_pd, -glim_pd, glim_pd)
            return g_l, g_e, g_p

        def aux_grad_hess(v):
            g_l, g_e, g_p = aux_gammas(v)
            grad = -(J_lim.T @ g_l) - (J_eq.T @ g_e) - (J_pd.T @ g_p)
            act_l = (g_l > 0).astype(v.dtype) / R_lim
            act_p = (
                (jnp.abs(g_p) < glim_pd).astype(v.dtype) / R_pd
                if R_pd.shape[0] else R_pd
            )
            H = (
                (J_lim * act_l[:, None]).T @ J_lim
                + (J_eq / R_eq[:, None]).T @ J_eq
                + ((J_pd * act_p[:, None]).T @ J_pd
                   if R_pd.shape[0] else 0.0)
            )
            return grad, H

        def aux_cost(v):
            g_l, g_e, g_p = aux_gammas(v)
            y_p = (vhat_pd - J_pd @ v) / R_pd if R_pd.shape[0] else R_pd
            return (
                0.5 * jnp.sum(R_lim * g_l * g_l)
                + 0.5 * jnp.sum(R_eq * g_e * g_e)
                + jnp.sum(R_pd * (0.5 * g_p * g_p + g_p * (y_p - g_p)))
            )

        def grad_hess(v):
            vc = jnp.einsum("cij,j->ci", J, v)
            gam = gamma_all(vc)
            Gs = G_all(vc)
            g_part = -jnp.einsum("cij,ci->j", J, gam)
            H_part = jnp.einsum("cik,ckl,clj->ij",
                                jnp.swapaxes(J, 1, 2), Gs, J)
            g_aux, H_aux = aux_grad_hess(v)
            g = A @ (v - v_star) + g_aux + jax.lax.psum(g_part, axis_name)
            H = A + H_aux + jax.lax.psum(H_part, axis_name)
            return g, H

        def cost_of(v):
            vc = jnp.einsum("cij,j->ci", J, v)
            lc = jax.vmap(lambda a, b, c, d: _contact_cost(a, b, c, d)[0])(
                vc, R, vhat, mu
            )
            dv = v - v_star
            return (
                0.5 * dv @ (A @ dv)
                + aux_cost(v)
                + jax.lax.psum(jnp.sum(lc), axis_name)
            )

        def body(v, _):
            g, H = grad_hess(v)
            dv = -jnp.linalg.solve(H, g)
            # vectorized exact-ish line search on the convex 1-D restriction:
            # f(alpha) = d cost(v + alpha dv)/d alpha is monotone increasing.
            alphas = jnp.linspace(0.0, 1.5, K).astype(dtype)

            def dcost(alpha):
                va = v + alpha * dv
                vca = jnp.einsum("cij,j->ci", J, va)
                gam = gamma_all(vca)
                dvc = jnp.einsum("cij,j->ci", J, dv)
                local = -jnp.sum(gam * dvc)
                g_l, g_e, g_p = aux_gammas(va)
                d_aux = (
                    -g_l @ (J_lim @ dv)
                    - g_e @ (J_eq @ dv)
                    - g_p @ (J_pd @ dv)
                )
                return (
                    dv @ (A @ (va - v_star))
                    + d_aux
                    + jax.lax.psum(local, axis_name)
                )

            f = jax.vmap(dcost)(alphas)
            # last alpha with f <= 0 (monotone f: the minimizer bracket)
            neg = f <= 0.0
            idx = jnp.maximum(jnp.sum(neg.astype(jnp.int32)) - 1, 0)
            a0 = alphas[idx]
            a1 = alphas[jnp.minimum(idx + 1, K - 1)]
            f0 = f[idx]
            f1 = f[jnp.minimum(idx + 1, K - 1)]
            # one secant refinement inside the bracket
            denom = jnp.where(jnp.abs(f1 - f0) > 1e-30, f1 - f0, 1.0)
            a_sec = jnp.clip(a0 - f0 * (a1 - a0) / denom, a0, a1)
            alpha = jnp.where(f[0] > 0.0, alphas[1] * 0.1, a_sec)
            v_new = v + alpha * dv
            return v_new, jnp.linalg.norm(g)

        v_fin, gnorms = jax.lax.scan(body, v0, None, length=iters)
        vc_fin = jnp.einsum("cij,j->ci", J, v_fin)
        gam_fin = gamma_all(vc_fin)
        return v_fin, gam_fin, gnorms[-1]

    spec_c = P(axis_name)
    aux_specs = tuple(P() for _ in aux)
    out = shard_map(
        local_newton,
        mesh=mesh,
        in_specs=(P(), P(), spec_c, spec_c, spec_c, spec_c, aux_specs, P()),
        out_specs=(P(), spec_c, P()),
    )(data.A, data.v_star, data.J, data.R, data.vhat, data.mu, aux, v_guess)
    v, gamma, res = out
    return SapSolution(
        v=v,
        gamma=gamma[:nc0],
        iterations=jnp.asarray(iters),
        momentum_residual=res,
    )
