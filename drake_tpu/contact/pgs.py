"""PGS: projected Gauss-Seidel / Jacobi contact solver.

Re-derivation of the reference's PGS baseline
(multibody/contact_solvers/pgs_solver.h): iterative sweeps on the contact
LCP with the Delassus operator W = J A^-1 J':

    find gamma in cone:  vc = J v* + W gamma, complementarity in the
    normal, Coulomb disk in the tangent.

Per contact the classic update is a diagonally-preconditioned projected
step: gamma_n <- max(0, gamma_n - w (vc_n - vhat_n)/W_nn), tangential
step then a clip to the friction disk ||gamma_t|| <= mu gamma_n.  Two
sweep orders: "gs" (sequential, the reference's) and "jacobi"
(simultaneous with relaxation — the TPU-parallel variant).

NOTE: PGS solves the UNREGULARIZED LCP; SAP solves the R-regularized
convex approximation.  Their solutions agree to O(R) — the tests compare
at physics level, exactly how the reference uses PGS as a baseline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drake_tpu.contact.sap import SapData, SapSolution, _project_gamma


def solve_pgs(
    data: SapData,
    iterations: int = 100,
    method: str = "jacobi",
    relaxation: float = 0.5,
) -> SapSolution:
    """Solve the regularized contact problem by projected sweeps.

    Only the contact cone constraints are handled (limits/equalities are
    SAP-only features); matches solve_sap on contact-only problems.
    """
    nc = data.J.shape[0]
    nv = data.A.shape[0]
    dtype = data.v_star.dtype
    if nc == 0:
        return SapSolution(
            v=data.v_star,
            gamma=jnp.zeros((0, 3), dtype),
            iterations=jnp.array(0),
            momentum_residual=jnp.asarray(0.0, dtype),
        )

    J2 = data.J.reshape(nc * 3, nv)
    Ainv_Jt = jnp.linalg.solve(data.A, J2.T)  # (nv, 3nc)
    W = (J2 @ Ainv_Jt).reshape(nc, 3, nc, 3)
    vc_star = (J2 @ data.v_star).reshape(nc, 3)
    g = vc_star - data.vhat  # gradient offset
    R = data.R  # (nc, 3) diagonal regularization

    W2 = W.reshape(nc * 3, nc * 3)
    # Per-contact diagonal preconditioners.
    Wdiag = jnp.stack(
        [jnp.diagonal(W[i, :, i, :]) for i in range(nc)]
    )  # (nc, 3) [t1, t2, n]
    Wdiag = jnp.maximum(Wdiag, 1e-12)

    def vc_of(gam):
        return vc_star + (W2 @ gam.reshape(-1)).reshape(nc, 3)

    def contact_update(gam_i, vc_i, vhat_i, Wd_i, mu_i, w):
        gn = jnp.maximum(
            gam_i[2] - w * (vc_i[2] - vhat_i[2]) / Wd_i[2], 0.0
        )
        gt = gam_i[:2] - w * vc_i[:2] / Wd_i[:2]
        # Coulomb disk clip.
        gt_norm = jnp.linalg.norm(gt)
        scale = jnp.minimum(1.0, mu_i * gn / jnp.maximum(gt_norm, 1e-12))
        return jnp.concatenate([gt * scale, gn[None]])

    def jacobi_sweep(gam, _):
        vc = vc_of(gam)
        gam_new = jax.vmap(
            lambda gi, vi, vh, wd, mi: contact_update(
                gi, vi, vh, wd, mi, relaxation
            )
        )(gam, vc, data.vhat, Wdiag, data.mu)
        return gam_new, None

    def gs_sweep(gam, _):
        def body(i, gam):
            Wrow = jax.lax.dynamic_slice_in_dim(W2, 3 * i, 3, axis=0)
            vc_i = vc_star[i] + Wrow @ gam.reshape(-1)
            gam = gam.at[i].set(
                contact_update(
                    gam[i], vc_i, data.vhat[i], Wdiag[i], data.mu[i], 1.0
                )
            )
            return gam

        return jax.lax.fori_loop(0, nc, body, gam), None

    sweep = jacobi_sweep if method == "jacobi" else gs_sweep
    gam0 = jnp.zeros((nc, 3), dtype)
    gam, _ = jax.lax.scan(sweep, gam0, None, length=iterations)

    v = data.v_star + Ainv_Jt @ gam.reshape(-1)
    # Optimality diagnostic: how much one more full sweep would move gamma.
    gam_next = sweep(gam, None)[0]
    resid = jnp.linalg.norm(gam_next - gam)
    return SapSolution(
        v=v, gamma=gam, iterations=jnp.array(iterations),
        momentum_residual=resid,
    )
