"""Legacy LCP-based rigid constraint solver (pre-SAP contact path).

Reference: multibody/constraint/constraint_solver.h + constraint_problem_data.h
— the Stewart-Trinkle/Anitescu-Potra time-stepping LCP over normal impulses,
friction-pyramid impulses, and per-contact slack:

    [ N A N'   N A D'   0 ] [cn ]   [ N v* ]
    [ D A N'   D A D'   E ] [bt ] + [ D v* ]  >= 0, complementary
    [ mu       -E'      0 ] [lam]   [  0   ]

with A = M^{-1}, E = blockdiag(1_nd).  The reference hands this to
MobyLCPSolver; here the host path uses solvers/lcp.lemke and the in-loop
path the batched Fischer-Burmeister Newton (solvers/lcp.solve_lcp_fb).

SAP is this framework's (and the reference's) default — this module exists
for parity with the legacy API and as an independent cross-check of the SAP
physics in tests.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from drake_tpu.solvers import lcp as lcp_mod


class RigidContactResult(NamedTuple):
    v: jnp.ndarray  # post-impact / end-of-step generalized velocity
    cn: jnp.ndarray  # normal impulses (nc,)
    beta: jnp.ndarray  # pyramid tangential impulses (nc, nd)
    residual: jnp.ndarray  # LCP complementarity residual (inf-norm)


def pyramid_directions(nd: int, dtype=jnp.float64) -> jnp.ndarray:
    """nd unit directions spanning the tangent plane (friction pyramid)."""
    ang = 2.0 * jnp.pi * jnp.arange(nd) / nd
    return jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=1).astype(dtype)


def solve_rigid_contact(
    M: jnp.ndarray,  # (nv, nv) mass matrix
    v_star: jnp.ndarray,  # (nv,) free-motion velocity (v + h M^{-1} tau)
    Jn: jnp.ndarray,  # (nc, nv) normal contact Jacobian (separation rate)
    Jt: jnp.ndarray,  # (nc, 2, nv) tangent Jacobian
    mu: jnp.ndarray,  # (nc,) friction coefficients
    nd: int = 4,
    use_lemke: bool = False,
    iterations: int = 40,
) -> RigidContactResult:
    """One rigid (inelastic) contact velocity update via the pyramid LCP."""
    nc, nv = Jn.shape
    dtype = v_star.dtype
    if nc == 0:
        return RigidContactResult(
            v_star, jnp.zeros((0,), dtype), jnp.zeros((0, nd), dtype),
            jnp.asarray(0.0, dtype))

    dirs = pyramid_directions(nd, dtype)  # (nd, 2)
    # D: (nc*nd, nv) rows = dir_k . Jt_c
    D = jnp.einsum("kd,cdv->ckv", dirs, Jt).reshape(nc * nd, nv)

    Minv_NT = jnp.linalg.solve(M, Jn.T)  # (nv, nc)
    Minv_DT = jnp.linalg.solve(M, D.T)  # (nv, nc*nd)

    NMN = Jn @ Minv_NT
    NMD = Jn @ Minv_DT
    DMN = D @ Minv_NT
    DMD = D @ Minv_DT
    E = jnp.kron(jnp.eye(nc, dtype=dtype), jnp.ones((nd, 1), dtype))

    Z = jnp.zeros((nc, nc), dtype)
    Mlcp = jnp.block([
        [NMN, NMD, Z],
        [DMN, DMD, E],
        [jnp.diag(mu.astype(dtype)), -E.T, Z],
    ])
    qlcp = jnp.concatenate([Jn @ v_star, D @ v_star, jnp.zeros(nc, dtype)])

    if use_lemke:
        res = lcp_mod.lemke(np.asarray(Mlcp), np.asarray(qlcp))
        z = jnp.asarray(res.z, dtype)
        resid = jnp.asarray(0.0 if res.success else jnp.inf, dtype)
    else:
        # FB-Newton needs a P-matrix; the pyramid LCP is only copositive —
        # regularize the diagonal (Tikhonov, the reference uses the same
        # trick via cfm-style regularization in MobyLCP fast paths).
        n_all = Mlcp.shape[0]
        Mreg = Mlcp + 1e-8 * jnp.eye(n_all, dtype=dtype)
        z, resid = lcp_mod.solve_lcp_fb(Mreg, qlcp, iterations=iterations)

    cn = z[:nc]
    beta = z[nc : nc + nc * nd].reshape(nc, nd)
    v = v_star + Minv_NT @ cn + Minv_DT @ z[nc : nc + nc * nd]
    return RigidContactResult(v, cn, beta, resid)
