"""FEM deformables coupled into SAP as a vertex clique.

Re-derivation of the reference's deformable-in-SAP integration
(multibody/plant/deformable_driver.cc + contact_solvers/sap/
sap_fixed_constraint.h): the FEM vertex velocities become an extra SAP
clique whose dynamics matrix is the incremental-potential tangent at the
free-motion state, and vertex-vs-rigid contacts enter the SAME convex SAP
problem as cone-projected constraints.  This is what the smooth penalty in
fem/solver.py cannot give: solver-consistent STICTION — the penalty's
tangential term is viscous (it always creeps on an incline), while the SAP
cone projection holds exact stiction below the friction cone
(tests/test_fem_sap.py, the FEM analog of the MPM grid-contact stiction
acceptance bar).

Shape notes (TPU discipline): the clique is dense — A = M + h^2 K(x*) with
K the elastic Hessian via forward-over-reverse autodiff, PSD because x* is
the free-motion incremental-potential minimizer.  Candidate contacts are
ALL (vertex, geometry) pairs with static shapes; separated pairs project
to zero impulse inside the solver (SAP's speculative-contact discipline).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from drake_tpu.contact import sap
from drake_tpu.fem.model import FemModel, elastic_energy
from drake_tpu.fem.solver import FemSolverOptions, FemState, implicit_step
from drake_tpu.geometry.scene import contact_frame
from drake_tpu.mpm.coupling import RigidGeom, _particle_sdf


@dataclasses.dataclass(frozen=True)
class FemContactParams:
    """Material of the FEM-rigid interface (SAP compliant-contact units:
    stiffness N/m per contact, linear dissipation s/m)."""

    stiffness: float = 1e6
    dissipation: float = 0.02
    friction: float = 0.5


class FemSapResult(NamedTuple):
    state: FemState
    impulses: jnp.ndarray  # (n_geoms, 6) spatial impulses on the rigids
    gamma: jnp.ndarray  # (nc, 3) contact impulses (contact frames)


def sap_fem_step(
    model: FemModel,
    state: FemState,
    h: float,
    geoms: Sequence[RigidGeom],
    contact: FemContactParams = FemContactParams(),
    gravity=(0.0, 0.0, -9.81),
    external_force: Optional[jnp.ndarray] = None,
    options: FemSolverOptions = FemSolverOptions(),
    sap_params: sap.SapParameters = sap.SapParameters(),
) -> FemSapResult:
    """One backward-Euler FEM step with SAP vertex-rigid contact.

    1. Free motion: the incremental-potential Newton WITHOUT contact
       (fem/solver.py) gives x*, v*.
    2. Clique: A = M + h^2 K(x*) (dense elastic Hessian), the SAP-units
       tangent of the implicit scheme at the free-motion minimizer.
    3. Contacts: every (vertex, geometry) pair via the shared SDF library
       (mpm/coupling.py), Drake's R/vhat regularization (contact/sap.py
       assemble conventions), frames from geometry normals.
    4. One solve_sap over the vertex velocities; reaction impulses are
       accumulated per geometry for lagged two-way rigid coupling.
    """
    dtype = state.x.dtype
    N = state.x.shape[0]
    nv = 3 * N
    G = len(geoms)

    free = implicit_step(
        model, state, h, gravity=gravity, external_force=external_force,
        ground_z=None, options=options,
    )
    x_star = free.x
    v_star = free.v.reshape(nv)
    freem = model.dirichlet  # (N,) 1 = free

    # Clique dynamics matrix A = M + h^2 K(x*); Dirichlet rows/cols pinned
    # to identity so pinned vertices keep v = 0 through the solve.
    K = jax.jacfwd(jax.grad(lambda xf: elastic_energy(model, xf.reshape(N, 3))))(
        x_star.reshape(nv)
    )
    m3 = jnp.repeat(model.mass, 3)
    A = h * h * K + jnp.diag(m3)
    fm = jnp.repeat(freem, 3)
    A = A * fm[:, None] * fm[None, :] + jnp.diag(jnp.where(fm > 0, 0.0, 1.0))
    v_star = v_star * fm

    # Candidate contacts: all (geometry, vertex) pairs at the PREVIOUS
    # positions (phi0 drives the SAP bias, as in the rigid plant).
    phis, frames_all, vsurf = [], [], []
    for geom in geoms:
        phi, n = _particle_sdf(geom, state.x)
        n = jnp.broadcast_to(n, state.x.shape)
        phis.append(phi)
        frames_all.append(contact_frame(n))  # (N, 3, 3) [t1 t2 n] columns
        w_g, vo = geom.V_WB[:3], geom.V_WB[3:]
        vsurf.append(
            vo + jnp.cross(jnp.broadcast_to(w_g, state.x.shape),
                           state.x - geom.p_WB)
        )
    phi0 = jnp.concatenate(phis)  # (nc,)
    frames = jnp.concatenate(frames_all)  # (nc, 3, 3)
    v_surf = jnp.concatenate(vsurf)  # (nc, 3)
    nc = N * G
    # Dirichlet-pinned vertices are anchored to the finger/world, not solved
    # for: their Jacobian rows are zero, so a contact row for them would get
    # w = 0 regularization (NaN gammas) and a fictitious unbalanced impulse.
    # Mark them well-separated so they project to zero inside the solver.
    free_c = jnp.tile(freem, G)  # (nc,)
    phi0 = jnp.where(free_c > 0, phi0, 1.0)
    v_surf = v_surf * free_c[:, None]

    # J: (nc, 3, nv) — vertex-velocity selector rotated into the contact
    # frame (vc = frame^T (v_vertex - v_surface); the surface term goes to
    # vhat).  Pinned vertices produce no rows (their columns are zeroed).
    vid = jnp.tile(jnp.arange(N), G)
    base = 3 * vid  # (nc,)
    rows = frames.transpose(0, 2, 1) * fm[base][..., None, None]  # (nc,3,3)
    J = jnp.zeros((nc, 3, nv), dtype)
    cols = base[:, None] + jnp.arange(3)[None, :]
    J = J.at[
        jnp.arange(nc)[:, None, None],
        jnp.arange(3)[None, :, None],
        cols[:, None, :],
    ].set(rows)

    # Regularization + bias (assemble conventions, contact/sap.py:290-307).
    A_inv_Jt = jnp.linalg.solve(A, J.reshape(-1, nv).T).T.reshape(J.shape)
    W_diag = jnp.einsum("cik,cjk->cij", J, A_inv_Jt)
    # Floor keeps R positive for zero-Jacobian (pinned-vertex) rows.
    w = jnp.maximum(jnp.trace(W_diag, axis1=1, axis2=2) / 3.0, 1e-14)
    k = jnp.full((nc,), contact.stiffness, dtype)
    tau_d = jnp.full((nc,), contact.dissipation, dtype)
    Rn_phys = 1.0 / (h * k * (h + tau_d))
    Rn_near_rigid = sap_params.beta**2 / (4.0 * jnp.pi**2) * w
    Rn = jnp.maximum(Rn_phys, Rn_near_rigid)
    Rt = sap_params.sigma * w
    R = jnp.stack([Rt, Rt, Rn], axis=1)
    t_scale = jnp.where(Rn_phys >= Rn_near_rigid, h + tau_d, h)
    vhat_n = -phi0 / t_scale
    # Moving-surface bias: vc measures v_vertex only, so the surface
    # velocity shifts the constraint origin.
    vhat_surf = jnp.einsum("cij,ci->cj", frames, v_surf)
    vhat = (
        jnp.stack(
            [jnp.zeros_like(vhat_n), jnp.zeros_like(vhat_n), vhat_n], axis=1
        )
        + vhat_surf
    )
    mu = jnp.full((nc,), contact.friction, dtype)

    data = sap.SapData(
        A=A, v_star=v_star, J=J, R=R, vhat=vhat, mu=mu,
        J_lim=jnp.zeros((0, nv), dtype),
        R_lim=jnp.zeros((0,), dtype),
        vhat_lim=jnp.zeros((0,), dtype),
        J_eq=jnp.zeros((0, nv), dtype),
        R_eq=jnp.zeros((0,), dtype),
        vhat_eq=jnp.zeros((0,), dtype),
        J_pd=jnp.zeros((0, nv), dtype),
        R_pd=jnp.zeros((0,), dtype),
        vhat_pd=jnp.zeros((0,), dtype),
        glim_pd=jnp.zeros((0,), dtype),
    )
    sol = sap.solve_sap(data, v_star, sap_params)
    v = sol.v * fm
    x = state.x + h * v.reshape(N, 3)

    # Reaction impulses on the rigid geometries (world frame, about each
    # geometry's body origin): -gamma rotated out of the contact frame.
    gamma_W = jnp.einsum("cij,cj->ci", frames, sol.gamma)  # on the FEM side
    imp = []
    for gi in range(G):
        sl = slice(gi * N, (gi + 1) * N)
        f_g = -gamma_W[sl]  # (N, 3) on the rigid
        lin = jnp.sum(f_g, axis=0)
        lever = state.x - geoms[gi].p_WB
        tau = jnp.sum(jnp.cross(lever, f_g), axis=0)
        imp.append(jnp.concatenate([tau, lin]))
    impulses = (
        jnp.stack(imp) if imp else jnp.zeros((0, 6), dtype)
    )
    return FemSapResult(
        state=FemState(x=x, v=v.reshape(N, 3)), impulses=impulses,
        gamma=sol.gamma,
    )
