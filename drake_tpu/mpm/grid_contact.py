"""Implicit grid-level frictional contact for MPM — the fork's flagship.

Re-derivation of the reference's grid contact Newton (reference:
multibody/gpu_mpm/cuda_mpm_solver.cu:215-621 UpdateContact — Newton /
coordinate descent on touched grid DoFs with a global exact line search;
kernels cuda_mpm_kernels.cuh:1043 contact_particle_to_grid_kernel per-pair
energy model scattered to the grid, :1218 update_grid_contact_coordinate_
descent_kernel per-node 3x3 descent solve, :1277 grid_to_particle_vdb_
line_search_kernel E(alpha) evaluation) as a pure jittable function.

The post-transfer grid velocities v* become the free-motion target of an
implicit minimization over grid velocities v:

    E(v) = sum_i 1/2 m_i ||v_i - v_i*||^2  +  sum_p e_p(v_p(v))

where v_p = sum_i w_ip v_i interpolates v at each contact particle with the
quadratic B-spline stencil, and e_p is the contact energy of particle p
against a rigid geometry (normal penalty with damping + regularized Coulomb
friction against the rigid surface velocity).  Impulse-unit convention:
d e_p / d v_p is an impulse, so stationarity reads
m_i (v_i - v_i*) = - sum_p w_ip d e_p/d v_p.

TPU-native solver shape (vs the CUDA 27-color Gauss-Seidel / Jacobi):
  - per-node BLOCK-JACOBI Newton: every touched node's 3x3 system is solved
    in closed form simultaneously (one vectorized adjugate inverse — the
    reference's `use_jacobi=true` mode without the per-node kernel launch),
  - a GLOBAL vectorized exact line search on dE/dalpha (monotone for the
    convexified model): directional precompute + K-point bracketing grid +
    secant — the same restructuring as the SAP solver's line search, replacing
    the reference's sequential rtsafe Newton-with-bisection (:375-470).

Implicitness is what buys stiff contact at large substeps: the explicit
per-particle penalty (drake_tpu.mpm.coupling) is stability-limited to
dt < ~2/sqrt(k_eff) and cannot hold stiction under gravity at large k*dt,
while this solve is unconditionally stable in the normal direction (the
energy is convex in v for fixed friction magnitude).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from drake_tpu.mpm import solver as mpm
from drake_tpu.mpm.coupling import RigidGeom, _particle_sdf


@dataclasses.dataclass(frozen=True)
class GridContactParams:
    """Mirror of MpmConfigParams' contact block + solver knobs
    (cpu_mpm_model.h:17-26; solver hard settings cuda_mpm_solver.cu:234-239
    — max 2000 iters / tol 1e-4 / Jacobi relax 0.3; the vectorized exact
    line search lets us run relax=1 and far fewer iterations)."""

    stiffness: float = 1e5  # normal penalty k [N/m]
    damping: float = 10.0  # normal rate damping d [N s/m]
    friction: float = 0.5
    slip_velocity: float = 1e-3  # friction regularization (huber eps) [m/s]
    margin: float = 0.0  # activation distance for candidate pairs [m]
    max_iterations: int = 20
    rel_tolerance: float = 1e-4  # ||dir|| / #active-dofs (reference :236)
    relax: float = 1.0
    line_search_points: int = 12
    # Bracket refinement passes: 2 = the committed two-level grid; 1 runs a
    # single K-point pass + secant (13 pair-gradient evals per Newton
    # iteration instead of 25 — the throughput lever for batched rollouts).
    line_search_levels: int = 2
    alpha_max: float = 1.5
    # Extended-active-list capacity factor for the tile-hosted solve
    # (tiles_contact.resident_substep_contact): closure capacity =
    # factor * max_active_blocks.  Every per-node Newton array scales with
    # it; overflow is REPORTED through `dropped`, never silent.
    ext_capacity_factor: int = 4
    # Planning/rollout fast path (the SapParameters.unroll_iterations
    # analog): when > 0, run EXACTLY this many Newton iterations as a
    # fixed-length scan with a single-level line search — no while_loop,
    # so vmapped rollout lanes (MPPI samples, batched scenarios) don't
    # lock-step to the slowest lane's iteration count.  The converged
    # while_loop stays the default for single-stream accuracy.
    unroll_iterations: int = 0
    # Contact-row compaction capacity for the tile-hosted solve
    # (tiles_contact.py): per-pair gradient/Hessian and line-search work
    # runs on at most this many CONTACT-ACTIVE slab rows instead of every
    # padded row (the reference's contact-pair compaction role,
    # cuda_mpm_model.cuh:209-224 device contact-pair buffers).  0 = auto
    # (max(512, nrows // 8)); overflow beyond the capacity is REPORTED
    # through `dropped`, never silent.
    max_contact_rows: int = 0


class GridContactSolution(NamedTuple):
    grid_vel: jnp.ndarray  # (nx, ny, nz, 3) post-contact grid velocities
    impulses: jnp.ndarray  # (n_geoms, 6) [tau; f] spatial impulse per rigid
    iterations: jnp.ndarray
    residual: jnp.ndarray


def _pair_quantities(state: mpm.MpmState, geoms: Sequence[RigidGeom]):
    """Static-shape candidate pair data: per (geom, particle) phi0, normal,
    rigid surface velocity.  Shapes (G, n, ...)."""
    phis, ns, vgs = [], [], []
    for geom in geoms:
        phi, n = _particle_sdf(geom, state.x)
        n = jnp.broadcast_to(n, state.x.shape)  # halfspace returns (3,)
        w, vo = geom.V_WB[:3], geom.V_WB[3:]
        v_g = vo + jnp.cross(
            jnp.broadcast_to(w, state.x.shape), state.x - geom.p_WB
        )
        phis.append(phi)
        ns.append(n)
        vgs.append(v_g)
    return jnp.stack(phis), jnp.stack(ns), jnp.stack(vgs)


def _contact_grad_hess(p: GridContactParams, dt, phi0, n, v_rel, active):
    """Per-pair energy gradient (impulse) and PSD Gauss-Newton Hessian wrt
    v_p.  Friction magnitude is lagged (treated constant in derivatives) —
    the standard convexification; phi_hat = phi0 + dt*vn is the end-of-step
    penetration estimate (contact_particle_to_grid_kernel's model)."""
    k, d, mu, eps = p.stiffness, p.damping, p.friction, p.slip_velocity
    vn = jnp.sum(v_rel * n, axis=-1)
    vt = v_rel - vn[..., None] * n
    phi_hat = phi0 + dt * vn
    pen = jnp.maximum(-phi_hat, 0.0)
    act = active & (phi_hat < 0.0)
    actf = act.astype(v_rel.dtype)

    f_n = actf * jnp.maximum(k * pen - d * vn, 0.0)  # >= 0 normal force
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    inv_slip = 1.0 / jnp.maximum(vt_norm, eps)

    # grad (impulse units): normal penalty + damping along n, friction on vt.
    g = (
        (-dt * f_n)[..., None] * n
        + (dt * mu * f_n * inv_slip)[..., None] * vt
    )
    # Gauss-Newton Hessian: dt^2 (k + d/dt) n n' + dt mu f_n/|vt| (I - n n').
    hn = actf * dt * (dt * k + d)
    hf = dt * mu * f_n * inv_slip
    eye = jnp.eye(3, dtype=v_rel.dtype)
    nnT = n[..., :, None] * n[..., None, :]
    H = hn[..., None, None] * nnT + hf[..., None, None] * (eye - nnT)
    return g, H, f_n


def _contact_grad(p: GridContactParams, dt, phi0, n, v_rel, active):
    """Gradient-only variant of _contact_grad_hess (the line search needs
    no Hessian; skipping it halves the per-alpha FLOPs and drops the
    (..., 3, 3) temporaries)."""
    k, d, mu, eps = p.stiffness, p.damping, p.friction, p.slip_velocity
    vn = jnp.sum(v_rel * n, axis=-1)
    vt = v_rel - vn[..., None] * n
    phi_hat = phi0 + dt * vn
    pen = jnp.maximum(-phi_hat, 0.0)
    act = active & (phi_hat < 0.0)
    actf = act.astype(v_rel.dtype)
    f_n = actf * jnp.maximum(k * pen - d * vn, 0.0)
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    inv_slip = 1.0 / jnp.maximum(vt_norm, eps)
    return (
        (-dt * f_n)[..., None] * n
        + (dt * mu * f_n * inv_slip)[..., None] * vt
    )


def _ls_dcost_pairs(p: GridContactParams, dt, phi0, n, v_rel, dvp, active):
    """d/dalpha of the pair energies at v_rel (lagged-friction gradient
    dotted with the direction dvp).  Vectorized over a leading alpha axis."""
    g, _, _ = _contact_grad_hess(p, dt, phi0, n, v_rel, active)
    return jnp.sum(g * dvp)


def solve_grid_contact(
    config: mpm.MpmConfig,
    params: GridContactParams,
    state: mpm.MpmState,
    grid_mass: jnp.ndarray,  # (nx, ny, nz)
    grid_vel: jnp.ndarray,  # (nx, ny, nz, 3) free-motion (post update_grid)
    geoms: Sequence[RigidGeom],
) -> GridContactSolution:
    """Implicit grid contact solve (UpdateContact role).

    Returns post-contact grid velocities plus the accumulated spatial
    impulses on each rigid geometry's body (apply_contact_impulse_to_
    rigid_bodies role, cuda_mpm_kernels.cuh:1617)."""
    dt = config.dt
    dx = config.dx
    nx, ny, nz = config.grid_size
    dtype = grid_vel.dtype
    n_p = state.x.shape[0]
    G = len(geoms)
    if G == 0:
        return GridContactSolution(
            grid_vel=grid_vel,
            impulses=jnp.zeros((0, 6), dtype),
            iterations=jnp.zeros((), jnp.int32),
            residual=jnp.zeros((), dtype),
        )

    phi0, n_pg, v_g = _pair_quantities(state, geoms)  # (G, n, ...)
    active0 = phi0 < params.margin  # candidate set (static shape, masked)

    base, w = mpm._bspline_weights(state.x, dx)
    hi = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)
    # Precompute the 27 stencil taps: indices (n, 27), weights (n, 27).
    offsets = jnp.asarray(
        [[i, j, k] for i, j, k in mpm._stencil_iter()], jnp.int32
    )
    idx = base[:, None, :] + offsets[None, :, :]  # (n, 27, 3)
    tap_valid = jnp.all((idx >= 0) & (idx <= hi), axis=-1)
    idx_c = jnp.clip(idx, 0, hi)
    weight = (
        w[:, 0, offsets[:, 0]] * w[:, 1, offsets[:, 1]] * w[:, 2, offsets[:, 2]]
    ) * tap_valid.astype(dtype)  # (n, 27)
    flat = (idx_c[..., 0] * ny + idx_c[..., 1]) * nz + idx_c[..., 2]  # (n, 27)
    flat_masked = jnp.where(tap_valid, flat, nx * ny * nz)

    # Domain-wall nodes stay pinned (BCs re-applied to the direction).
    ww = config.wall_width
    ii = jnp.arange(nx)[:, None, None]
    jj = jnp.arange(ny)[None, :, None]
    kk = jnp.arange(nz)[None, None, :]
    inside = (
        (ii >= ww) & (ii < nx - ww)
        & (jj >= ww) & (jj < ny - ww)
        & (kk >= ww) & (kk < nz - ww)
    )
    movable = (inside & (grid_mass > 0)).astype(dtype)[..., None]
    n_dofs = jnp.maximum(jnp.sum(movable), 1.0)

    m_flat = grid_mass.reshape(-1)
    v_star = grid_vel

    def gather_vp(v):
        """Interpolate grid field at the contact particles: (n, 3)."""
        vf = v.reshape(-1, 3)
        taps = vf[flat]  # (n, 27, 3) — row gather
        return jnp.sum(weight[..., None] * taps, axis=1)

    def scatter(vals):
        """Scatter per-particle (n, c) with stencil weights -> (nx*ny*nz, c)."""
        c = vals.shape[-1]
        contrib = weight[..., None] * vals[:, None, :]  # (n, 27, c)
        return (
            jnp.zeros((nx * ny * nz + 1, c), dtype)
            .at[flat_masked.reshape(-1)]
            .add(contrib.reshape(-1, c), mode="drop")[:-1]
        )

    def scatter_sq(vals):
        """Same with squared weights (the Jacobi diagonal needs w_ip^2)."""
        c = vals.shape[-1]
        contrib = (weight**2)[..., None] * vals[:, None, :]
        return (
            jnp.zeros((nx * ny * nz + 1, c), dtype)
            .at[flat_masked.reshape(-1)]
            .add(contrib.reshape(-1, c), mode="drop")[:-1]
        )

    def pair_grad_hess(v):
        vp = gather_vp(v)  # (n, 3)
        v_rel = vp[None] - v_g  # (G, n, 3)
        g, H, f_n = _contact_grad_hess(
            params, dt, phi0, n_pg, v_rel, active0
        )
        g_p = jnp.sum(g, axis=0)  # (n, 3) summed over geometries
        H_p = jnp.sum(H, axis=0)  # (n, 3, 3)
        return g_p, H_p, g

    def body(carry):
        v, it, res = carry
        g_p, H_p, _ = pair_grad_hess(v)
        grid_g = (
            m_flat[:, None] * (v.reshape(-1, 3) - v_star.reshape(-1, 3))
            + scatter(g_p)
        ).reshape(nx, ny, nz, 3)
        grid_H = scatter_sq(H_p.reshape(n_p, 9)).reshape(nx, ny, nz, 3, 3)
        # + m_i I; empty nodes get I so the closed-form inverse stays finite
        # (their direction is zeroed by `movable` anyway).
        m_safe = jnp.where(grid_mass > 0, grid_mass, 1.0)
        grid_H = grid_H + m_safe[..., None, None] * jnp.eye(3, dtype=dtype)
        dirn = -params.relax * jnp.einsum(
            "...ij,...j->...i", mpm._inv3(grid_H), grid_g
        )
        dirn = dirn * movable

        # Global exact line search on dE/dalpha (SAP-style two-level grid).
        dvp = gather_vp(dirn)  # (n, 3) direction at the particles
        vp0 = gather_vp(v)
        a0 = jnp.sum(dirn * (grid_mass[..., None] * (v - v_star)))
        a1 = jnp.sum(dirn * (grid_mass[..., None] * dirn))

        def f(alphas):  # (K,) -> (K,)
            vr = (vp0[None] + alphas[:, None, None] * dvp[None])[:, None]
            vr = vr - v_g[None]  # (K, G, n, 3)
            g_a, _, _ = _contact_grad_hess(
                params, dt, phi0[None], n_pg[None], vr, active0[None]
            )
            return (
                a0
                + alphas * a1
                + jnp.einsum("kgni,ni->k", g_a, dvp)
            )

        K = params.line_search_points
        amax = jnp.asarray(params.alpha_max, dtype)

        def refine(lo, hi_):
            alphas = lo + (hi_ - lo) * jnp.linspace(0.0, 1.0, K).astype(dtype)
            fs = f(alphas)
            i = jnp.maximum(jnp.sum(fs < 0) - 1, 0)
            ip = jnp.minimum(i + 1, K - 1)
            return alphas[i], alphas[ip], fs[i], fs[ip]

        lo1, hi1, _, _ = refine(jnp.asarray(0.0, dtype), amax)
        lo2, hi2, flo, fhi = refine(lo1, hi1)
        denom = fhi - flo
        alpha = lo2 - flo * (hi2 - lo2) / jnp.where(
            jnp.abs(denom) > 1e-20, denom, 1.0
        )
        alpha = jnp.clip(alpha, lo2, hi2)
        f_amax = f(amax[None])[0]
        alpha = jnp.where(f_amax <= 0, amax, alpha)

        v_new = v + alpha * dirn
        res_new = jnp.linalg.norm(dirn) / n_dofs  # reference residual (:236)
        return (v_new, it + 1, res_new)

    def cond(carry):
        _, it, res = carry
        return jnp.logical_and(
            res > params.rel_tolerance, it < params.max_iterations
        )

    v0 = grid_vel
    init = (v0, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dtype))
    v_sol, it, res = jax.lax.while_loop(cond, body, init)

    # Rigid reaction impulses at the solution: +de_p/dv_p on the rigid body,
    # with torque about each geometry's body origin.
    vp = gather_vp(v_sol)
    v_rel = vp[None] - v_g
    g_final, _, _ = _contact_grad_hess(params, dt, phi0, n_pg, v_rel, active0)
    imp_lin = jnp.sum(g_final, axis=1)  # (G, 3)
    levers = state.x[None] - jnp.stack([g.p_WB for g in geoms])[:, None]
    imp_tau = jnp.sum(jnp.cross(levers, g_final), axis=1)  # (G, 3)
    impulses = jnp.concatenate([imp_tau, imp_lin], axis=-1)

    return GridContactSolution(
        grid_vel=v_sol, impulses=impulses, iterations=it, residual=res
    )


def coupled_substep_implicit(
    config: mpm.MpmConfig,
    params: GridContactParams,
    state: mpm.MpmState,
    geoms: Sequence[RigidGeom],
) -> Tuple[mpm.MpmState, jnp.ndarray]:
    """One MPM substep with IMPLICIT grid contact (the fork's pipeline:
    P2G -> UpdateGrid -> UpdateContact -> G2P, cuda_mpm_solver.cuh:18-164).

    Returns (state, rigid spatial impulses (n_geoms, 6))."""
    grid = mpm.particle_to_grid(config, state)
    grid_vel = mpm.update_grid(config, grid)
    sol = solve_grid_contact(config, params, state, grid.mass, grid_vel, geoms)
    state = mpm.grid_to_particle(config, state, sol.grid_vel)
    return state.replace(dropped=jnp.asarray(grid.dropped, jnp.int32)), (
        sol.impulses
    )
