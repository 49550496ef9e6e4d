"""Implicit grid contact on the tile-slab MPM pipeline.

The same grid-contact Newton as mpm/grid_contact.py (reference:
multibody/gpu_mpm/cuda_mpm_solver.cu:215-621 UpdateContact — per-node
block-Jacobi Newton + global exact line search), re-hosted on the tile-slab
transfer machinery (mpm/tiles.py) so the per-iteration gather/scatter pairs
are factorized MXU matmuls over active-block windows instead of dense-grid
`.at[].add` scatters (the round-2 VERDICT's "exact pattern that was 13x
slow" item).

Key structural points:

  * **Extended active list.**  P2G mass spills one node beyond each active
    block, so massive grid nodes can be OWNED by particle-free neighbor
    blocks.  The Newton solves every massive node exactly once in BLOCK
    space over the active blocks' 27-neighborhood closure (`_extend_active`)
    — each grid node appears in exactly one block, so the scalar reductions
    (line-search directional derivatives, residual, dof count) match the
    dense solve without duplicate-node corrections.
  * **w^2 transfers for free.**  The Jacobi diagonal needs sum_p w_ip^2 H_p;
    the factorized weights square factor-wise (Wx**2, (WyWz)**2), so the
    squared-weight scatter reuses the same einsum path.
  * **Plane-form 3x3 node solves.**  The per-node Newton systems invert on
    (Ae, 64) channel planes (tiles._inv3p) — no trailing (3, 3) dims.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.mpm import solver as mpm
from drake_tpu.mpm import tiles
from drake_tpu.mpm.coupling import RigidGeom, _particle_sdf
from drake_tpu.mpm.grid_contact import (
    GridContactParams,
    _contact_grad,
    _contact_grad_hess,
)
from drake_tpu.mpm.tiles import (
    TS,
    SortedMpm,
    TransferCtx,
    _active_coords,
    _grid_blocks,
    _inv3p,
    _neighbor_index,
    _overlap_masks,
    _update_windows,
    _window_overlap_add,
    g2p_field,
    g2p_finish,
    p2g_field,
    transfer_ctx,
)

import functools


@functools.lru_cache(maxsize=None)
def _partition_masks():
    """(27, 512) OWNERSHIP masks for block->window gathers: window node
    o = (ix*8+iy)*8+iz is owned by neighbor delta d per axis with
    d(0) = -1, d(1..4) = 0, d(5..7) = +1 — a partition (vs the overlap-add
    masks, where a node may be contributed by several deltas)."""
    o = np.arange(512)
    ax = [o // 64, (o // 8) % 8, o % 8]
    own = [np.where(a == 0, -1, np.where(a <= 4, 0, 1)) for a in ax]
    masks = []
    for dxb in (-1, 0, 1):
        for dyb in (-1, 0, 1):
            for dzb in (-1, 0, 1):
                m = (own[0] == dxb) & (own[1] == dyb) & (own[2] == dzb)
                masks.append(m.astype(np.float32))
    return np.stack(masks)


@functools.lru_cache(maxsize=None)
def _center_index():
    """(64,) flat window index of each block-owned node: window coord
    b + 1 per axis for block-local node b in 0..3."""
    b = np.arange(64)
    bi, bj, bk = b // 16, (b // 4) % 4, b % 4
    return ((bi + 1) * 8 + (bj + 1)) * 8 + (bk + 1)


def windows_to_center(win_rows: jnp.ndarray) -> jnp.ndarray:
    """(A, ch, 512) window rows -> (A, ch, 64) block-owned node values."""
    return win_rows[:, :, jnp.asarray(_center_index())]


def blocks_to_windows(blk_vals: jnp.ndarray, nbr_idx: jnp.ndarray):
    """(A, ch, 64) block-owned node values -> (A, ch, 512) full 8^3 windows
    (partition-masked rolls — the gather dual of tiles._window_overlap_add).
    """
    A, ch = blk_vals.shape[0], blk_vals.shape[1]
    dtype = blk_vals.dtype
    emb = jnp.zeros((A, ch, 512), dtype).at[
        :, :, jnp.asarray(_center_index())
    ].set(blk_vals)
    masks_np, shifts = _overlap_masks()
    pmasks = jnp.asarray(_partition_masks(), dtype)
    emb_p = jnp.concatenate([emb, jnp.zeros((1, ch, 512), dtype)], axis=0)
    win = jnp.zeros((A, ch, 512), dtype)
    # Per-delta gather accumulated in place (no (A, 27, ch, 512) buffer —
    # see tiles._window_overlap_add's HBM note).
    for d in range(27):
        win = win + pmasks[d][None, None, :] * jnp.roll(
            emb_p[nbr_idx[:, d]], shifts[d], axis=-1
        )
    return win


def _extend_active(config, active: jnp.ndarray, ext_capacity: int):
    """The 27-neighborhood closure of the active block set, sorted, deduped,
    statically sized (overflow count returned, not silently dropped).

    Returns (ext_active (Ae,), slot_map (A,) original slot -> ext slot,
    overflow ())."""
    nbx, nby, nbz = _grid_blocks(config)
    nblocks = nbx * nby * nbz
    A = active.shape[0]
    abx, aby, abz = _active_coords(config, active)
    cands = []
    for dxb in (-1, 0, 1):
        for dyb in (-1, 0, 1):
            for dzb in (-1, 0, 1):
                tx, ty, tz = abx + dxb, aby + dyb, abz + dzb
                ok = (
                    (tx >= 0) & (tx < nbx)
                    & (ty >= 0) & (ty < nby)
                    & (tz >= 0) & (tz < nbz)
                    & (active < nblocks)
                )
                cands.append(
                    jnp.where(ok, (tx * nby + ty) * nbz + tz, nblocks)
                )
    cand = jnp.sort(jnp.stack(cands, axis=0).reshape(-1))  # (27A,)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), cand[1:] != cand[:-1]]
    ) & (cand < nblocks)
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1  # dedup rank
    n_unique = jnp.sum(first.astype(jnp.int32))
    over = jnp.maximum(n_unique - ext_capacity, 0).astype(jnp.int32)
    wslot = jnp.where(first & (slot < ext_capacity), slot, ext_capacity)
    ext = jnp.full((ext_capacity + 1,), nblocks, jnp.int32).at[wslot].set(
        cand.astype(jnp.int32), mode="drop"
    )[:-1]
    # Original block -> ext slot (original blocks always fit first? no —
    # dedup rank is by block id, so an original may land past capacity if
    # the closure overflows; searchsorted handles it, overflow is reported).
    smap = jnp.clip(
        jnp.searchsorted(ext, active), 0, ext_capacity - 1
    ).astype(jnp.int32)
    return ext, smap, over


def solve_contact_tiles(
    config: mpm.MpmConfig,
    params: GridContactParams,
    ss_ext: SortedMpm,
    ctx: TransferCtx,
    geoms: Sequence[RigidGeom],
    nbr_idx: jnp.ndarray,
    win_mm: jnp.ndarray,  # (Ae, 4, 512) assembled [mass, momentum] windows
    win_v_star: jnp.ndarray,  # (Ae, 3, 512) free-motion window velocities
):
    """Block-space grid-contact Newton (UpdateContact role) on the tile
    transfer machinery.  Returns (win_v_sol, impulses, iterations, residual).
    """
    dt = config.dt
    dtype = ss_ext.slab.dtype
    nx, ny, nz = config.grid_size
    Ae = ss_ext.active.shape[0]
    nrows = ss_ext.slab.shape[1]
    G = len(geoms)

    x_rows = jnp.stack(ctx.x, axis=-1)  # (nrows, 3)
    vmf = ctx.vm.reshape(nrows)

    phis, ns, vgs = [], [], []
    for geom in geoms:
        phi, n = _particle_sdf(geom, x_rows)
        n = jnp.broadcast_to(n, x_rows.shape)  # halfspace returns (3,)
        w, vo = geom.V_WB[:3], geom.V_WB[3:]
        v_g = vo + jnp.cross(jnp.broadcast_to(w, x_rows.shape),
                             x_rows - geom.p_WB)
        phis.append(phi)
        ns.append(n)
        vgs.append(v_g)
    phi0 = jnp.stack(phis)  # (G, nrows)
    n_pg = jnp.stack(ns)  # (G, nrows, 3)
    v_g = jnp.stack(vgs)
    # Candidate pairs: near the surface AND a valid (non-padding, fresh)
    # slab row — zero-padded rows sit at the origin and must not contact.
    active0 = (phi0 < params.margin) & (vmf > 0)[None, :]

    # CONTACT-ROW COMPACTION (the reference's contact-pair buffer role,
    # cuda_mpm_model.cuh:209-224): per-pair gradient/Hessian and the
    # K-point line search run on at most C_p contact-active rows instead
    # of every padded slab row.  OPT-IN (max_contact_rows > 0, -1 = auto):
    # measured on TPU at K=64 vmapped rollouts the batched dynamic
    # gathers/scatters it introduces cost MORE than the padded-row
    # arithmetic they save (120.9 vs 153.1 substeps/s, BASELINE.md round
    # 5), so the default stays on full rows; unbatched / large-scene
    # single-stream solves are where the compaction pays.
    compact = params.max_contact_rows != 0
    if compact:
        act_any = jnp.any(active0, axis=0)  # (nrows,)
        C_p = (
            params.max_contact_rows
            if params.max_contact_rows > 0
            else max(512, nrows // 8)
        )
        C_p = min(C_p, nrows)
        rows_c = jnp.nonzero(act_any, size=C_p, fill_value=nrows)[0]
        valid_c = rows_c < nrows
        rc = jnp.minimum(rows_c, nrows - 1)
        over_rows = jnp.maximum(
            jnp.sum(act_any.astype(jnp.int32)) - C_p, 0
        ).astype(jnp.int32)
        phi0_c = phi0[:, rc]  # (G, C_p)
        n_c = n_pg[:, rc]  # (G, C_p, 3)
        vg_c = v_g[:, rc]
        act_c = active0[:, rc] & valid_c[None, :]
        x_c = x_rows[rc]

        def take_rows(a):
            return a[rc]

    else:
        over_rows = jnp.zeros((), jnp.int32)
        phi0_c, n_c, vg_c, act_c, x_c = phi0, n_pg, v_g, active0, x_rows

        def take_rows(a):
            return a

    m_blk = windows_to_center(win_mm[:, 0:1, :])[:, 0, :]  # (Ae, 64)
    v_star = windows_to_center(win_v_star)  # (Ae, 3, 64)

    # Wall / empty-node mask on block-owned nodes.
    abx, aby, abz = _active_coords(config, ss_ext.active)
    b64 = jnp.arange(64, dtype=jnp.int32)
    Xc = 4 * abx[:, None] + b64[None, :] // 16
    Yc = 4 * aby[:, None] + (b64[None, :] // 4) % 4
    Zc = 4 * abz[:, None] + b64[None, :] % 4
    wwd = config.wall_width
    inside = (
        (Xc >= wwd) & (Xc < nx - wwd)
        & (Yc >= wwd) & (Yc < ny - wwd)
        & (Zc >= wwd) & (Zc < nz - wwd)
    )
    movable = (inside & (m_blk > 0)).astype(dtype)[:, None, :]  # (Ae,1,64)
    n_dofs = jnp.maximum(jnp.sum(movable), 1.0)  # node count (dense :187)
    m_safe = jnp.where(m_blk > 0, m_blk, 1.0)

    Wx, W2 = ctx.Wx, ctx.W2
    Wx2, W22 = Wx * Wx, W2 * W2

    def gather_vp(v_blk):
        win = blocks_to_windows(v_blk, nbr_idx)  # (Ae, 3, 512)
        vp = g2p_field(ss_ext, Wx, W2, win)  # 3 planes
        return jnp.stack(vp, axis=-1)  # (nrows, 3)

    def scatter_center(planes, sq=False):
        rows = p2g_field(
            ss_ext, Wx2 if sq else Wx, W22 if sq else W2, planes
        )  # (Ae, c, 512) window contributions
        tot = _window_overlap_add(rows, nbr_idx)  # true per-node totals
        return windows_to_center(tot)  # (Ae, c, 64)

    def expand_rows(vals_c):
        """(C_p,) compacted channel -> (nrows,) full-row plane."""
        if not compact:
            return vals_c
        return (
            jnp.zeros((nrows,), dtype)
            .at[rc]
            .add(jnp.where(valid_c, vals_c, 0.0))
        )

    def pair_grad(v_blk):
        vp = gather_vp(v_blk)  # (nrows, 3) — MXU tile gather, keep full
        vp_c = take_rows(vp)  # (C_p, 3)
        v_rel = vp_c[None] - vg_c  # (G, C_p, 3)
        g, H, _ = _contact_grad_hess(params, dt, phi0_c, n_c, v_rel, act_c)
        return vp_c, g, H

    def body(carry):
        v, it, res = carry  # v: (Ae, 3, 64)
        vp0, g, H = pair_grad(v)
        g_p = jnp.sum(g, axis=0)  # (C_p, 3)
        H_p = jnp.sum(H, axis=0)  # (C_p, 3, 3)
        g_blk = scatter_center(
            [expand_rows(g_p[:, i]) for i in range(3)]
        )  # (Ae,3,64)
        H_blk = scatter_center(
            [
                expand_rows(H_p[:, i, j])
                for i in range(3)
                for j in range(3)
            ],
            sq=True,
        )  # (Ae, 9, 64)
        grid_g = m_blk[:, None, :] * (v - v_star) + g_blk
        Hm = [
            [
                H_blk[:, 3 * i + j, :] + (m_safe if i == j else 0.0)
                for j in range(3)
            ]
            for i in range(3)
        ]
        Hinv = _inv3p(Hm)
        dirn = jnp.stack(
            [
                -params.relax
                * (
                    Hinv[i][0] * grid_g[:, 0, :]
                    + Hinv[i][1] * grid_g[:, 1, :]
                    + Hinv[i][2] * grid_g[:, 2, :]
                )
                for i in range(3)
            ],
            axis=1,
        ) * movable  # (Ae, 3, 64)

        # Global exact line search on dE/dalpha (grid_contact.py:246-281,
        # same two-level K-point bracket + secant) — per-alpha pair work
        # is GRADIENT-ONLY on the compacted contact rows.
        dvp = take_rows(gather_vp(dirn))  # (C_p, 3)
        a0 = jnp.sum(dirn * (m_blk[:, None, :] * (v - v_star)))
        a1 = jnp.sum(dirn * (m_blk[:, None, :] * dirn))

        def f(alphas):
            vr = (vp0[None] + alphas[:, None, None] * dvp[None])[:, None]
            vr = vr - vg_c[None]
            g_a = _contact_grad(
                params, dt, phi0_c[None], n_c[None], vr, act_c[None]
            )
            return a0 + alphas * a1 + jnp.einsum("kgni,ni->k", g_a, dvp)

        K = params.line_search_points
        amax = jnp.asarray(params.alpha_max, dtype)

        def refine(lo, hi_):
            alphas = lo + (hi_ - lo) * jnp.linspace(0.0, 1.0, K).astype(dtype)
            fs = f(alphas)
            i = jnp.maximum(jnp.sum(fs < 0) - 1, 0)
            ip = jnp.minimum(i + 1, K - 1)
            return alphas[i], alphas[ip], fs[i], fs[ip]

        if params.line_search_levels >= 2:
            lo1, hi1, _, _ = refine(jnp.asarray(0.0, dtype), amax)
            lo2, hi2, flo, fhi = refine(lo1, hi1)
        else:
            # Single-level bracket + secant: 13 pair evals instead of 25.
            lo2, hi2, flo, fhi = refine(jnp.asarray(0.0, dtype), amax)
        denom = fhi - flo
        alpha = lo2 - flo * (hi2 - lo2) / jnp.where(
            jnp.abs(denom) > 1e-20, denom, 1.0
        )
        alpha = jnp.clip(alpha, lo2, hi2)
        f_amax = f(amax[None])[0]
        alpha = jnp.where(f_amax <= 0, amax, alpha)

        v_new = v + alpha * dirn
        res_new = jnp.sqrt(jnp.sum(dirn**2)) / n_dofs
        return (v_new, it + 1, res_new)

    def cond(carry):
        _, it, res = carry
        return jnp.logical_and(
            res > params.rel_tolerance, it < params.max_iterations
        )

    init = (v_star, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dtype))
    if params.unroll_iterations > 0:
        # Fixed-iteration loop: every lane does EXACTLY N iterations, so
        # vmapped lanes never lock-step to the slowest lane's convergence
        # (GridContactParams docstring).  TPU CAUTION: vmapping the
        # fixed-count solve at >= ~16 lanes faults the current TPU
        # runtime (reproduced in scan, counter-while, and both
        # line-search forms; the CONVERGED while_loop path runs clean at
        # K=64 in the same session — BASELINE.md round 4).  Use the fast
        # path on CPU, unbatched, or at small K; batched TPU rollouts
        # keep the converged default.
        n_fix = params.unroll_iterations

        def cond_fixed(carry):
            return carry[1] < n_fix

        v_sol, it, res = jax.lax.while_loop(cond_fixed, body, init)
    else:
        v_sol, it, res = jax.lax.while_loop(cond, body, init)

    # Rigid reaction impulses at the solution (cuda_mpm_kernels.cuh:1617).
    vp_c = take_rows(gather_vp(v_sol))
    v_rel = vp_c[None] - vg_c
    g_final = _contact_grad(params, dt, phi0_c, n_c, v_rel, act_c)
    imp_lin = jnp.sum(g_final, axis=1)  # (G, 3)
    levers = x_c[None] - jnp.stack([g.p_WB for g in geoms])[:, None]
    imp_tau = jnp.sum(jnp.cross(levers, g_final), axis=1)
    impulses = jnp.concatenate([imp_tau, imp_lin], axis=-1)

    win_v_sol = blocks_to_windows(v_sol, nbr_idx)
    return win_v_sol, impulses, it, res, over_rows


def resident_substep_contact(
    config: mpm.MpmConfig,
    params: GridContactParams,
    ss: SortedMpm,
    geoms: Sequence[RigidGeom],
    particle_force: Optional[jnp.ndarray] = None,
    ext_capacity: Optional[int] = None,
) -> Tuple[SortedMpm, jnp.ndarray]:
    """One MLS-MPM substep with IMPLICIT grid contact on the tile pipeline
    (P2G -> UpdateGrid -> UpdateContact -> G2P, cuda_mpm_solver.cu:18-164).

    Returns (new sorted state, rigid spatial impulses (n_geoms, 6)).  The
    substep runs over the extended active list (27-closure), so the Newton
    covers every massive node exactly once; closure overflow beyond
    `ext_capacity` (default 4x max_active_blocks) adds to `dropped`.
    """
    A = config.max_active_blocks
    if ext_capacity is None:
        ext_capacity = params.ext_capacity_factor * A
    ext, smap, over = _extend_active(config, ss.active, ext_capacity)
    ss_ext = ss.replace(active=ext, a_of_tile=smap[ss.a_of_tile])

    ctx = transfer_ctx(config, ss_ext, particle_force)
    nbr_idx = _neighbor_index(config, ext)
    win_mm = _window_overlap_add(ctx.vals_rows, nbr_idx)
    win_v = _update_windows(config, ext, win_mm)

    if len(geoms) == 0:
        new_ss = g2p_finish(config, ss_ext, ctx, win_v)
        return (
            new_ss.replace(
                active=ss.active, a_of_tile=ss.a_of_tile,
                dropped=new_ss.dropped + over,
            ),
            jnp.zeros((0, 6), ss.slab.dtype),
        )

    win_v_sol, impulses, _, _, over_rows = solve_contact_tiles(
        config, params, ss_ext, ctx, geoms, nbr_idx, win_mm, win_v
    )
    new_ss = g2p_finish(config, ss_ext, ctx, win_v_sol)
    return (
        new_ss.replace(
            active=ss.active, a_of_tile=ss.a_of_tile,
            dropped=new_ss.dropped + over + over_rows,
        ),
        impulses,
    )
