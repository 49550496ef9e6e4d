"""Tile-slab MLS-MPM pipeline: the TPU fast path for particle-grid transfers.

Third-generation TPU re-design of the CUDA MPM pipeline (reference:
multibody/gpu_mpm/cuda_mpm_solver.cu RebuildMapping:18 / ParticleToGrid:87 /
UpdateGrid:108 / GridToParticle:154 and the kernels in cuda_mpm_kernels.cuh).
The round-2 design (ops/mpm_kernels.py) used per-active-block Pallas DMA +
one-hot MXU matmuls; its cost was dominated by per-block capacity waste
(every block pays the densest block's DMA window) and VPU-bound one-hot
weight construction.  This design fixes both and needs no Pallas at all:

  * **Tile slabs.**  Particles are sorted by 4^3-cell block id and packed
    into 64-particle *tiles* at static row offsets; a block owns
    ceil(count/64) consecutive tiles.  Work scales with ~n/64 + A tiles
    instead of A * PMAX rows — no densest-block capacity tax.
  * **Factorized B-spline weights.**  The (p, 216)-node one-hot weight
    matrix never materializes: W = Wx (x) (Wy Wz) splits the P2G/G2P
    contractions into per-tile batched matmuls (T, 64, 8*13) x (T, 64, 64)
    that XLA maps straight onto the MXU.
  * **Block-layout grid.**  The grid lives as (nblocks, 4, 4, 4, c); the
    P2G halo combine and the G2P window build are 27 shifted scatter/gather
    ops on that layout — no big transposes, no (nblocks, 216) dense tensor.
  * **Sorted-resident state + 8^3 windows.**  The slab layout stays valid
    while every particle's base cell remains within one cell of its
    sort-time block (CFL: |v| dt resort_every < dx), so the sort runs every
    `resort_every` substeps, not every substep.  The 8^3 (vs minimal 6^3)
    window buys that tolerance; lanes are padded to the same 128-lane tiles
    either way, so the wider window is nearly free.
  * **Channel-major planes.**  Particle state lives as (NC_STATE, nrows)
    channel planes and ALL per-particle math (constitutive, APIC affine,
    advection) runs on 1-D (nrows,) planes with explicit 3x3 index
    arithmetic.  Trailing (3, 3) matrix dims tile as (8, 128) on TPU — a
    113x pad whenever such a tensor materializes; the plane form measured
    ~4x faster for both the stress and the advection tail.

Overflow/staleness is REPORTED, never silent: `SortedMpm.dropped` counts
particles excluded because the active-block capacity A was exceeded or
because they drifted more than one cell from their sort-time block.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_tpu.utils.struct import pytree_dataclass

TS = 64  # particles per tile

# Slab payload CHANNEL layout (state that must round-trip the sort).
_X, _V, _F, _C = slice(0, 3), slice(3, 6), slice(6, 15), slice(15, 24)
_MASS, _VOL = slice(24, 25), slice(25, 26)
NC_STATE = 26


@pytree_dataclass
class SortedMpm:
    """Tile-slab-resident particle state (+ the tile maps of the last sort)."""

    slab: jnp.ndarray  # (NC_STATE, T_CAP * TS) channel-major state planes
    active: jnp.ndarray  # (A,) sorted active block ids (sentinel nblocks)
    counts: jnp.ndarray  # (A,) particles per active block
    tile_base: jnp.ndarray  # (A,) first tile of each active block
    a_of_tile: jnp.ndarray  # (T_CAP,) owning active-block slot per tile
    tile_count: jnp.ndarray  # (T_CAP,) valid rows per tile
    rowmap: jnp.ndarray  # (n,) canonical particle -> slab row
    dropped: jnp.ndarray  # () int32: capacity + staleness drops (last substep)


def _grid_blocks(config):
    nx, ny, nz = config.grid_size
    assert nx % 4 == ny % 4 == nz % 4 == 0, "grid dims must be multiples of 4"
    return nx // 4, ny // 4, nz // 4


def _block_id(config, base):
    nbx, nby, nbz = _grid_blocks(config)
    bxyz = base // 4
    return (bxyz[:, 0] * nby + bxyz[:, 1]) * nbz + bxyz[:, 2]


def tile_capacity(config, n: int) -> int:
    """Static tile count: every particle packed + <1 wasted tile per block."""
    return (n + TS - 1) // TS + config.max_active_blocks


def sort_to_tiles(config, state) -> SortedMpm:
    """Sort particles by block id and pack the slab (RebuildMapping role,
    cuda_mpm_solver.cu:18 — radix sort + compaction replaced by one XLA sort
    and cumsum-based run-length infrastructure; `jnp.unique`/`searchsorted`
    over the particle axis are avoided on purpose, they re-sort internally).
    """
    from drake_tpu.mpm import solver as mpm

    n = state.x.shape[0]
    dtype = state.x.dtype
    nbx, nby, nbz = _grid_blocks(config)
    nblocks = nbx * nby * nbz
    A = config.max_active_blocks
    T_CAP = tile_capacity(config, n)
    nx, ny, nz = config.grid_size

    base, _ = mpm._bspline_weights(state.x, config.dx)
    base = jnp.clip(base, 0, jnp.asarray([nx - 3, ny - 3, nz - 3]))
    bid = _block_id(config, base)

    idx = jnp.arange(n, dtype=jnp.int32)
    # Single-key sort when (bid, idx) packs into 31 bits, else two-operand.
    s_bits = max(1, (n - 1).bit_length())
    if (nblocks + 1) << s_bits <= 2**31:
        key = (bid << s_bits) | idx
        key_s = jax.lax.sort(key)
        bid_s = key_s >> s_bits
        perm = key_s & ((1 << s_bits) - 1)
    else:
        bid_s, perm = jax.lax.sort([bid, idx], num_keys=1)

    # Run-length infrastructure from one cumsum (blocks occupy consecutive
    # runs of the sorted array).
    flag = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (bid_s[1:] != bid_s[:-1]).astype(jnp.int32)]
    )
    a_of = jnp.cumsum(flag) - 1  # (n,) active slot per sorted particle
    over = a_of >= A  # active-block capacity overflow
    ids = jnp.where((flag == 1) & ~over, a_of, A)
    active = jnp.full((A + 1,), nblocks, jnp.int32).at[ids].set(
        bid_s.astype(jnp.int32), mode="drop"
    )[:-1]
    starts = jnp.full((A + 1,), n, jnp.int32).at[ids].set(idx, mode="drop")[:-1]
    counts = jnp.maximum(
        jnp.concatenate([starts[1:], jnp.asarray([n], jnp.int32)]) - starts, 0
    )
    ntiles = (counts + TS - 1) // TS
    tile_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(ntiles).astype(jnp.int32)[:-1]]
    )
    a_clamp = jnp.minimum(a_of, A - 1)
    rank = idx - starts[a_clamp]
    slot = tile_base[a_clamp] * TS + rank
    slot = jnp.where(over, T_CAP * TS, slot)  # drop bucket

    tidx = jnp.arange(T_CAP, dtype=jnp.int32)
    a_of_tile = jnp.clip(
        jnp.searchsorted(tile_base + ntiles, tidx, side="right"), 0, A - 1
    ).astype(jnp.int32)
    in_tile = (tidx >= tile_base[a_of_tile]) & (
        tidx < tile_base[a_of_tile] + ntiles[a_of_tile]
    )
    tile_count = jnp.where(
        in_tile,
        jnp.clip(counts[a_of_tile] - (tidx - tile_base[a_of_tile]) * TS, 0, TS),
        0,
    )

    payload = jnp.concatenate(
        [
            state.x, state.v,
            state.F.reshape(n, 9), state.C.reshape(n, 9),
            state.mass[:, None], state.volume[:, None],
        ],
        axis=1,
    )
    slab = jnp.zeros((T_CAP * TS + 1, NC_STATE), dtype).at[slot].set(
        payload[perm], mode="drop"
    )[:-1].T  # channel-major planes; one transpose per (amortized) sort
    rowmap = jnp.zeros((n,), jnp.int32).at[perm].set(slot)
    dropped = jnp.sum(over).astype(jnp.int32)
    return SortedMpm(
        slab=slab, active=active, counts=counts, tile_base=tile_base,
        a_of_tile=a_of_tile, tile_count=tile_count, rowmap=rowmap,
        dropped=dropped,
    )


def tiles_to_state(sorted_state: SortedMpm, template):
    """Gather the slab back to canonical particle order."""
    n = template.x.shape[0]
    got = sorted_state.slab[:, jnp.clip(sorted_state.rowmap, 0, None)].T
    # Particles in the drop bucket keep their previous state.
    ok = (sorted_state.rowmap < sorted_state.slab.shape[1])[:, None]
    pick = lambda sl, old: jnp.where(ok, got[:, sl], old.reshape(n, -1))
    return template.replace(
        x=pick(_X, template.x),
        v=pick(_V, template.v),
        F=pick(_F, template.F).reshape(n, 3, 3),
        C=pick(_C, template.C).reshape(n, 3, 3),
        dropped=sorted_state.dropped,
    )


# ---------------------------------------------------------------------------
# Plane-form 3x3 algebra: a batched 3x3 field is a list-of-lists of 1-D
# (nrows,) planes.  Trailing (…, 3, 3) tensors tile as (8, 128) on TPU — a
# 113x pad whenever one materializes — so the constitutive/advection math
# never builds them (measured ~4x on both stages vs solver's (…,3,3) form).
# ---------------------------------------------------------------------------


def _det3p(F):
    return (
        F[0][0] * (F[1][1] * F[2][2] - F[1][2] * F[2][1])
        - F[0][1] * (F[1][0] * F[2][2] - F[1][2] * F[2][0])
        + F[0][2] * (F[1][0] * F[2][1] - F[1][1] * F[2][0])
    )


def _inv3p(F, eps=1e-12):
    """Closed-form adjugate inverse (solver._inv3 on planes)."""
    c = [
        [
            F[1][1] * F[2][2] - F[1][2] * F[2][1],
            F[0][2] * F[2][1] - F[0][1] * F[2][2],
            F[0][1] * F[1][2] - F[0][2] * F[1][1],
        ],
        [
            F[1][2] * F[2][0] - F[1][0] * F[2][2],
            F[0][0] * F[2][2] - F[0][2] * F[2][0],
            F[0][2] * F[1][0] - F[0][0] * F[1][2],
        ],
        [
            F[1][0] * F[2][1] - F[1][1] * F[2][0],
            F[0][1] * F[2][0] - F[0][0] * F[2][1],
            F[0][0] * F[1][1] - F[0][1] * F[1][0],
        ],
    ]
    det = _det3p(F)
    d = det + jnp.where(det >= 0, eps, -eps)
    return [[c[i][j] / d for j in range(3)] for i in range(3)]


def _stress_ft_planes(F, mu, lam, polar_iters: int = 8):
    """A = P(F) F^T for fixed-corotated P, on planes (solver
    fixed_corotated_stress + the P @ F^T product, same Newton polar

    iteration count — parity within f32 roundoff)."""
    R = F
    for _ in range(polar_iters):
        Ri = _inv3p(R)
        R = [[0.5 * (R[i][j] + Ri[j][i]) for j in range(3)] for i in range(3)]
    J = _det3p(F)
    Fi = _inv3p(F)
    s = lam * (J - 1.0) * J
    P = [
        [2.0 * mu * (F[i][j] - R[i][j]) + s * Fi[j][i] for j in range(3)]
        for i in range(3)
    ]
    return [
        [
            P[i][0] * F[j][0] + P[i][1] * F[j][1] + P[i][2] * F[j][2]
            for j in range(3)
        ]
        for i in range(3)
    ]


# ---------------------------------------------------------------------------
# The resident substep: 8^3 windows over the sort-time blocks.
# ---------------------------------------------------------------------------


def _axis_factors8(lb8, w, tile_count):
    """Per-axis B-spline tap factors over the 8-node window.

    lb8: [3] list of (T, TS) window-local base planes (0..5 when fresh);
    w: [3][3] per-axis tap-weight planes (T, TS).  Returns Wx, Wy, Wz each
    (T, TS, 8) and the row-validity mask (T, TS).
    """
    T = lb8[0].shape[0]
    dtype = w[0][0].dtype
    rowv = jnp.arange(TS)
    valid = rowv[None, :] < tile_count[:, None]
    # Staleness guard: a particle whose base drifted beyond one cell of its
    # sort-time block would lose taps silently — zero it and count it.
    for axis in range(3):
        valid = valid & (lb8[axis] >= 0) & (lb8[axis] <= 5)
    i8 = jnp.arange(8, dtype=jnp.int32)

    def factor(axis):
        acc = jnp.zeros((T, TS, 8), dtype)
        for t in range(3):
            acc = acc + jnp.where(
                i8[None, None, :] == (lb8[axis] + t)[:, :, None],
                w[axis][t][:, :, None],
                0.0,
            )
        return acc

    return factor(0), factor(1), factor(2), valid


def _active_coords(config, active):
    nbx, nby, nbz = _grid_blocks(config)
    abz = active % nbz
    aby = (active // nbz) % nby
    abx = active // (nbz * nby)
    return abx, aby, abz


def _node_pos8(config, active, dtype):
    """Window-node world positions per axis: node l covers 4*ab + (l - 1)."""
    abx, aby, abz = _active_coords(config, active)
    l8 = jnp.arange(8, dtype=dtype) - 1.0
    dx = config.dx
    npx = (4 * abx[:, None].astype(dtype) + l8[None, :]) * dx
    npy = (4 * aby[:, None].astype(dtype) + l8[None, :]) * dx
    npz = (4 * abz[:, None].astype(dtype) + l8[None, :]) * dx
    return npx, npy, npz


def _neighbor_index(config, active):
    """(A, 27) indices INTO THE ACTIVE LIST of each block's 3^3 neighborhood
    (A where the neighbor block is inactive or out of domain — callers pad).
    active is sorted, so neighbors resolve with one searchsorted over A."""
    nbx, nby, nbz = _grid_blocks(config)
    nblocks = nbx * nby * nbz
    A = active.shape[0]
    abx, aby, abz = _active_coords(config, active)
    offs = []
    masks = []
    for dxb in (-1, 0, 1):
        for dyb in (-1, 0, 1):
            for dzb in (-1, 0, 1):
                offs.append((dxb * nby + dyb) * nbz + dzb)
                masks.append(
                    ((abx + dxb >= 0) & (abx + dxb < nbx))
                    & ((aby + dyb >= 0) & (aby + dyb < nby))
                    & ((abz + dzb >= 0) & (abz + dzb < nbz))
                )
    target = active[:, None] + jnp.asarray(offs, jnp.int32)[None, :]  # (A,27)
    found = jnp.clip(jnp.searchsorted(active, target), 0, A - 1)
    ok = (
        (active[found] == target)
        & jnp.stack(masks, axis=1)
        & (active < nblocks)[:, None]
    )
    return jnp.where(ok, found, A).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _overlap_masks():
    """(27, 512) validity masks + lane shifts for the roll-based overlap-add.

    Flat window-node index o = (ix*8 + iy)*8 + iz; neighbor delta's copy of
    node o lives at o - shift with shift = 4*(dx*64 + dy*8 + dz), valid where
    each axis index stays in [0, 8)."""
    import numpy as np

    o = np.arange(512)
    ix, iy, iz = o // 64, (o // 8) % 8, o % 8
    masks, shifts = [], []
    for dxb in (-1, 0, 1):
        for dyb in (-1, 0, 1):
            for dzb in (-1, 0, 1):
                m = (
                    (ix - 4 * dxb >= 0) & (ix - 4 * dxb < 8)
                    & (iy - 4 * dyb >= 0) & (iy - 4 * dyb < 8)
                    & (iz - 4 * dzb >= 0) & (iz - 4 * dzb < 8)
                )
                masks.append(m.astype(np.float32))
                shifts.append(4 * (dxb * 64 + dyb * 8 + dzb))
    return np.stack(masks), tuple(shifts)


def _window_overlap_add(vals_rows, nbr_idx):
    """Assemble per-active-block 8^3 node windows directly from the 27
    neighbors' P2G window contributions — no dense grid, no scatter.

    vals_rows: (A, ch, 512) with the flat node axis MINOR (512 = 4 lane
    tiles; small-minor-dim layouts pad each row to 128 lanes on TPU, which
    made the slice-based formulation ~20x slower).  nbr_idx: (A, 27)
    active-list neighbor indices (A = missing).  One flat row gather, then
    27 masked lane-rolls: window node o of block a equals node o - 4*delta
    of neighbor a + delta.
    """
    A, ch = vals_rows.shape[0], vals_rows.shape[1]
    dtype = vals_rows.dtype
    masks_np, shifts = _overlap_masks()
    masks = jnp.asarray(masks_np, dtype)
    vals_p = jnp.concatenate(
        [vals_rows, jnp.zeros((1, ch, 512), dtype)], axis=0
    )
    win = jnp.zeros((A, ch, 512), dtype)
    # Per-delta gather + masked lane-roll, accumulated in place.  (A prior
    # version gathered all 27 neighbors into one (A, 27, ch, 512) buffer —
    # 27x the window memory; under a K-vmapped CoupledWorld rollout that
    # buffer alone blew the 16 GB HBM at compile time.)
    for d in range(27):
        G_d = vals_p[nbr_idx[:, d]]  # (A, ch, 512)
        win = win + masks[d][None, None, :] * jnp.roll(
            G_d, shifts[d], axis=-1
        )
    return win


def halo_to_dense(config, active, vals):
    """Overlap-add the per-active-block windows into the DENSE node grid
    (nx, ny, nz, ch) — only needed by grid-op consumers (contact, coupling);
    the pure substep never materializes it."""
    nbx, nby, nbz = _grid_blocks(config)
    nblocks = nbx * nby * nbz
    ch = vals.shape[-1]
    abx, aby, abz = _active_coords(config, active)
    ax_map = {
        -1: (slice(0, 1), slice(3, 4)),
        0: (slice(1, 5), slice(0, 4)),
        1: (slice(5, 8), slice(0, 3)),
    }
    N = jnp.zeros((nblocks + 1, 4, 4, 4, ch), vals.dtype)
    for dxb in (-1, 0, 1):
        for dyb in (-1, 0, 1):
            for dzb in (-1, 0, 1):
                wsx, nsx = ax_map[dxb]
                wsy, nsy = ax_map[dyb]
                wsz, nsz = ax_map[dzb]
                piece = vals[:, wsx, wsy, wsz, :]
                tx, ty, tz = abx + dxb, aby + dyb, abz + dzb
                okm = (
                    (tx >= 0) & (tx < nbx)
                    & (ty >= 0) & (ty < nby)
                    & (tz >= 0) & (tz < nbz)
                    & (active < nblocks)
                )
                ids = jnp.where(okm, (tx * nby + ty) * nbz + tz, nblocks)
                pad = [(0, 0)] * 5
                pad[1] = (nsx.start, 4 - nsx.stop)
                pad[2] = (nsy.start, 4 - nsy.stop)
                pad[3] = (nsz.start, 4 - nsz.stop)
                N = N.at[ids].add(
                    jnp.pad(piece, pad), mode="drop", unique_indices=True
                )
    Nb = N[:-1].reshape(nbx, nby, nbz, 4, 4, 4, ch)
    return blocked_to_dense(config, Nb)


def dense_windows(config, active, G):
    """Gather per-active-block 8^3 windows from a dense (nx, ny, nz, ch)
    grid (the grid-op return path)."""
    Nf = dense_to_blocked(config, G)
    nbx, nby, nbz = _grid_blocks(config)
    nblocks = nbx * nby * nbz
    ch = G.shape[-1]
    Nf = Nf.reshape(nblocks, 64 * ch)
    nbr_idx27 = _dense_neighbor_ids(config, active)
    Np = jnp.concatenate([Nf, jnp.zeros((1, 64 * ch), G.dtype)], axis=0)
    A = active.shape[0]
    Gn = Np[nbr_idx27.reshape(-1)].reshape(A, 27, 4, 4, 4, ch)
    # window rows per axis: [d=-1 r=3 | d=0 r=0..3 | d=+1 r=0..2]
    def asm(c_m, c_0, c_p, axis):
        return jnp.concatenate(
            [
                jax.lax.slice_in_dim(c_m, 3, 4, axis=axis),
                c_0,
                jax.lax.slice_in_dim(c_p, 0, 3, axis=axis),
            ],
            axis=axis,
        )

    def pick(dxb, dyb, dzb):
        d = ((dxb + 1) * 3 + (dyb + 1)) * 3 + (dzb + 1)
        return Gn[:, d]

    zs = {}
    for dxb in (-1, 0, 1):
        for dyb in (-1, 0, 1):
            zs[(dxb, dyb)] = asm(
                pick(dxb, dyb, -1), pick(dxb, dyb, 0), pick(dxb, dyb, 1), 3
            )
    ys = {}
    for dxb in (-1, 0, 1):
        ys[dxb] = asm(zs[(dxb, -1)], zs[(dxb, 0)], zs[(dxb, 1)], 2)
    return asm(ys[-1], ys[0], ys[1], 1)


def _dense_neighbor_ids(config, active):
    """(A, 27) DENSE block ids of each active block's neighborhood
    (nblocks = out-of-range sentinel)."""
    nbx, nby, nbz = _grid_blocks(config)
    nblocks = nbx * nby * nbz
    abx, aby, abz = _active_coords(config, active)
    ids = []
    for dxb in (-1, 0, 1):
        for dyb in (-1, 0, 1):
            for dzb in (-1, 0, 1):
                tx, ty, tz = abx + dxb, aby + dyb, abz + dzb
                okm = (
                    (tx >= 0) & (tx < nbx)
                    & (ty >= 0) & (ty < nby)
                    & (tz >= 0) & (tz < nbz)
                    & (active < nblocks)
                )
                ids.append(
                    jnp.where(okm, (tx * nby + ty) * nbz + tz, nblocks)
                )
    return jnp.stack(ids, axis=1).astype(jnp.int32)


def _update_windows(config, active, win_mm):
    """Grid update applied per window node: momentum -> velocity, gravity,
    sticky walls (update_grid_kernel :633 role).  A grid node appears in up
    to 8 windows; the update is a pure per-node function, so computing it
    redundantly per window is correct and avoids any global grid pass.

    win_mm: (A, 4, 512) [mass, momentum] over flat window nodes; returns
    (A, 3, 512) velocities."""
    nx, ny, nz = config.grid_size
    dtype = win_mm.dtype
    abx, aby, abz = _active_coords(config, active)
    o = jnp.arange(512, dtype=jnp.int32)
    X = 4 * abx[:, None] + (o // 64)[None, :] - 1  # (A, 512)
    Y = 4 * aby[:, None] + ((o // 8) % 8)[None, :] - 1
    Z = 4 * abz[:, None] + (o % 8)[None, :] - 1
    w = config.wall_width
    inside = (
        (X >= w) & (X < nx - w)
        & (Y >= w) & (Y < ny - w)
        & (Z >= w) & (Z < nz - w)
    )
    m = win_mm[:, 0, :]
    inv_m = jnp.where(m > 0, 1.0 / jnp.maximum(m, 1e-12), 0.0)
    g = jnp.asarray(config.gravity, dtype)
    act = m > 0
    vel = [
        jnp.where(
            inside, win_mm[:, 1 + c, :] * inv_m + config.dt * g[c] * act, 0.0
        )
        for c in range(3)
    ]
    return jnp.stack(vel, axis=1)


def _update_dense(config, G):
    """Dense-grid version of the update (grid-op path).  G: (nx,ny,nz,4)."""
    nx, ny, nz = config.grid_size
    dtype = G.dtype
    m = G[..., 0]
    inv_m = jnp.where(m > 0, 1.0 / jnp.maximum(m, 1e-12), 0.0)
    g = jnp.asarray(config.gravity, dtype)
    w = config.wall_width
    X = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 0)
    Y = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 1)
    Z = jax.lax.broadcasted_iota(jnp.int32, (nx, ny, nz), 2)
    inside = (
        (X >= w) & (X < nx - w)
        & (Y >= w) & (Y < ny - w)
        & (Z >= w) & (Z < nz - w)
    )
    act = m > 0
    vel = [
        jnp.where(inside, G[..., 1 + c] * inv_m + config.dt * g[c] * act, 0.0)
        for c in range(3)
    ]
    return jnp.stack(vel, axis=-1)


def blocked_to_dense(config, N):
    """(nbx, nby, nbz, 4, 4, 4, c) -> (nx, ny, nz, c) for grid-op consumers."""
    nbx, nby, nbz = _grid_blocks(config)
    nx, ny, nz = config.grid_size
    c = N.shape[-1]
    return (
        N.transpose(0, 3, 1, 4, 2, 5, 6).reshape(nx, ny, nz, c)
    )


def dense_to_blocked(config, G):
    nbx, nby, nbz = _grid_blocks(config)
    c = G.shape[-1]
    return (
        G.reshape(nbx, 4, nby, 4, nbz, 4, c).transpose(0, 2, 4, 1, 3, 5, 6)
    )


class TransferCtx(NamedTuple):
    """Per-substep transfer context shared by P2G, G2P, and the implicit
    contact solve: state planes, factorized weights, and the P2G output."""

    x: list  # [3] (nrows,) position planes
    v: list  # [3]
    F: list  # [3][3]
    C: list  # [3][3]
    mass: jnp.ndarray
    vol: jnp.ndarray
    Wx: jnp.ndarray  # (T_CAP, TS, 8) x-axis tap factors
    W2: jnp.ndarray  # (T_CAP, TS, 64) (Wy Wz) factors, validity-masked
    vm: jnp.ndarray  # (T_CAP, TS) row-validity mask
    stale: jnp.ndarray  # () staleness count
    vals_rows: jnp.ndarray  # (A, 4, 512) P2G [mass, momentum] window rows
    npx: jnp.ndarray  # (A, 8) window-node world positions per axis
    npy: jnp.ndarray
    npz: jnp.ndarray


def p2g_field(ss: SortedMpm, Wx, W2, planes) -> jnp.ndarray:
    """Generic P2G: scatter per-particle channel planes to per-block window
    rows (A, c, 512) via the factorized contraction.  Pass squared factors
    (Wx**2, W2**2) for w_ip^2 transfers (Jacobi diagonals)."""
    T_CAP = Wx.shape[0]
    c = len(planes)
    A = ss.active.shape[0]
    dtype = planes[0].dtype
    V = jnp.stack(planes, axis=-1).reshape(T_CAP, TS, c)
    V1 = (Wx[:, :, :, None] * V[:, :, None, :]).reshape(T_CAP, TS, 8 * c)
    out = jnp.einsum("tpm,tpl->tml", V1, W2)  # (T_CAP, 8c, 64)
    blk = jnp.zeros((A, 8 * c, 64), dtype).at[ss.a_of_tile].add(out)
    return jnp.moveaxis(blk.reshape(A, 8, c, 64), 2, 1).reshape(A, c, 512)


def g2p_field(ss: SortedMpm, Wx, W2, win_rows) -> list:
    """Generic G2P: interpolate per-block window rows (A, c, 512) at the
    particles; returns c planes of (nrows,)."""
    A, c = win_rows.shape[0], win_rows.shape[1]
    T_CAP = Wx.shape[0]
    nrows = T_CAP * TS
    vel2 = (
        win_rows.reshape(A, c, 8, 64).transpose(0, 3, 2, 1).reshape(A, 64, 8 * c)
    )
    vel2_t = vel2.reshape(A, 64 * 8 * c)[ss.a_of_tile].reshape(-1, 64, 8 * c)
    Tt = jnp.einsum("tpl,tlc->tpc", W2, vel2_t)  # (T_CAP, TS, 8c)
    U = Tt.reshape(T_CAP, TS, 8, c) * Wx[:, :, :, None]
    g2p = U.sum(axis=2)  # (T_CAP, TS, c)
    return [g2p[:, :, k].reshape(nrows) for k in range(c)]


def transfer_ctx(
    config, ss: SortedMpm, particle_force: Optional[jnp.ndarray] = None
) -> TransferCtx:
    """Stage 1 of the substep: constitutive + APIC affine + factorized
    weights + the momentum P2G, all on channel planes."""
    dtype = ss.slab.dtype
    nrows = ss.slab.shape[1]
    T_CAP = nrows // TS
    dx, dt = config.dx, config.dt
    dxi2 = 4.0 / dx**2
    nx, ny, nz = config.grid_size

    # Channel planes, all 1-D (nrows,).
    pl_ = [ss.slab[c] for c in range(NC_STATE)]
    x = pl_[0:3]
    v = pl_[3:6]
    F = [[pl_[6 + 3 * i + j] for j in range(3)] for i in range(3)]
    C = [[pl_[15 + 3 * i + j] for j in range(3)] for i in range(3)]
    mass, vol = pl_[24], pl_[25]

    # Constitutive + APIC affine (cuda_mpm_kernels.cuh:485-489), on planes.
    mu, lam = config.lame
    PFt = _stress_ft_planes(F, mu, lam)
    s0 = -dt * dxi2
    affine = [
        [s0 * vol * PFt[i][j] + mass * C[i][j] for j in range(3)]
        for i in range(3)
    ]
    u0 = [
        mass * v[i]
        - (affine[i][0] * x[0] + affine[i][1] * x[1] + affine[i][2] * x[2])
        for i in range(3)
    ]
    if particle_force is not None:
        for i in range(3):
            u0[i] = u0[i] + dt * particle_force.reshape(nrows, 3)[:, i]

    # Quadratic B-spline taps per axis (solver._bspline_weights on planes).
    inv_dx = 1.0 / dx
    hi = (nx - 3, ny - 3, nz - 3)
    base, w = [], []
    for axis in range(3):
        pos = x[axis] * inv_dx
        b = jnp.clip(jnp.floor(pos - 0.5).astype(jnp.int32), 0, hi[axis])
        fx = pos - b.astype(dtype)
        w.append(
            [
                0.5 * (1.5 - fx) ** 2,
                0.75 - (fx - 1.0) ** 2,
                0.5 * (fx - 0.5) ** 2,
            ]
        )
        base.append(b)
    abx, aby, abz = _active_coords(config, ss.active)
    ab_t = [abc[ss.a_of_tile] for abc in (abx, aby, abz)]  # [3] x (T_CAP,)
    # Window-local base, 0..5 when within one cell of the sort-time block.
    lb8 = [
        base[axis].reshape(T_CAP, TS) - 4 * ab_t[axis][:, None] + 1
        for axis in range(3)
    ]
    w_t = [[w[axis][t].reshape(T_CAP, TS) for t in range(3)] for axis in range(3)]

    Wx, Wy, Wz, valid = _axis_factors8(lb8, w_t, ss.tile_count)
    stale = jnp.sum(
        (jnp.arange(TS)[None, :] < ss.tile_count[:, None]) & ~(
            (lb8[0] >= 0) & (lb8[0] <= 5)
            & (lb8[1] >= 0) & (lb8[1] <= 5)
            & (lb8[2] >= 0) & (lb8[2] <= 5)
        )
    ).astype(jnp.int32)
    vm = valid.astype(dtype)
    W2 = (Wy[:, :, :, None] * Wz[:, :, None, :]).reshape(T_CAP, TS, 64) * (
        vm[:, :, None]
    )

    # ---- P2G: batched factorized matmul, tiles segment-summed to blocks ----
    A = ss.active.shape[0]
    mp_rows = p2g_field(
        ss, Wx, W2,
        [mass, u0[0], u0[1], u0[2]]
        + [affine[i][j] for i in range(3) for j in range(3)],
    )  # (A, 13, 512): [mass, u0, affine]
    M_rows = mp_rows[:, 0:1, :]
    U_rows = mp_rows[:, 1:4, :]
    Bm = mp_rows[:, 4:13, :].reshape(A, 3, 3, 512)
    npx, npy, npz = _node_pos8(config, ss.active, dtype)
    o512 = jnp.arange(512)
    npos_x = npx[:, o512 // 64]  # (A, 512)
    npos_y = npy[:, (o512 // 8) % 8]
    npos_z = npz[:, o512 % 8]
    mom = (
        U_rows
        + Bm[:, :, 0, :] * npos_x[:, None, :]
        + Bm[:, :, 1, :] * npos_y[:, None, :]
        + Bm[:, :, 2, :] * npos_z[:, None, :]
    )  # (A, 3, 512)
    # Rows over flat window nodes o = i*64 + jk (keep the 512-node axis
    # MINOR — small minor dims hit TPU lane-padding, ~20x slowdowns).
    vals_rows = jnp.concatenate([M_rows, mom], axis=1)  # (A, 4, 512)
    return TransferCtx(
        x=x, v=v, F=F, C=C, mass=mass, vol=vol, Wx=Wx, W2=W2, vm=vm,
        stale=stale, vals_rows=vals_rows, npx=npx, npy=npy, npz=npz,
    )


def resident_substep(
    config,
    ss: SortedMpm,
    grid_op: Optional[Callable] = None,
    particle_force: Optional[jnp.ndarray] = None,
) -> SortedMpm:
    """One MLS-MPM substep on the tile-slab state (P2G -> grid -> G2P).

    grid_op, if given, maps (grid_vel (nx, ny, nz, 3), grid_mass (nx, ny,
    nz)) -> new grid_vel in DENSE layout — the hook used by grid-level
    contact (mpm/grid_contact.py) and rigid coupling.  particle_force, if
    given, is a (n_rows, 3) per-slab-row external force (cloth FEM).
    """
    A = ss.active.shape[0]
    ctx = transfer_ctx(config, ss, particle_force)
    vals_rows = ctx.vals_rows

    if grid_op is None:
        nbr_idx = _neighbor_index(config, ss.active)
        win_mm = _window_overlap_add(vals_rows, nbr_idx)  # (A, 4, 512)
        win_v = _update_windows(config, ss.active, win_mm)  # (A, 3, 512)
    else:
        vals = jnp.moveaxis(vals_rows, 1, -1).reshape(A, 8, 8, 8, 4)
        dense_mm = halo_to_dense(config, ss.active, vals)  # (nx, ny, nz, 4)
        dense_vel = _update_dense(config, dense_mm)
        dense_vel = grid_op(dense_vel, dense_mm[..., 0])
        win = dense_windows(config, ss.active, dense_vel)  # (A,8,8,8,3)
        win_v = jnp.moveaxis(win.reshape(A, 512, 3), 1, -1)
    return g2p_finish(config, ss, ctx, win_v)


def g2p_finish(config, ss: SortedMpm, ctx: TransferCtx, win_v) -> SortedMpm:
    """Stage 2 of the substep: G2P gather of the (post-update, post-contact)
    window velocities + the advection tail, all on channel planes."""
    A = ss.active.shape[0]
    nrows = ss.slab.shape[1]
    dt = config.dt
    dxi2 = 4.0 / config.dx**2
    x, v, F, C = ctx.x, ctx.v, ctx.F, ctx.C
    mass, vol = ctx.mass, ctx.vol
    npx, npy, npz = ctx.npx, ctx.npy, ctx.npz

    o512 = jnp.arange(512)
    npos_x = npx[:, o512 // 64]  # (A, 512)
    npos_y = npy[:, (o512 // 8) % 8]
    npos_z = npz[:, o512 % 8]
    vel_ext = jnp.concatenate(
        [
            win_v,
            win_v * npos_x[:, None, :],
            win_v * npos_y[:, None, :],
            win_v * npos_z[:, None, :],
        ],
        axis=1,
    )  # (A, 12, 512): channel (q, c) = q-th node-pos power, c-th velocity
    g = g2p_field(ss, ctx.Wx, ctx.W2, vel_ext)  # 12 planes

    # Advection tail on planes.  W2 already carries the validity mask, so
    # invalid/stale rows have g2p == 0; masked DELTAS (not selects) keep
    # their previous state: v += (v_new - v)*vm, C += (C_new - C)*vm, etc.
    vmf = ctx.vm.reshape(nrows)
    v_new = g[0:3]
    # g[3 + 3a + i] = sum_l w v_i n_a; C_new[i][j] = dxi2 (sum w v_i n_j
    # - v_i x_j).
    C_new = [
        [dxi2 * (g[3 + 3 * j + i] - v_new[i] * x[j]) for j in range(3)]
        for i in range(3)
    ]
    planes = (
        [x[i] + dt * v_new[i] * vmf for i in range(3)]
        + [v[i] + (v_new[i] - v[i]) * vmf for i in range(3)]
        + [
            F[i][j]
            + dt
            * (
                C_new[i][0] * F[0][j]
                + C_new[i][1] * F[1][j]
                + C_new[i][2] * F[2][j]
            )
            * vmf
            for i in range(3)
            for j in range(3)
        ]
        + [C[i][j] + (C_new[i][j] - C[i][j]) * vmf for i in range(3) for j in range(3)]
        + [mass, vol]
    )
    return ss.replace(
        slab=jnp.stack(planes, axis=0), dropped=ss.dropped + ctx.stale
    )


def tile_substep(config, state, grid_op=None):
    """One substep in canonical particle order (sort -> substep -> unsort).

    The drop-in tiled replacement for solver.mpm_substep; `simulate_tiled`
    amortizes the sort over `resort_every` substeps instead.
    """
    ss = sort_to_tiles(config, state)
    ss = resident_substep(config, ss, grid_op=grid_op)
    return tiles_to_state(ss, state)


def simulate_tiled(config, state, num_substeps: int, resort_every: int = 8):
    """Scan-compiled rollout with sort amortization.

    Correctness requires |v| * dt * resort_every < dx (one-cell drift
    tolerance of the 8^3 window); violations are counted in `dropped`, not
    silently absorbed.
    """
    groups = num_substeps // resort_every
    rem = num_substeps - groups * resort_every

    def group(st, _):
        ss = sort_to_tiles(config, st)

        def body(s, _):
            return resident_substep(config, s), None

        ss, _ = jax.lax.scan(body, ss, None, length=resort_every)
        out = tiles_to_state(ss, st)
        # Accumulate drop/staleness counts across groups (tiles_to_state
        # reports only the last group's).
        return out.replace(dropped=st.dropped + out.dropped), None

    state = state.replace(dropped=jnp.zeros((), jnp.int32))
    if groups:
        state, _ = jax.lax.scan(group, state, None, length=groups)
    for _ in range(rem):
        prev = state.dropped
        state = tile_substep(config, state)
        state = state.replace(dropped=prev + state.dropped)
    return state
