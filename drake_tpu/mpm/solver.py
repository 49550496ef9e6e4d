"""MLS-MPM: particle-grid transfers and grid dynamics, TPU-native.

Re-derivation of the fork's GPU MPM pipeline (reference: multibody/gpu_mpm/
cuda_mpm_solver.cu — RebuildMapping:18, ParticleToGrid:87 kernel :419,
UpdateGrid:108 kernel :633, GridToParticle:154 kernel :799) for XLA/TPU:

  - Dense background grid, default 128^3 with dx = 1/128 (the reference's
    settings.h:49,57 — a static shape, which is exactly what the TPU wants).
  - Quadratic B-spline weights; APIC/MLS-MPM transfers with
    B = -dt * 4/dx^2 * V0 * P F^T + m C  (cuda_mpm_kernels.cuh:485-489).
  - P2G scatter: XLA scatter-add (jnp .at[].add) over the 27-cell stencil —
    the sort/atomics machinery of the CUDA version (radix_sort.cuh,
    warp-segmented reductions) is replaced by the compiler's deterministic
    scatter; a Pallas binned-scatter kernel is the optimization path.
  - Grid update: pure vector op over the dense grid (momentum -> velocity,
    gravity, boundary conditions) — trivially TPU-friendly.
  - G2P gather + affine velocity reconstruction.

This file implements 3-D volumetric MLS-MPM with fixed-corotated elasticity
(the classic benchmark material); the codimensional cloth model of the fork
(cuda_mpm_kernels.cuh:184 calc_fem_state_and_force) layers on top in
drake_tpu.mpm.cloth.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from drake_tpu.utils.struct import pytree_dataclass, static_field


@dataclasses.dataclass(frozen=True)
class MpmConfig:
    """Mirror of the fork's MpmConfigParams + settings.h compile-time config."""

    grid_size: Tuple[int, int, int] = (64, 64, 64)
    dx: float = 1.0 / 64.0
    dt: float = 1e-4
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81)
    # Fixed-corotated material (settings.h cloth constants use E=4e5, nu=0.3).
    youngs_modulus: float = 4e5
    poisson_ratio: float = 0.3
    density: float = 1000.0
    # Domain-wall boundary: sticky walls this many cells thick (settings.h:56).
    wall_width: int = 3
    # Blocked-P2G static capacities (settings.h BLOCK_BITS=2 -> 4^3 blocks).
    # max_active_blocks caps the touched-block compaction (the
    # gather_touched_grid_kernel analog); block_capacity caps particles per
    # 4^3-cell block (512 = 64 cells * 8 particles/cell).  Overflow is
    # REPORTED in MpmState.dropped / GridState.dropped (count of particles
    # excluded from the transfer) — size with `capacities_for(num_particles)`
    # and assert dropped == 0 in tests.
    max_active_blocks: int = 256
    block_capacity: int = 512
    # Force pure-XLA lowering (scatter P2G, XLA grid update — no Pallas).
    # The Pallas kernels are batch-safe (vmap folds the batch into the
    # kernel grid via custom_vmap rules — see ops/mpm_kernels.py); this
    # flag remains as a debugging/CPU-parity escape hatch.
    xla_only: bool = False

    def capacities_for(self, num_particles: int, particles_per_cell: int = 8):
        """Config copy with capacities sized for `num_particles` (assumes
        near-dense seeding at `particles_per_cell`).

        block_capacity gets 25% headroom over the dense 64-cells-per-block
        count: the quadratic-B-spline base cell is floor(x/dx - 0.5), so
        particles in the lowest half-cell of a block scatter into the
        PREVIOUS block — dense seedings measure up to ~530 particles in a
        512-dense block (dropped-particle audit at 133k particles).

        max_active_blocks = 4x the dense occupied-block count (occupied
        = num_particles / (64 cells * particles_per_cell); the 4x covers
        base-cell shift spill plus irregular shapes).  The P2G block
        matmul + DMA cost is LINEAR in this capacity, so oversizing is
        pure slowdown: the round-2 profile at 133k particles measured
        190 ms/substep at A=8192 vs 63 ms at A=512 with zero dropped
        (benchmarks/profile_mpm.py)."""
        import dataclasses as _dc

        dense_blocks = num_particles // (64 * particles_per_cell)
        blocks_needed = max(64, 4 * dense_blocks)
        # Round up to a power of two for stable compile caching.
        a = 1
        while a < blocks_needed:
            a *= 2
        dense = 64 * particles_per_cell
        cap = ((dense + dense // 4 + 127) // 128) * 128
        return _dc.replace(
            self, max_active_blocks=min(a, 8192),
            block_capacity=max(cap, self.block_capacity),
        )

    @property
    def lame(self):
        E, nu = self.youngs_modulus, self.poisson_ratio
        mu = E / (2 * (1 + nu))
        lam = E * nu / ((1 + nu) * (1 - 2 * nu))
        return mu, lam


@pytree_dataclass
class MpmState:
    """Particle state (SoA, like GpuMpmState's particle buffers)."""

    x: jnp.ndarray  # (n, 3) positions
    v: jnp.ndarray  # (n, 3) velocities
    F: jnp.ndarray  # (n, 3, 3) deformation gradient
    C: jnp.ndarray  # (n, 3, 3) APIC affine velocity field
    volume: jnp.ndarray  # (n,) initial volume
    mass: jnp.ndarray  # (n,)
    # Number of particles dropped by the blocked path's static capacities
    # (max_active_blocks / block_capacity) in the LAST substep.  Zero means
    # no mass was lost; nonzero signals the capacities are undersized (the
    # "no silent caps" rule — SURVEY.md §5).  Scalar int32.
    dropped: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )


def make_particle_block(
    config: MpmConfig,
    lower: Tuple[float, float, float],
    upper: Tuple[float, float, float],
    particles_per_cell: int = 8,
    dtype=jnp.float32,
    jitter_seed: Optional[int] = 0,
) -> MpmState:
    """Fill an axis-aligned box with particles (the sample initializer)."""
    import numpy as np

    lower = np.asarray(lower)
    upper = np.asarray(upper)
    spacing = config.dx / round(particles_per_cell ** (1 / 3))
    axes = [np.arange(lo + spacing / 2, hi, spacing) for lo, hi in zip(lower, upper)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    if jitter_seed is not None:
        rng = np.random.default_rng(jitter_seed)
        pts = pts + rng.uniform(-0.2, 0.2, pts.shape) * spacing
    n = pts.shape[0]
    vol = spacing**3
    mass = config.density * vol
    eye = np.broadcast_to(np.eye(3), (n, 3, 3))
    return MpmState(
        x=jnp.asarray(pts, dtype),
        v=jnp.zeros((n, 3), dtype),
        F=jnp.asarray(eye, dtype),
        C=jnp.zeros((n, 3, 3), dtype),
        volume=jnp.full((n,), vol, dtype),
        mass=jnp.full((n,), mass, dtype),
    )


# ---------------------------------------------------------------------------
# Quadratic B-spline stencil.
# ---------------------------------------------------------------------------


def _bspline_weights(xp, dx):
    """Quadratic B-spline weights over the 3-cell stencil per axis.

    Returns (base (n,3) int32, w (n,3,3)): w[:, axis, k] is the weight of
    grid node base+k along `axis` (cuda_mpm_kernels.cuh:473-477 semantics).
    """
    inv_dx = 1.0 / dx
    pos = xp * inv_dx
    base = jnp.floor(pos - 0.5).astype(jnp.int32)
    fx = pos - base.astype(xp.dtype)  # in [0.5, 1.5]
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    w = jnp.stack([w0, w1, w2], axis=-1)  # (n, 3 axes, 3 taps)
    return base, w


def _stencil_iter():
    for i in range(3):
        for j in range(3):
            for k in range(3):
                yield i, j, k


# ---------------------------------------------------------------------------
# Constitutive model: fixed corotated (via Newton polar decomposition).
# ---------------------------------------------------------------------------


def _det3(A):
    """Closed-form 3x3 determinant (batched, elementwise — jnp.linalg.det
    lowers to LU on TPU and serializes over the batch)."""
    return (
        A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
        - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
        + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
    )


def _inv3(A, eps=1e-12):
    """Closed-form (adjugate) 3x3 inverse — ~50x faster than the batched LU
    path on TPU (18.6 ms -> sub-ms at 17k matrices)."""
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
    c02 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
    c10 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
    c12 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
    c20 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    c21 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
    c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    det = _det3(A)
    return adj / (det + jnp.where(det >= 0, eps, -eps))[..., None, None]


def _polar_rotation(F, iters: int = 8):
    """Rotation factor of F by Newton iteration R <- (R + R^-T)/2.

    Branch-free and batched — the TPU replacement for the CUDA Sifakis SVD
    (gpu_mpm/sifakis_svd.cuh) when only the rotation is needed.
    """

    def body(_, R):
        Rinv_T = _inv3(R).swapaxes(-1, -2)
        return 0.5 * (R + Rinv_T)

    return jax.lax.fori_loop(0, iters, body, F)


def fixed_corotated_stress(F, mu, lam):
    """First Piola-Kirchhoff stress P = 2 mu (F - R) + lam (J - 1) J F^-T."""
    R = _polar_rotation(F)
    J = _det3(F)
    F_inv_T = _inv3(F).swapaxes(-1, -2)
    return 2.0 * mu * (F - R) + (lam * (J - 1.0) * J)[..., None, None] * F_inv_T


# ---------------------------------------------------------------------------
# The MLS-MPM substep.
# ---------------------------------------------------------------------------


class GridState(NamedTuple):
    mass: jnp.ndarray  # (nx, ny, nz)
    momentum: jnp.ndarray  # (nx, ny, nz, 3)
    # Particles dropped by static block capacities this transfer (scalar
    # int32; 0 on the scatter path).
    dropped: jnp.ndarray = 0


def particle_to_grid(config: MpmConfig, state: MpmState) -> GridState:
    """APIC P2G with the MLS-MPM fused force.

    Backend dispatch: on TPU the blocked matmul formulation (XLA scatter-add
    serializes there); on CPU the direct scatter (fast, no padding waste).
    """
    if config.xla_only or jax.default_backend() == "cpu":
        return particle_to_grid_scatter(config, state)
    return particle_to_grid_blocked(config, state)


def _p2g_affine(config: MpmConfig, state: MpmState):
    """Fused APIC+stress affine matrix B = -dt 4/dx^2 V0 P F^T + m C
    (cuda_mpm_kernels.cuh:485-489)."""
    mu, lam = config.lame
    P = fixed_corotated_stress(state.F, mu, lam)
    stress_B = (-config.dt * 4.0 / config.dx**2) * state.volume[:, None, None] * (
        P @ state.F.swapaxes(-1, -2)
    )
    return stress_B + state.mass[:, None, None] * state.C


def particle_to_grid_blocked(config: MpmConfig, state: MpmState) -> GridState:
    """Scatter-free P2G: sort by 4^3-cell block, compact active blocks, do a
    dense (216 x P) x (P x 13) matmul per block on the MXU, then combine
    block halos with static shifts.

    This is the TPU re-design of the CUDA pipeline's sort + touched-block
    compaction + atomic scatter (RebuildMapping cuda_mpm_solver.cu:18,
    gather_touched_grid_kernel :546, particle_to_grid_kernel :419): XLA's
    scatter-add serializes conflicting updates (~170 ms/substep at 17k
    particles); the blocked matmul form runs in ~1 ms.

    Static capacities: config.max_active_blocks touched blocks and
    config.block_capacity particles per block; overflow is DROPPED (size for
    your scene; defaults fit 8-per-cell seeding exactly).
    """
    from drake_tpu.ops import mpm_kernels

    dx = config.dx
    dtype = state.x.dtype
    n = state.x.shape[0]
    nx, ny, nz = config.grid_size
    assert nx % 4 == ny % 4 == nz % 4 == 0, "grid dims must be multiples of 4"
    nbx, nby, nbz = nx // 4, ny // 4, nz // 4
    nblocks = nbx * nby * nbz
    A = config.max_active_blocks
    PMAX = config.block_capacity

    affine = _p2g_affine(config, state)
    base, w = _bspline_weights(state.x, dx)  # base: (n,3) int, w: (n,3,3)
    base = jnp.clip(base, 0, jnp.asarray([nx - 3, ny - 3, nz - 3]))
    # u = m v + B(x_node - x_p) split into  u0 = m v - B x_p  and  +B x_node.
    u0 = state.mass[:, None] * state.v - jnp.einsum(
        "nij,nj->ni", affine, state.x
    )

    bxyz = base // 4  # block coords per particle
    bid = (bxyz[:, 0] * nby + bxyz[:, 1]) * nbz + bxyz[:, 2]
    lb_local = (base - 4 * bxyz).astype(jnp.int32)  # 0..3, block-independent

    # RebuildMapping, TPU style (CUDA radix-sort role): pack all per-particle
    # columns into one 128-lane row, sort (key, index) pairs (a 2-operand
    # bitonic sort — a wide multi-operand sort explodes compile time), and
    # apply the permutation with a single row gather (measured ~1.6 ms at
    # 18k x 128 — row-major permutation gathers are fast; it is scatters and
    # small-row table gathers that serialize).
    packed = jnp.zeros((n, 128), dtype)
    packed = packed.at[:, 0:1].set(state.mass[:, None])
    packed = packed.at[:, 1:4].set(u0)
    packed = packed.at[:, 4:13].set(affine.reshape(n, 9))
    packed = packed.at[:, 16:25].set(w.reshape(n, 9))
    packed = packed.at[:, 25:28].set(lb_local.astype(dtype))

    # Pad so the DMA window (PMAX + 8 rows, see mpm_kernels.align_window)
    # always fits and n_pad stays 8-aligned (batch folding relies on it).
    pad_rows = PMAX + 8 + (-n) % 8
    n_pad = n + pad_rows
    bid_p = jnp.concatenate([bid, jnp.full((pad_rows,), nblocks, bid.dtype)])
    idx_p = jnp.arange(n_pad, dtype=jnp.int32)
    bid_s, perm = jax.lax.sort([bid_p, idx_p], num_keys=1)
    packed_p = jnp.concatenate([packed, jnp.zeros((pad_rows, 128), dtype)])
    packed_s = packed_p[perm]

    active = jnp.unique(bid_s[:n], size=A, fill_value=nblocks)  # sorted (A,)
    starts = jnp.searchsorted(bid_s, active, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(bid_s, active, side="right")
    counts = jnp.minimum(ends - starts, PMAX).astype(jnp.int32)
    # Zero the counts of `unique` fill entries (repeated nblocks sentinel):
    # searchsorted otherwise credits them with the padding rows.
    counts = jnp.where(active < nblocks, counts, 0)
    # Capacity-overflow accounting ("no silent caps"): particles beyond
    # block_capacity or outside the first max_active_blocks blocks.
    dropped = (n - jnp.sum(counts)).astype(jnp.int32)

    out = mpm_kernels.p2g_block_matmul_packed(
        packed_s, starts, counts, PMAX
    )  # (A, 16, 216)
    M_blk = out[:, 0, :]
    U_blk = jnp.moveaxis(out[:, 1:4, :], 1, 2)  # (A, 216, 3)
    C_blk = jnp.moveaxis(out[:, 4:13, :], 1, 2).reshape(A, 216, 3, 3)

    # Active block integer coords.
    abz = active % nbz
    aby = (active // nbz) % nby
    abx = active // (nbz * nby)
    ablock = jnp.stack([abx, aby, abz], axis=1)  # (A, 3)
    l_range = jnp.arange(6)

    # Node positions: x_node = (4*ablock + l) * dx.
    ll = jnp.stack(
        jnp.meshgrid(l_range, l_range, l_range, indexing="ij"), axis=-1
    ).reshape(216, 3)
    node_pos = (4 * ablock[:, None, :] + ll[None, :, :]).astype(dtype) * dx
    mom_blk = U_blk + jnp.einsum("alij,alj->ali", C_blk, node_pos)

    # Dense per-block tensors (unique block ids -> cheap scatter).
    T = jnp.zeros((nblocks + 1, 216, 4), dtype)
    T = T.at[jnp.minimum(active, nblocks)].add(
        jnp.concatenate([M_blk[..., None], mom_blk], axis=-1),
        mode="drop",
        unique_indices=False,
    )[:-1]
    T = T.reshape(nbx, nby, nbz, 6, 6, 6, 4)

    # Halo combine, one axis at a time: grid index X = 4b + l, l in 0..5.
    def combine(Tax, block_axis, local_axis, nb):
        core = jnp.moveaxis(Tax, (block_axis, local_axis), (0, 1))
        out_shape = (nb * 4,) + core.shape[2:]
        res = core[:, 0:4].reshape(out_shape)
        # l = 4 contributes to X = 4b + 4 = 4(b+1): rows 4, 8, ..., 4(nb-1)
        res = res.at[4::4].add(core[:-1, 4])
        # l = 5 contributes to X = 4b + 5 = 4(b+1) + 1: rows 5, 9, ...
        res = res.at[5::4].add(core[:-1, 5])
        return jnp.moveaxis(res, 0, block_axis)

    # After each combine the handled (block, local) axis pair becomes one grid
    # axis; process x, then y, then z.
    Tx = combine(T, 0, 3, nbx)  # (nx, nby, nbz, 6, 6, 4)
    Ty = combine(Tx, 1, 3, nby)  # (nx, ny, nbz, 6, 4)
    Tz = combine(Ty, 2, 3, nbz)  # (nx, ny, nz, 4)
    return GridState(mass=Tz[..., 0], momentum=Tz[..., 1:], dropped=dropped)


def particle_to_grid_scatter(config: MpmConfig, state: MpmState) -> GridState:
    """Direct scatter-add P2G (reference implementation; slow on TPU)."""
    dx, dt = config.dx, config.dt
    mu, lam = config.lame
    n = state.x.shape[0]
    dtype = state.x.dtype
    nx, ny, nz = config.grid_size

    P = fixed_corotated_stress(state.F, mu, lam)
    stress_B = (-dt * 4.0 / dx**2) * state.volume[:, None, None] * (
        P @ state.F.swapaxes(-1, -2)
    )
    affine = stress_B + state.mass[:, None, None] * state.C

    base, w = _bspline_weights(state.x, dx)
    # Vectorized 27-tap stencil: one fused scatter-add instead of 27
    # (XLA's scatter sorts indices once; 27 separate calls sort 27 times).
    offsets = jnp.asarray(
        [[i, j, k] for i, j, k in _stencil_iter()], jnp.int32
    )  # (27, 3)
    idx = base[:, None, :] + offsets[None, :, :]  # (n, 27, 3)
    weight = (
        w[:, 0, offsets[:, 0]] * w[:, 1, offsets[:, 1]] * w[:, 2, offsets[:, 2]]
    )  # (n, 27)
    dpos = (idx.astype(dtype) - state.x[:, None, :] / dx) * dx  # (n, 27, 3)
    mom = weight[..., None] * (
        (state.mass[:, None] * state.v)[:, None, :]
        + jnp.einsum("nij,ntj->nti", affine, dpos)
    )  # (n, 27, 3)
    m_scatter = weight * state.mass[:, None]  # (n, 27)

    flat = (idx[..., 0] * ny + idx[..., 1]) * nz + idx[..., 2]  # (n, 27)
    in_bounds = (
        (idx[..., 0] >= 0) & (idx[..., 0] < nx)
        & (idx[..., 1] >= 0) & (idx[..., 1] < ny)
        & (idx[..., 2] >= 0) & (idx[..., 2] < nz)
    )
    flat = jnp.where(in_bounds, flat, nx * ny * nz)  # dropped bucket
    flat = flat.reshape(-1)
    grid_m = (
        jnp.zeros((nx * ny * nz + 1,), dtype)
        .at[flat]
        .add(m_scatter.reshape(-1), mode="drop")[:-1]
        .reshape(nx, ny, nz)
    )
    grid_p = (
        jnp.zeros((nx * ny * nz + 1, 3), dtype)
        .at[flat]
        .add(mom.reshape(-1, 3), mode="drop")[:-1]
        .reshape(nx, ny, nz, 3)
    )
    return GridState(mass=grid_m, momentum=grid_p)


def update_grid(config: MpmConfig, grid: GridState) -> jnp.ndarray:
    """Momentum -> velocity, gravity (active nodes), domain-wall BCs.

    The pure dense-vector op of the pipeline (update_grid_kernel :633):
    sticky walls `wall_width` cells thick on all six faces (mpm_bc analog).
    Dispatches to the Pallas TPU kernel (drake_tpu.ops.mpm_kernels) on TPU —
    measured 2.6x over the XLA lowering at 128^3.
    Returns grid velocities (nx, ny, nz, 3).
    """
    from drake_tpu.ops import mpm_kernels

    mom = jnp.moveaxis(grid.momentum, -1, 0)  # (3, nx, ny, nz)
    vel = mpm_kernels.update_grid(
        grid.mass, mom, config.dt, config.gravity, config.wall_width,
        use_pallas=False if config.xla_only else None,
    )
    return jnp.moveaxis(vel, 0, -1)


def grid_to_particle(
    config: MpmConfig, state: MpmState, grid_vel: jnp.ndarray
) -> MpmState:
    """G2P gather: new particle velocity, APIC C, F update, advection.

    (grid_to_particle_kernel :799): C = 4/dx^2 sum_i w_i v_i dpos_i^T,
    F <- (I + dt C) F, x <- x + dt v.
    """
    dx, dt = config.dx, config.dt
    dtype = state.x.dtype
    nx, ny, nz = config.grid_size
    base, w = _bspline_weights(state.x, dx)

    v_new = jnp.zeros_like(state.v)
    C_new = jnp.zeros_like(state.C)
    hi = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)
    for i, j, k in _stencil_iter():
        offset = jnp.asarray([i, j, k], jnp.int32)
        idx = base + offset
        # Mask out-of-domain taps instead of letting JAX's negative-index
        # gather wrap to the opposite grid face (matches the scatter P2G,
        # which drops them); the gather itself uses clamped indices.
        valid = jnp.all((idx >= 0) & (idx <= hi), axis=-1)
        idx_c = jnp.clip(idx, 0, hi)
        weight = w[:, 0, i] * w[:, 1, j] * w[:, 2, k] * valid.astype(dtype)
        dpos = (idx.astype(dtype) - state.x / dx) * dx
        vi = grid_vel[idx_c[:, 0], idx_c[:, 1], idx_c[:, 2]]
        v_new = v_new + weight[:, None] * vi
        C_new = C_new + (4.0 / dx**2) * weight[:, None, None] * (
            vi[:, :, None] * dpos[:, None, :]
        )

    F_new = (jnp.eye(3, dtype=dtype) + dt * C_new) @ state.F
    x_new = state.x + dt * v_new
    return state.replace(x=x_new, v=v_new, F=F_new, C=C_new)


def block_windows(grid_field, nbx, nby, nbz):
    """Extract all 6^3 block windows by pure strided slicing (no gathers).

    grid_field: (nx, ny, nz, c) -> (nblocks, 216, c) where row (b, l) is
    grid[4bx+lx, 4by+ly, 4bz+lz].  Strided slices grid[l::4] give T[b, l]
    for each local offset — the gather-free inverse of the P2G halo combine.
    """
    c = grid_field.shape[-1]
    padded = jnp.pad(grid_field, ((0, 8), (0, 8), (0, 8), (0, 0)))

    def axis_stack(f, nb, axis):
        # returns shape (..., nb, 6, ...) stacked along a new local axis
        slices = [
            jax.lax.slice_in_dim(f, l, l + 4 * nb, stride=4, axis=axis)
            for l in range(6)
        ]
        return jnp.stack(slices, axis=axis + 1)

    T = axis_stack(padded, nbx, 0)  # (nbx, 6, ny+8, nz+8, c)
    T = axis_stack(T, nby, 2)  # (nbx, 6, nby, 6, nz+8, c)
    T = axis_stack(T, nbz, 4)  # (nbx, 6, nby, 6, nbz, 6, c)
    T = jnp.transpose(T, (0, 2, 4, 1, 3, 5, 6))
    return T.reshape(nbx * nby * nbz, 216, c)


def mpm_substep(config: MpmConfig, state: MpmState) -> MpmState:
    """One explicit MLS-MPM substep: P2G -> grid update -> G2P.

    On TPU the P2G stage uses the blocked Pallas kernel; G2P currently uses
    the stencil-gather formulation (the fully fused `mpm_substep_blocked`
    with the G2P Pallas kernel is pending on-hardware validation)."""
    grid = particle_to_grid(config, state)
    grid_vel = update_grid(config, grid)
    out = grid_to_particle(config, state, grid_vel)
    return out.replace(dropped=jnp.asarray(grid.dropped, jnp.int32))


def mpm_substep_blocked(config: MpmConfig, state: MpmState) -> MpmState:
    """Fused blocked substep: ONE sort shared by P2G and G2P, grid windows by
    strided slicing, G2P as batched (PMAX x 216) x (216 x 12) matmuls.

    The full TPU pipeline: pack -> sort -> blocked P2G (Pallas DMA+MXU) ->
    Pallas grid update -> blocked G2P (XLA einsum) -> unsort (second sort).
    """
    from drake_tpu.ops import mpm_kernels

    dx, dt = config.dx, config.dt
    dtype = state.x.dtype
    n = state.x.shape[0]
    nx, ny, nz = config.grid_size
    nbx, nby, nbz = nx // 4, ny // 4, nz // 4
    nblocks = nbx * nby * nbz
    A = config.max_active_blocks
    PMAX = config.block_capacity

    affine = _p2g_affine(config, state)
    base, w = _bspline_weights(state.x, dx)
    base = jnp.clip(base, 0, jnp.asarray([nx - 3, ny - 3, nz - 3]))
    u0 = state.mass[:, None] * state.v - jnp.einsum(
        "nij,nj->ni", affine, state.x
    )
    bxyz = base // 4
    bid = (bxyz[:, 0] * nby + bxyz[:, 1]) * nbz + bxyz[:, 2]
    lb_local = (base - 4 * bxyz).astype(jnp.int32)

    packed = jnp.zeros((n, 128), dtype)
    packed = packed.at[:, 0:1].set(state.mass[:, None])
    packed = packed.at[:, 1:4].set(u0)
    packed = packed.at[:, 4:13].set(affine.reshape(n, 9))
    packed = packed.at[:, 16:25].set(w.reshape(n, 9))
    packed = packed.at[:, 25:28].set(lb_local.astype(dtype))
    packed = packed.at[:, 28:31].set(state.x)
    packed = packed.at[:, 31:40].set(state.F.reshape(n, 9))

    pad_rows = PMAX + 8 + (-n) % 8
    n_pad = n + pad_rows
    bid_p = jnp.concatenate([bid, jnp.full((pad_rows,), nblocks, bid.dtype)])
    idx_p = jnp.arange(n_pad, dtype=jnp.int32)
    bid_s, perm = jax.lax.sort([bid_p, idx_p], num_keys=1)
    packed_s = jnp.concatenate([packed, jnp.zeros((pad_rows, 128), dtype)])[perm]

    active = jnp.unique(bid_s[:n], size=A, fill_value=nblocks)
    starts = jnp.searchsorted(bid_s, active, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(bid_s, active, side="right")
    counts = jnp.minimum(ends - starts, PMAX).astype(jnp.int32)
    # Zero the counts of `unique` fill entries (repeated nblocks sentinel):
    # searchsorted otherwise credits them with the padding rows.
    counts = jnp.where(active < nblocks, counts, 0)
    dropped = (n - jnp.sum(counts)).astype(jnp.int32)

    # ---- P2G (Pallas kernel) + halo combine --------------------------------
    out = mpm_kernels.p2g_block_matmul_packed(packed_s, starts, counts, PMAX)
    M_blk = out[:, 0, :]
    U_blk = jnp.moveaxis(out[:, 1:4, :], 1, 2)
    C_blk = jnp.moveaxis(out[:, 4:13, :], 1, 2).reshape(A, 216, 3, 3)
    abz = active % nbz
    aby = (active // nbz) % nby
    abx = active // (nbz * nby)
    ablock = jnp.stack([abx, aby, abz], axis=1)
    l_range = jnp.arange(6)
    ll = jnp.stack(
        jnp.meshgrid(l_range, l_range, l_range, indexing="ij"), axis=-1
    ).reshape(216, 3)
    node_pos = (4 * ablock[:, None, :] + ll[None, :, :]).astype(dtype) * dx
    mom_blk = U_blk + jnp.einsum("alij,alj->ali", C_blk, node_pos)
    T = jnp.zeros((nblocks + 1, 216, 4), dtype)
    T = T.at[jnp.minimum(active, nblocks)].add(
        jnp.concatenate([M_blk[..., None], mom_blk], axis=-1), mode="drop"
    )[:-1]
    T = T.reshape(nbx, nby, nbz, 6, 6, 6, 4)

    def combine(Tax, block_axis, local_axis, nb):
        core = jnp.moveaxis(Tax, (block_axis, local_axis), (0, 1))
        res = core[:, 0:4].reshape((nb * 4,) + core.shape[2:])
        res = res.at[4::4].add(core[:-1, 4])
        res = res.at[5::4].add(core[:-1, 5])
        return jnp.moveaxis(res, 0, block_axis)

    Tx = combine(T, 0, 3, nbx)
    Ty = combine(Tx, 1, 3, nby)
    Tz = combine(Ty, 2, 3, nbz)
    grid = GridState(mass=Tz[..., 0], momentum=Tz[..., 1:])

    # ---- Grid update (Pallas) ---------------------------------------------
    grid_vel = update_grid(config, grid)  # (nx, ny, nz, 3)

    # ---- Blocked G2P (Pallas kernel) ---------------------------------------
    # Windows for the active blocks only (row gather of A rows), extended
    # with v*node channels so the kernel's single MXU contraction yields
    # both v_p and sum_l w v n^T.
    win_all = block_windows(grid_vel, nbx, nby, nbz)  # (nblocks, 216, 3)
    win = jnp.concatenate(
        [win_all, jnp.zeros((1, 216, 3), dtype)], axis=0
    )[jnp.minimum(active, nblocks)]  # (A, 216, 3)
    vel_ext = jnp.concatenate(
        [
            win,
            win * node_pos[..., 0:1],
            win * node_pos[..., 1:2],
            win * node_pos[..., 2:3],
        ],
        axis=-1,
    )  # (A, 216, 12)
    starts_al, offs, counts_c = mpm_kernels.align_starts(
        starts, counts, n_pad, PMAX
    )
    win = mpm_kernels.align_window(PMAX)
    out_p = mpm_kernels.g2p_block_matmul_packed(
        packed_s, vel_ext, starts_al, offs, counts_c, PMAX, 4.0 / dx**2, dt
    )  # (A, win, 128): x_new, v_new, F_new, C_new

    # ---- Unsort back to original particle order ----------------------------
    # Particle i sits at sorted row p = invperm[i], i.e. slot p -
    # starts_al[a] of its block's kernel output.  A cheap second (n_pad)
    # sort + one n-row gather — not an (A*win)-row sort.  Particles
    # dropped by the static A/PMAX capacities keep their old state.
    invperm = jax.lax.sort(
        [perm, jnp.arange(n_pad, dtype=jnp.int32)], num_keys=1
    )[1]
    a_i = jnp.searchsorted(active, bid).astype(jnp.int32)  # (n,)
    a_c = jnp.clip(a_i, 0, A - 1)
    slot = invperm[:n] - starts_al[a_c]
    covered = (
        (a_i < A)
        & (active[a_c] == bid)
        & (slot >= offs[a_c])
        & (slot < offs[a_c] + counts_c[a_c])
    )
    row = a_c * win + jnp.clip(slot, 0, win - 1)
    got = out_p.reshape(A * win, 128)[row]  # n-row gather, 128 lanes
    cov = covered[:, None]
    return state.replace(
        x=jnp.where(cov, got[:, 0:3], state.x),
        v=jnp.where(cov, got[:, 3:6], state.v),
        F=jnp.where(cov[..., None], got[:, 6:15].reshape(n, 3, 3), state.F),
        C=jnp.where(cov[..., None], got[:, 15:24].reshape(n, 3, 3), state.C),
        dropped=dropped,
    )


def simulate(config: MpmConfig, state: MpmState, num_substeps: int) -> MpmState:
    """Scan-compiled rollout of substeps (the CalcAbstractStates loop role,
    deformable_driver.h:240-260, minus rigid coupling)."""

    def body(s, _):
        return mpm_substep(config, s), None

    out, _ = jax.lax.scan(body, state, None, length=num_substeps)
    return out
