"""Pallas TPU kernels for the MPM hot loop.

The CUDA reference hand-schedules 18 kernels (reference: gpu_mpm/
cuda_mpm_kernels.cuh — warp-segmented reductions, radix sort, atomics).  On
TPU most of that machinery is unnecessary: XLA already fuses the dense grid
ops, and scatter/gather lower to deterministic combiners.  Pallas is for the
cases where we beat XLA's schedule; this module starts with the dense grid
update (update_grid_kernel :633 role) — the memory-bound stage where
explicit VMEM blocking guarantees one HBM round trip — and is the template
for the binned P2G scatter kernel.

Layout note: the grid is kept as (3, nx, ny, nz) with the (ny, nz) plane as
the (sublane, lane) tile — nz should be a multiple of 128 for perfect tiling
(the reference's 128^3 default satisfies this).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:  # Pallas is TPU/GPU-only; keep CPU tests importable.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def update_grid_reference(mass, momentum, dt, gravity, wall_width):
    """Pure-XLA reference (identical math to mpm.solver.update_grid).

    mass: (nx, ny, nz); momentum: (3, nx, ny, nz).  Returns vel like momentum.
    """
    g = jnp.asarray(gravity, momentum.dtype)
    m = mass[None]
    active = m > 0
    vel = jnp.where(active, momentum / jnp.maximum(m, 1e-12), 0.0)
    vel = vel + dt * g[:, None, None, None] * active
    w = wall_width
    _, nx, ny, nz = momentum.shape
    ii = jnp.arange(nx)[:, None, None]
    jj = jnp.arange(ny)[None, :, None]
    kk = jnp.arange(nz)[None, None, :]
    inside = (
        (ii >= w) & (ii < nx - w)
        & (jj >= w) & (jj < ny - w)
        & (kk >= w) & (kk < nz - w)
    )
    return jnp.where(inside[None], vel, 0.0)


if _HAS_PALLAS:

    def _update_grid_kernel(
        mass_ref, mom_ref, vel_ref, *, dt, gravity, wall_width, nx, ny, nz
    ):
        # nx is the LOGICAL x extent: under a folded batch the grid runs
        # B*nx slabs and the wall test uses the within-sample coordinate.
        i = pl.program_id(0) % nx
        m = mass_ref[0]  # (ny, nz)
        inv_m = jnp.where(m > 0, 1.0 / jnp.maximum(m, 1e-12), 0.0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1)
        w = wall_width
        inside_yz = (jj >= w) & (jj < ny - w) & (kk >= w) & (kk < nz - w)
        inside_x = jnp.logical_and(i >= w, i < nx - w)
        mask = jnp.logical_and(inside_yz, inside_x)
        for c in range(3):
            v = mom_ref[c, 0] * inv_m + dt * gravity[c] * (m > 0)
            vel_ref[c, 0] = jnp.where(mask, v, 0.0)

    def _update_grid_pallas_call(mass, momentum, dt, gravity, wall_width, nx):
        _, nx_total, ny, nz = momentum.shape
        kernel = functools.partial(
            _update_grid_kernel,
            dt=dt,
            gravity=tuple(float(g) for g in gravity),
            wall_width=int(wall_width),
            nx=nx, ny=ny, nz=nz,
        )
        return pl.pallas_call(
            kernel,
            grid=(nx_total,),
            in_specs=[
                pl.BlockSpec((1, ny, nz), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 1, ny, nz), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, 1, ny, nz), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(momentum.shape, momentum.dtype),
        )(mass, momentum)

    @functools.lru_cache(maxsize=None)
    def _update_grid_vmapsafe(dt, gravity, wall_width, nx):
        """Batch-safe grid update: a vmapped batch folds into the x-slab
        grid axis (one launch of B*nx slabs) instead of going through the
        stock pallas batching rule."""

        @jax.custom_batching.custom_vmap
        def call(mass, momentum):
            return _update_grid_pallas_call(
                mass, momentum, dt, gravity, wall_width, nx
            )

        @call.def_vmap
        def rule(axis_size, in_batched, mass, momentum):
            mass, momentum = _broadcast_unbatched(
                axis_size, (mass, momentum), in_batched
            )
            B, nx_, ny, nz = mass.shape
            mom = jnp.moveaxis(momentum, 1, 0).reshape(3, B * nx_, ny, nz)
            vel = call(mass.reshape(B * nx_, ny, nz), mom)
            return (
                jnp.moveaxis(vel.reshape(3, B, nx_, ny, nz), 0, 1),
                True,
            )

        return call

    def update_grid_pallas(mass, momentum, dt, gravity, wall_width):
        """Blocked Pallas grid update: one x-slab per program."""
        nx = mass.shape[0]
        return _update_grid_vmapsafe(
            float(dt),
            tuple(float(g) for g in gravity),
            int(wall_width),
            int(nx),
        )(mass, momentum)

else:  # pragma: no cover

    def update_grid_pallas(mass, momentum, dt, gravity, wall_width):
        raise RuntimeError("Pallas unavailable on this backend")


def update_grid(mass, momentum, dt, gravity, wall_width, use_pallas=None):
    """Dispatcher: Pallas on TPU, XLA reference elsewhere."""
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and jax.default_backend() not in ("cpu",)
    if use_pallas:
        return update_grid_pallas(mass, momentum, dt, gravity, wall_width)
    return update_grid_reference(mass, momentum, dt, gravity, wall_width)


# ---------------------------------------------------------------------------
# Blocked P2G: per-active-block contiguous DMA + MXU matmul.
#
# XLA row gathers/scatters on TPU serialize (~8 us/row measured); this kernel
# replaces the (A, PMAX) gather tables with per-block *contiguous* dynamic
# DMA out of the block-sorted particle arrays, builds the one-hot weight
# matrix W (PMAX, 216) in VMEM, and contracts V^T @ W on the MXU.
# ---------------------------------------------------------------------------

P2G_NV = 16  # padded value columns: [mass, u0(3), B(9), pad(3)]
P2G_NODES = 216  # 6^3 block-window nodes
P2G_NODES_PAD = 256


def p2g_block_matmul_reference(vals, lb, w, starts, counts, pmax: int):
    """XLA fallback (gather-based).  vals: (n_pad, 16) f32; lb: (n_pad, 3)
    int32 local base in 0..3; w: (n_pad, 9) f32 per-axis tap weights
    [wx0..2, wy0..2, wz0..2]; starts/counts: (A,).  Returns (A, 16, 216)."""
    A = starts.shape[0]
    n_pad = vals.shape[0]
    dtype = vals.dtype
    s_idx = jnp.arange(pmax)
    pidx = jnp.clip(starts[:, None] + s_idx[None, :], 0, n_pad - 1)
    valid = (s_idx[None, :] < counts[:, None]).astype(dtype)
    Vb = vals[pidx] * valid[..., None]  # (A, PMAX, 16)
    lbb = lb[pidx]  # (A, PMAX, 3)
    wb = w[pidx].reshape(A, pmax, 3, 3)
    l_range = jnp.arange(6)

    def axis_onehot(axis):
        acc = jnp.zeros((A, pmax, 6), dtype)
        for t in range(3):
            mask = l_range[None, None, :] == (lbb[..., axis] + t)[..., None]
            acc = acc + mask.astype(dtype) * wb[..., axis, t][..., None]
        return acc

    wx, wy, wz = axis_onehot(0), axis_onehot(1), axis_onehot(2)
    W = (
        wx[:, :, :, None, None]
        * wy[:, :, None, :, None]
        * wz[:, :, None, None, :]
    ).reshape(A, pmax, 216) * valid[..., None]
    return jnp.einsum("apv,apl->avl", Vb, W)


if _HAS_PALLAS:

    def _double_buffered_window(
        a, starts_ref, packed_hbm, buf, sems, *, pmax
    ):
        """Double-buffered dynamic DMA of the per-block particle window.

        Program a computes on buf[a%2] while the DMA engine fills buf[(a+1)%2]
        with the NEXT block's window — per-block DMA latency hides behind the
        current block's compute (the CUDA pipeline gets the same overlap from
        its warp scheduler for free; Mosaic needs it spelled out).  buf/sems
        are grid-persistent scratch (TPU grids execute as a sequential loop on
        one core).  Returns the current block's (pmax, 128) rows.
        """
        nprog = pl.num_programs(0)
        two = jnp.asarray(2, a.dtype) if hasattr(a, "dtype") else 2
        slot = jax.lax.rem(a, two)
        nxt = jax.lax.rem(a + 1, two)

        @pl.when(a == 0)
        def _():
            pltpu.make_async_copy(
                packed_hbm.at[pl.ds(starts_ref[0], pmax)], buf.at[0],
                sems.at[0],
            ).start()

        @pl.when(a + 1 < nprog)
        def _():
            pltpu.make_async_copy(
                packed_hbm.at[pl.ds(starts_ref[a + 1], pmax)], buf.at[nxt],
                sems.at[nxt],
            ).start()

        pltpu.make_async_copy(
            packed_hbm.at[pl.ds(starts_ref[a], pmax)], buf.at[slot],
            sems.at[slot],
        ).wait()
        return buf[slot]

    def _factor_weights_jk(pk, pmax, valid):
        """The (j, k)-factor of the tensor-product B-spline weights.

        W[p, (i*6+j)*6+k] = Wx[p,i] * W2[p, j*6+k] with W2 = Wy * Wz.  The
        one-hot selections run on a single (pmax, 36) tile via lane iota —
        the narrow per-axis concatenate construction this replaces was
        VPU-bound (round-2 profile: the blocked G2P spent ~5.5 ms/substep
        rebuilding W).  valid is folded in here (once per product).
        """
        jk = jax.lax.broadcasted_iota(jnp.int32, (pmax, 36), 1)
        j_l = jk // 6
        k_l = jk - 6 * j_l
        lby = pk[:, 26:27].astype(jnp.int32)
        lbz = pk[:, 27:28].astype(jnp.int32)
        Wy = jnp.zeros((pmax, 36), pk.dtype)
        Wz = jnp.zeros((pmax, 36), pk.dtype)
        for t in range(3):
            Wy = Wy + jnp.where(j_l == lby + t, pk[:, 19 + t : 20 + t], 0.0)
            Wz = Wz + jnp.where(k_l == lbz + t, pk[:, 22 + t : 23 + t], 0.0)
        return Wy * Wz * valid

    def _factor_weights_x(pk, pmax, width, stride):
        """The i-factor expanded over a (pmax, width) tile: lane c gets
        Wx[p, c // stride]."""
        i_l = jax.lax.broadcasted_iota(jnp.int32, (pmax, width), 1) // stride
        lbx = pk[:, 25:26].astype(jnp.int32)
        Wx = jnp.zeros((pmax, width), pk.dtype)
        for t in range(3):
            Wx = Wx + jnp.where(i_l == lbx + t, pk[:, 16 + t : 17 + t], 0.0)
        return Wx

    def _p2g_block_kernel(
        starts_ref, offs_ref, counts_ref, packed_hbm, out_ref, buf, sems,
        *, pmax
    ):
        # packed columns: 0:16 vals, 16:25 w taps, 25:28 local base (as f32).
        # starts are 8-row aligned (HBM (8,128) tiling: an unaligned dynamic
        # DMA start hangs the DMA engine); offs gives the true row offset.
        a = pl.program_id(0)
        pk = _double_buffered_window(
            a, starts_ref, packed_hbm, buf, sems, pmax=pmax
        )
        off = offs_ref[a]
        count = counts_ref[a]
        rows = jax.lax.broadcasted_iota(jnp.int32, (pmax, 1), 0)
        valid = jnp.logical_and(rows >= off, rows < off + count).astype(
            pk.dtype
        )
        # Factorized contraction: out[(i,v),(j,k)] = sum_p V[p,v] Wx[p,i]
        # * (Wy Wz)[p,(j,k)] — an MXU-shaped (96, 36) result instead of the
        # (16, 216) one-hot form whose W build was VPU-bound.
        V96 = jnp.concatenate([pk[:, 0:P2G_NV]] * 6, axis=1)  # (pmax, 96)
        V1 = V96 * _factor_weights_x(pk, pmax, 96, P2G_NV)
        W2 = _factor_weights_jk(pk, pmax, valid)  # (pmax, 36)
        out = jax.lax.dot_general(
            V1, W2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (96, 36)
        pad = jnp.zeros((6 * P2G_NV, 128 - 36), out.dtype)
        out_ref[0] = jnp.concatenate([out, pad], axis=1)

    def p2g_block_matmul_pallas(packed, starts, offs, counts, pmax: int,
                                interpret: bool = False):
        """packed: (n_pad, 128) f32 — see _p2g_block_kernel column layout.
        starts must be 8-aligned; offs the in-slice row offsets.
        Returns (A, 16, 216) (reference layout: node l = (i*6+j)*6+k)."""
        A = starts.shape[0]
        kernel = functools.partial(_p2g_block_kernel, pmax=pmax)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(A,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 6 * P2G_NV, 128), lambda a, *_: (a, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, pmax, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        raw = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, 6 * P2G_NV, 128), jnp.float32),
            interpret=interpret,
        )(starts, offs, counts, packed)
        # raw[a, i*16+v, j*6+k] -> (A, 16, 216) with l = i*36 + j*6 + k.
        return (
            raw[:, :, :36]
            .reshape(A, 6, P2G_NV, 36)
            .transpose(0, 2, 1, 3)
            .reshape(A, P2G_NV, 216)
        )

else:  # pragma: no cover

    def p2g_block_matmul_pallas(*args, **kwargs):
        raise RuntimeError("Pallas unavailable on this backend")


def p2g_block_matmul_packed(packed, starts, counts, pmax: int, use_pallas=None):
    """Dispatcher on the pre-packed (n_pad, 128) layout (see kernel docstring:
    cols 0:16 values, 16:25 weights, 25:28 local base).

    Pallas path DMAs align_window(pmax) rows per block (callers pad the
    sorted array accordingly) so start alignment never drops particles, and
    is batch-safe under vmap (the batch axis folds into the block grid via a
    custom_vmap rule — the stock pallas_call batching rule faults the TPU
    worker on scalar-prefetch manual-DMA kernels)."""
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and jax.default_backend() not in ("cpu",)
    n_pad = packed.shape[0]
    if use_pallas:
        starts_al, offs, counts_c = align_starts(starts, counts, n_pad, pmax)
        return _p2g_pallas_vmapsafe(align_window(pmax))(
            packed, starts_al, offs, counts_c
        )
    return p2g_block_matmul_reference(
        packed[:, 0:16],
        packed[:, 25:28].astype(jnp.int32),
        packed[:, 16:25],
        starts,
        counts,
        pmax,
    )


# ---------------------------------------------------------------------------
# Batch-safe wrappers: fold a vmapped batch axis into the Pallas grid.
#
# vmapping a PrefetchScalarGridSpec manual-DMA pallas_call through the stock
# batching rule faults the TPU worker (BASELINE.md round-1 caution).  The
# batch axis is instead folded deterministically: stack the per-batch sorted
# particle arrays end to end (the row count n_pad is 8-aligned so every
# segment keeps DMA alignment) and offset each batch's block starts by its
# segment base — one bigger kernel launch with grid B*A, no per-op batching.
# ---------------------------------------------------------------------------


def _broadcast_unbatched(axis_size, args, in_batched):
    out = []
    for a, b in zip(args, in_batched):
        if b:
            out.append(a)
        else:
            out.append(
                jnp.broadcast_to(a[None], (axis_size,) + jnp.shape(a))
            )
    return out


@functools.lru_cache(maxsize=None)
def _p2g_pallas_vmapsafe(win: int):
    @jax.custom_batching.custom_vmap
    def call(packed, starts_al, offs, counts):
        return p2g_block_matmul_pallas(packed, starts_al, offs, counts, win)

    @call.def_vmap
    def rule(axis_size, in_batched, packed, starts_al, offs, counts):
        packed, starts_al, offs, counts = _broadcast_unbatched(
            axis_size, (packed, starts_al, offs, counts), in_batched
        )
        B, n_pad, _ = packed.shape
        A = starts_al.shape[1]
        seg = n_pad * jnp.arange(B, dtype=starts_al.dtype)[:, None]
        out = call(
            packed.reshape(B * n_pad, 128),
            (starts_al + seg).reshape(-1),
            offs.reshape(-1),
            counts.reshape(-1),
        )
        return out.reshape((B, A) + out.shape[1:]), True

    return call


@functools.lru_cache(maxsize=None)
def _g2p_pallas_vmapsafe(win: int, dxi2: float, dt: float):
    @jax.custom_batching.custom_vmap
    def call(packed, vel_ext, starts_al, offs, counts):
        return g2p_block_matmul_pallas(
            packed, vel_ext, starts_al, offs, counts, win, dxi2, dt
        )

    @call.def_vmap
    def rule(axis_size, in_batched, packed, vel_ext, starts_al, offs, counts):
        packed, vel_ext, starts_al, offs, counts = _broadcast_unbatched(
            axis_size, (packed, vel_ext, starts_al, offs, counts), in_batched
        )
        B, n_pad, _ = packed.shape
        A = starts_al.shape[1]
        seg = n_pad * jnp.arange(B, dtype=starts_al.dtype)[:, None]
        out = call(
            packed.reshape(B * n_pad, 128),
            vel_ext.reshape((B * A,) + vel_ext.shape[2:]),
            (starts_al + seg).reshape(-1),
            offs.reshape(-1),
            counts.reshape(-1),
        )
        return out.reshape((B, A) + out.shape[1:]), True

    return call


# ---------------------------------------------------------------------------
# Blocked G2P: the gather-free inverse of the blocked P2G.  Per active block:
# DMA the same block-sorted packed particle rows, rebuild the one-hot W
# (PMAX, 216) in VMEM, contract against the block's 216 grid-node velocity
# window on the MXU, and finish the whole particle update (APIC C, F <-
# (I + dt C) F, advection) in-register.  Replaces a 113 MB HBM one-hot
# materialization + einsum + 131k-row unsort sort (measured 9.8 ms of a
# 16 ms substep) with one 67 MB in / 67 MB out kernel pass.
# (grid_to_particle_kernel :799 role.)
# ---------------------------------------------------------------------------

G2P_VEL_CH = 12  # [v(3), v*node_x(3), v*node_y(3), v*node_z(3)]


def align_window(pmax: int) -> int:
    """DMA window rows for a block of capacity pmax: +8 headroom so 8-aligning
    the start never truncates a full block (the round-1 silent-drop bug:
    counts_c = min(counts, pmax - offs) lost up to 7 particles from any
    fully-occupied block)."""
    return pmax + 8


def align_starts(starts, counts, n_pad: int, pmax: int):
    """8-align dynamic DMA starts and keep the (start, window) slice in
    bounds (an unaligned or out-of-bounds dynamic DMA hangs the engine).
    The window is pmax + 8 rows (see align_window) so alignment costs no
    particles; callers must pad the sorted array so n_pad >= window and
    n_pad % 8 == 0.
    Returns (starts_al, offs, counts); block a's particles live at sorted
    rows [starts_al[a] + offs[a], starts_al[a] + offs[a] + counts[a])."""
    win = align_window(pmax)
    starts_al = (starts // 8) * 8
    starts_al = jnp.minimum(starts_al, jnp.maximum(n_pad - win, 0))
    offs = (starts - starts_al).astype(jnp.int32)
    return starts_al.astype(jnp.int32), offs, counts.astype(jnp.int32)


def g2p_block_matmul_reference(
    packed, vel_ext, starts_al, offs, counts, pmax: int, dxi2, dt
):
    """XLA fallback (gather-based), bit-identical layout to the kernel.

    packed: (n_pad, 128) block-sorted rows (cols 16:25 w, 25:28 lb,
    28:31 x, 31:40 F); vel_ext: (A, 216, >=12) per-block node channels
    [v, v*nx, v*ny, v*nz].  Returns (A, pmax, 128) with cols 0:3 x_new,
    3:6 v_new, 6:15 F_new, 15:24 C_new (invalid slots zero)."""
    A = starts_al.shape[0]
    n_pad = packed.shape[0]
    dtype = packed.dtype
    s_idx = jnp.arange(pmax)
    pidx = jnp.clip(starts_al[:, None] + s_idx[None, :], 0, n_pad - 1)
    valid = (
        (s_idx[None, :] >= offs[:, None])
        & (s_idx[None, :] < (offs + counts)[:, None])
    ).astype(dtype)
    pk = packed[pidx]  # (A, pmax, 128)
    lbb = pk[..., 25:28].astype(jnp.int32)
    wb = pk[..., 16:25].reshape(A, pmax, 3, 3)
    l_range = jnp.arange(6)

    def axis_onehot(axis):
        acc = jnp.zeros((A, pmax, 6), dtype)
        for t in range(3):
            mask = l_range[None, None, :] == (lbb[..., axis] + t)[..., None]
            acc = acc + mask.astype(dtype) * wb[..., axis, t][..., None]
        return acc

    wx, wy, wz = axis_onehot(0), axis_onehot(1), axis_onehot(2)
    W = (
        wx[:, :, :, None, None]
        * wy[:, :, None, :, None]
        * wz[:, :, None, None, :]
    ).reshape(A, pmax, 216) * valid[..., None]
    g2p = jnp.einsum("apl,alv->apv", W, vel_ext[..., :G2P_VEL_CH])
    v_new = g2p[..., 0:3]
    # channel 3 + 3a + i = sum_l w v_i n_a -> reshape (a, i); C[i][j] needs
    # the (i, a) layout, hence the swap.
    wvn = g2p[..., 3:12].reshape(A, pmax, 3, 3)
    x_p = pk[..., 28:31]
    C_new = dxi2 * (
        jnp.swapaxes(wvn, -1, -2) - v_new[..., :, None] * x_p[..., None, :]
    )
    F_p = pk[..., 31:40].reshape(A, pmax, 3, 3)
    F_new = (jnp.eye(3, dtype=dtype)[None, None] + dt * C_new) @ F_p
    x_new = x_p + dt * v_new
    out = jnp.zeros((A, pmax, 128), dtype)
    out = out.at[..., 0:3].set(x_new)
    out = out.at[..., 3:6].set(v_new)
    out = out.at[..., 6:15].set(F_new.reshape(A, pmax, 9))
    out = out.at[..., 15:24].set(C_new.reshape(A, pmax, 9))
    return out * valid[..., None]


if _HAS_PALLAS:

    def _g2p_block_kernel(
        starts_ref, offs_ref, counts_ref, packed_hbm, vel_ref, out_ref,
        buf, sems, *, pmax, dxi2, dt
    ):
        a = pl.program_id(0)
        pk = _double_buffered_window(
            a, starts_ref, packed_hbm, buf, sems, pmax=pmax
        )
        off = offs_ref[a]
        count = counts_ref[a]
        rows = jax.lax.broadcasted_iota(jnp.int32, (pmax, 1), 0)
        valid = jnp.logical_and(rows >= off, rows < off + count).astype(
            pk.dtype
        )
        # Factorized gather: T[p, i*12+c] = sum_{jk} (Wy Wz)[p,(j,k)]
        # * vel2[(j,k), i*12+c], then contract the i-factor on lanes.
        W2 = _factor_weights_jk(pk, pmax, valid)  # (pmax, 36)
        vel = vel_ref[0]  # (36, 128); cols i*12+c for i<6, c<12
        T = jax.lax.dot_general(
            W2, vel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (pmax, 128)
        U = T[:, 0:72] * _factor_weights_x(pk, pmax, 72, 12)
        g2p = (
            U[:, 0:12] + U[:, 12:24] + U[:, 24:36]
            + U[:, 36:48] + U[:, 48:60] + U[:, 60:72]
        )  # (pmax, 12): [v(3), sum_l w v_i n_a (9)]

        v = [g2p[:, i : i + 1] for i in range(3)]
        x = [pk[:, 28 + i : 29 + i] for i in range(3)]
        F = [
            [pk[:, 31 + 3 * i + j : 32 + 3 * i + j] for j in range(3)]
            for i in range(3)
        ]
        # g2p col 3 + 3a + i = sum_l w v_i n_a; C[i][j] = dxi2 *
        # (sum w v_i n_j - v_i x_j).
        C = [
            [
                dxi2 * (g2p[:, 3 + 3 * j + i : 4 + 3 * j + i] - v[i] * x[j])
                for j in range(3)
            ]
            for i in range(3)
        ]
        Fn = [
            [
                F[i][j]
                + dt
                * (
                    C[i][0] * F[0][j]
                    + C[i][1] * F[1][j]
                    + C[i][2] * F[2][j]
                )
                for j in range(3)
            ]
            for i in range(3)
        ]
        xn = [x[i] + dt * v[i] for i in range(3)]
        cols = (
            xn
            + v
            + [Fn[i][j] for i in range(3) for j in range(3)]
            + [C[i][j] for i in range(3) for j in range(3)]
        )
        out = jnp.concatenate(
            cols + [jnp.zeros((pmax, 128 - 24), pk.dtype)], axis=1
        )
        out_ref[0] = out * valid

    def g2p_block_matmul_pallas(
        packed, vel_ext, starts_al, offs, counts, pmax: int, dxi2, dt,
        interpret: bool = False,
    ):
        """vel_ext: (A, 216, >=12) per-block node channels [v, v*nx, v*ny,
        v*nz] in node order l = (i*6+j)*6+k.  See reference for the layout
        contract."""
        A = starts_al.shape[0]
        # Rearrange to the factorized layout vel2[a, j*6+k, i*12+c].
        vel2 = (
            vel_ext[:, :, :G2P_VEL_CH]
            .reshape(A, 6, 6, 6, G2P_VEL_CH)
            .transpose(0, 2, 3, 1, 4)
            .reshape(A, 36, 6 * G2P_VEL_CH)
        )
        vel2 = jnp.concatenate(
            [vel2, jnp.zeros((A, 36, 128 - 6 * G2P_VEL_CH), vel2.dtype)],
            axis=-1,
        )
        kernel = functools.partial(
            _g2p_block_kernel, pmax=pmax, dxi2=float(dxi2), dt=float(dt)
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(A,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (1, 36, 128), lambda a, *_: (a, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, pmax, 128), lambda a, *_: (a, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, pmax, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, pmax, 128), jnp.float32),
            interpret=interpret,
        )(starts_al, offs, counts, packed, vel2)

else:  # pragma: no cover

    def g2p_block_matmul_pallas(*args, **kwargs):
        raise RuntimeError("Pallas unavailable on this backend")


def g2p_block_matmul_packed(
    packed, vel_ext, starts_al, offs, counts, pmax: int, dxi2, dt,
    use_pallas=None,
):
    """Dispatcher on pre-aligned starts (see align_starts).  Slot layout is
    the align_window(pmax)-row DMA window: output is (A, win, 128) and block
    a's particles occupy rows [offs[a], offs[a]+counts[a]).  Batch-safe
    under vmap (custom_vmap grid fold)."""
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and jax.default_backend() not in ("cpu",)
    win = align_window(pmax)
    if use_pallas:
        return _g2p_pallas_vmapsafe(win, float(dxi2), float(dt))(
            packed, vel_ext, starts_al, offs, counts
        )
    return g2p_block_matmul_reference(
        packed, vel_ext, starts_al, offs, counts, win, dxi2, dt
    )


def p2g_block_matmul(vals, lb, w, starts, counts, pmax: int, use_pallas=None):
    """Dispatcher.  vals (n_pad, 16); lb (n_pad, >=3) i32; w (n_pad, >=9)."""
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and jax.default_backend() not in ("cpu",)
    if use_pallas:
        n_pad = vals.shape[0]
        packed = jnp.zeros((n_pad, 128), jnp.float32)
        packed = packed.at[:, 0:16].set(vals[:, :16])
        packed = packed.at[:, 16:25].set(w[:, :9])
        packed = packed.at[:, 25:28].set(lb[:, :3].astype(jnp.float32))
        starts_al = (starts // 8) * 8
        # Keep the DMA window in bounds (an out-of-bounds or non-8-aligned
        # dynamic DMA hangs the engine).
        starts_al = jnp.minimum(starts_al, jnp.maximum(n_pad - pmax, 0))
        offs = (starts - starts_al).astype(jnp.int32)
        counts_c = jnp.minimum(counts, pmax - offs).astype(jnp.int32)
        return p2g_block_matmul_pallas(packed, starts_al, offs, counts_c, pmax)
    return p2g_block_matmul_reference(vals, lb[:, :3], w[:, :9], starts, counts, pmax)
