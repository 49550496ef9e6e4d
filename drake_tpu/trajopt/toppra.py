"""TOPPRA: time-optimal path parameterization by reachability analysis.

Re-derivation of the reference's Toppra (multibody/optimization/toppra.h,
Pham & Pham 2018) in the TPU shape: with x = sdot^2 the per-gridpoint
subproblems are ONE-variable LPs whose optima are closed-form interval
intersections, so the backward (controllable-set) and forward (greedy
max-velocity) passes are two lax.scans — no LP solver in the loop, fully
jit/vmap-able (batch over paths or limit sets).

Path model: q(s), s in [0, 1].  Chain rule gives
    qdot  = q'(s) sdot,          qddot = q'(s) sddot + q''(s) x,
velocity limits cap x pointwise, and each joint's acceleration limits are
linear in (x_k, x_{k+1}) after the discretization
    x_{k+1} = x_k + 2 ds sddot_k.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class ToppraResult(NamedTuple):
    s_grid: jnp.ndarray  # (N,)
    x: jnp.ndarray  # (N,) optimal sdot^2 profile
    t_grid: jnp.ndarray  # (N,) time at each gridpoint
    feasible: jnp.ndarray  # scalar bool
    duration: jnp.ndarray  # t_grid[-1]


def _interval_1d(a, b, lo, hi, big):
    """Feasible interval of x for lo <= a + b x <= hi (per element), with
    |b| ~ 0 treated as unconstrained-if-satisfied."""
    tiny = 1e-12
    safe_b = jnp.where(jnp.abs(b) > tiny, b, 1.0)
    l1 = (lo - a) / safe_b
    u1 = (hi - a) / safe_b
    lo_x = jnp.where(b > tiny, l1, jnp.where(b < -tiny, u1, -big))
    hi_x = jnp.where(b > tiny, u1, jnp.where(b < -tiny, l1, big))
    # Degenerate rows (b ~ 0): feasible iff lo <= a <= hi.
    ok0 = jnp.logical_and(a >= lo - 1e-9, a <= hi + 1e-9)
    hi_x = jnp.where(
        jnp.logical_and(jnp.abs(b) <= tiny, ~ok0), -big, hi_x
    )
    return jnp.max(lo_x), jnp.min(hi_x)


def toppra(
    path: Callable,  # q(s) -> (nq,)
    vmax,  # (nq,) joint velocity limits (symmetric)
    amax,  # (nq,) joint acceleration limits (symmetric)
    num_grid: int = 101,
    sd_start: float = 0.0,
    sd_end: float = 0.0,
    amin=None,
) -> ToppraResult:
    """Compute the time-optimal parameterization of ``path``.

    Returns gridded sdot^2 and times; resample q(s(t)) as needed.
    """
    vmax = jnp.asarray(vmax)
    amax = jnp.asarray(amax)
    amin_ = -amax if amin is None else jnp.asarray(amin)
    dtype = vmax.dtype
    big = jnp.asarray(1e12, dtype)

    s_grid = jnp.linspace(0.0, 1.0, num_grid).astype(dtype)
    ds = s_grid[1] - s_grid[0]

    qp = jax.vmap(jax.jacfwd(path))(s_grid)  # (N, nq) q'(s)
    qpp = jax.vmap(jax.jacfwd(jax.jacfwd(path)))(s_grid)  # (N, nq)

    # Pointwise velocity cap: x <= min_i (vmax_i / |q'_i|)^2.
    xv = jnp.min(
        (vmax / jnp.maximum(jnp.abs(qp), 1e-9)) ** 2, axis=1
    )  # (N,)

    # ---- backward pass: controllable sets ---------------------------------
    # Given x_{k+1}, the largest feasible x_k under
    #   amin <= q'_k (x_{k+1} - x_k)/(2 ds) + q''_k x_k <= amax.
    def bwd(x_next, inp):
        qp_k, qpp_k, xv_k = inp
        a = qp_k * x_next / (2 * ds)
        b = qpp_k - qp_k / (2 * ds)
        lo_x, hi_x = _interval_1d(a, b, amin_, amax, big)
        x_k = jnp.minimum(hi_x, xv_k)
        x_k = jnp.maximum(x_k, 0.0)
        ok = x_k >= lo_x - 1e-9
        return x_k, (x_k, ok)

    x_end = jnp.asarray(sd_end**2, dtype)
    _, (x_bwd_rev, ok_bwd) = jax.lax.scan(
        bwd, x_end, (qp[:-1][::-1], qpp[:-1][::-1], xv[:-1][::-1])
    )
    x_ctrl = jnp.concatenate([x_bwd_rev[::-1], x_end[None]])  # (N,)

    # ---- forward pass: greedy max velocity under controllability ----------
    def fwd(x_k, inp):
        qp_k, qpp_k, x_ctrl_next = inp
        a = -qp_k * x_k / (2 * ds) + qpp_k * x_k
        b = qp_k / (2 * ds)
        lo_x, hi_x = _interval_1d(a, b, amin_, amax, big)
        x_next = jnp.minimum(hi_x, x_ctrl_next)
        x_next = jnp.maximum(x_next, 0.0)
        ok = x_next >= lo_x - 1e-9
        return x_next, (x_next, ok)

    x0 = jnp.minimum(jnp.asarray(sd_start**2, dtype), x_ctrl[0])
    _, (x_fwd, ok_fwd) = jax.lax.scan(
        fwd, x0, (qp[:-1], qpp[:-1], x_ctrl[1:])
    )
    x = jnp.concatenate([x0[None], x_fwd])

    # ---- time reconstruction ---------------------------------------------
    sd = jnp.sqrt(jnp.maximum(x, 0.0))
    dt = 2 * ds / jnp.maximum(sd[:-1] + sd[1:], 1e-9)
    t_grid = jnp.concatenate(
        [jnp.zeros(1, dtype), jnp.cumsum(dt)]
    )
    feasible = jnp.logical_and(jnp.all(ok_bwd), jnp.all(ok_fwd))
    return ToppraResult(
        s_grid=s_grid, x=x, t_grid=t_grid, feasible=feasible,
        duration=t_grid[-1],
    )
