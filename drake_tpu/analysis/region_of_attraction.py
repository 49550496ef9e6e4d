"""Region-of-attraction estimation for smooth autonomous systems.

The RegionOfAttraction role (reference
systems/analysis/region_of_attraction.h, which maximizes the level set
{V <= rho} with Vdot < 0 via sums-of-squares programming).  TPU-native
split of the same idea:

  * the LYAPUNOV CANDIDATE comes from the linearization, exactly like
    the reference's default: V = x'Sx with A'S + S A = -Q
    (region_of_attraction.cc uses the linearized Lyapunov equation when
    no V is supplied);
  * the LEVEL is certified by a dense SAMPLED sweep instead of SOS: rho
    = min over sampled states of V(x) where Vdot(x) >= 0 — one fused
    jit/vmap program over rays x* + t u, millions of points per second
    on-chip.  This is probabilistic (sampling) rather than an algebraic
    proof; for polynomial systems the exact-certificate path is the
    Handelman LP of examples/cubic_polynomial_roa.py over the symbolic
    layer.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from drake_tpu.math.riccati import solve_lyapunov_continuous


class RoaResult(NamedTuple):
    S: jnp.ndarray  # (n, n) Lyapunov matrix: V = (x - x*)' S (x - x*)
    rho: jnp.ndarray  # certified level: {V <= rho} is the ROA estimate
    violation_point: jnp.ndarray  # (n,) the binding sample (Vdot >= 0)


def region_of_attraction(
    f: Callable,  # autonomous dynamics xdot = f(x)
    x_star,
    S: Optional[jnp.ndarray] = None,
    num_directions: int = 256,
    num_radii: int = 256,
    t_max: float = 10.0,
    margin: float = 1e-3,
    key=None,
) -> RoaResult:
    """Estimate the ROA of the equilibrium ``x_star`` of ``xdot = f(x)``.

    ``S``: optional Lyapunov matrix (defaults to the linearized Lyapunov
    solution with Q = I).  Samples ``num_directions`` unit directions x
    ``num_radii`` radii in (0, t_max]; rho is the smallest sampled V at
    which Vdot >= -margin * V fails to be negative.  jit/vmap friendly.
    """
    x_star = jnp.asarray(x_star)
    n = x_star.shape[0]
    dtype = x_star.dtype
    if key is None:
        key = jax.random.PRNGKey(0)

    if S is None:
        A = jax.jacfwd(f)(x_star)
        S = solve_lyapunov_continuous(A.T, jnp.eye(n, dtype=dtype))

    V = lambda x: (x - x_star) @ S @ (x - x_star)
    Vdot = lambda x: 2.0 * (x - x_star) @ S @ f(x)

    u = jax.random.normal(key, (num_directions, n), dtype)
    u = u / jnp.linalg.norm(u, axis=1, keepdims=True)
    ts = jnp.linspace(t_max / num_radii, t_max, num_radii).astype(dtype)
    pts = x_star[None, None] + ts[None, :, None] * u[:, None, :]  # (D,R,n)
    pts = pts.reshape(-1, n)

    Vs = jax.vmap(V)(pts)
    Vds = jax.vmap(Vdot)(pts)
    bad = Vds >= -margin * Vs  # failed decrease (scaled margin)
    # rho = smallest V among violating samples (inf if none in range).
    rho = jnp.min(jnp.where(bad, Vs, jnp.inf))
    worst = pts[jnp.argmin(jnp.where(bad, Vs, jnp.inf))]
    return RoaResult(S=S, rho=rho * (1.0 - margin), violation_point=worst)
