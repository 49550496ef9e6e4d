"""Fitted value iteration on a state grid.

Re-derivation of the reference's DynamicProgramming
(systems/controllers/dynamic_programming.h FittedValueIteration):
barycentric value iteration over a mesh of states and a discrete input
set.  The TPU shape: the transition table (every state x every input ->
interpolation weights) is precomputed as dense arrays once, and each
Bellman backup is one fused gather/min — value iteration becomes a
lax.scan of matrix ops, batching perfectly.

Supports periodic state dimensions (wrapping angles), the same option the
reference's PeriodicBoundaryCondition provides.
"""

from __future__ import annotations

import itertools
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ValueIterationResult(NamedTuple):
    J: jnp.ndarray  # (n_states,) optimal cost-to-go on the mesh
    policy: jnp.ndarray  # (n_states,) index into the input mesh
    states: jnp.ndarray  # (n_states, nx)
    inputs: jnp.ndarray  # (n_inputs, nu)
    grid: tuple  # the 1-D grids

    periodic: tuple = ()

    def value(self, x):
        return _interp(self.J, self.grid, self.periodic, x)


def _mesh(grids) -> jnp.ndarray:
    pts = jnp.stack(
        jnp.meshgrid(*grids, indexing="ij"), axis=-1
    )
    return pts.reshape(-1, len(grids))


def _interp_weights(grids, periodic, x):
    """Multilinear weights: returns (corner_indices (2^nx,), weights)."""
    nx = len(grids)
    idx0, fracs, sizes = [], [], []
    for d in range(nx):
        g = grids[d]
        ng = g.shape[0]
        sizes.append(ng)
        if d in periodic:
            span = g[-1] - g[0] + (g[1] - g[0])
            xd = jnp.mod(x[d] - g[0], span) + g[0]
            i = jnp.clip(jnp.searchsorted(g, xd, side="right") - 1, 0, ng - 1)
            g_i = g[i]
            step = jnp.where(i < ng - 1, g[jnp.minimum(i + 1, ng - 1)] - g_i,
                             span - (g[-1] - g[0]))
            f = jnp.clip((xd - g_i) / jnp.maximum(step, 1e-12), 0.0, 1.0)
        else:
            xd = jnp.clip(x[d], g[0], g[-1])
            i = jnp.clip(jnp.searchsorted(g, xd, side="right") - 1, 0, ng - 2)
            f = jnp.clip((xd - g[i]) / jnp.maximum(g[i + 1] - g[i], 1e-12),
                         0.0, 1.0)
        idx0.append(i)
        fracs.append(f)

    corners, weights = [], []
    for corner in itertools.product((0, 1), repeat=nx):
        flat = 0
        w = 1.0
        for d in range(nx):
            ng = sizes[d]
            i = idx0[d] + corner[d]
            if d in periodic:
                i = jnp.mod(i, ng)
            else:
                i = jnp.minimum(i, ng - 1)
            flat = flat * ng + i
            w = w * jnp.where(corner[d] == 1, fracs[d], 1.0 - fracs[d])
        corners.append(flat)
        weights.append(w)
    return jnp.stack(corners), jnp.stack(weights)


def _interp(J, grids, periodic, x):
    idx, w = _interp_weights(grids, periodic, x)
    return jnp.sum(J[idx] * w)


def fitted_value_iteration(
    dynamics: Callable,  # (x, u) -> x_next (discrete-time)
    cost: Callable,  # (x, u) -> stage cost
    state_grid: Sequence,  # tuple of 1-D arrays
    input_grid: Sequence,  # tuple of 1-D arrays
    num_iterations: int = 500,
    gamma: float = 1.0,
    periodic_dims: Tuple[int, ...] = (),
) -> ValueIterationResult:
    grids = tuple(jnp.asarray(g) for g in state_grid)
    ugrids = tuple(jnp.asarray(g) for g in input_grid)
    X = _mesh(grids)  # (ns, nx)
    U = _mesh(ugrids)  # (nu_total, nu)
    periodic = tuple(periodic_dims)

    # Precompute the transition/interpolation tables: for each (state,
    # input), the 2^nx corner indices + weights of x_next, and the stage
    # cost.  This is the barycentric mesh of the reference, dense.
    def tables(x, u):
        xn = dynamics(x, u)
        idx, w = _interp_weights(grids, periodic, xn)
        return idx, w, cost(x, u)

    idxs, ws, costs = jax.vmap(
        lambda x: jax.vmap(lambda u: tables(x, u))(U)
    )(X)  # (ns, nu, 2^nx) x2, (ns, nu)

    def bellman(J, _):
        # Q(s, a) = cost + gamma * interp(J, x_next)
        Jn = jnp.sum(J[idxs] * ws, axis=-1)  # (ns, nu)
        Q = costs + gamma * Jn
        return jnp.min(Q, axis=1), None

    J0 = jnp.zeros(X.shape[0], X.dtype)
    J, _ = jax.lax.scan(bellman, J0, None, length=num_iterations)
    Q = costs + gamma * jnp.sum(J[idxs] * ws, axis=-1)
    policy = jnp.argmin(Q, axis=1)
    return ValueIterationResult(
        J=J, policy=policy, states=X, inputs=U, grid=grids,
        periodic=periodic,
    )


def policy_at(result: ValueIterationResult, x):
    """Greedy input at an arbitrary state: input of the nearest mesh state
    (the reference returns the mesh policy the same way)."""
    d2 = jnp.sum((result.states - x) ** 2, axis=1)
    return result.inputs[result.policy[jnp.argmin(d2)]]
