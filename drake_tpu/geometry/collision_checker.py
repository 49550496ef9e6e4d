"""Configuration-space collision checking — batched on device.

Re-derivation of the reference's planning CollisionChecker (reference:
planning/collision_checker.h:54-67 — parallel edge checks with one cloned
Context per thread; SceneGraphCollisionChecker).  The TPU version has no
context cloning: ``check_config`` is a pure function of q, and vmap supplies
the parallelism (thousands of configurations or edge samples per call).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from drake_tpu.geometry.scene import CollisionScene
from drake_tpu.multibody.model import MultibodyModel, MultibodyParams


def min_distance(model, params, scene: CollisionScene, q):
    """Minimum signed distance over all candidate pairs at configuration q."""
    contact = scene.query(model, params, q)
    return jnp.min(contact.phi)


def check_config(
    model, params, scene: CollisionScene, q, padding: float = 0.0
):
    """True iff q is collision-free (all pair distances > padding)."""
    return min_distance(model, params, scene, q) > padding


def check_configs(model, params, scene, qs, padding: float = 0.0):
    """Batched config check (CheckConfigsCollisionFree role)."""
    return jax.vmap(lambda q: check_config(model, params, scene, q, padding))(qs)


def check_edge(
    model,
    params,
    scene: CollisionScene,
    q1,
    q2,
    num_samples: int = 16,
    padding: float = 0.0,
):
    """Edge check by uniform interpolation (CheckEdgeCollisionFree role)."""
    alphas = jnp.linspace(0.0, 1.0, num_samples, dtype=q1.dtype)
    qs = q1[None] + alphas[:, None] * (q2 - q1)[None]
    return jnp.all(check_configs(model, params, scene, qs, padding))


def check_edges(model, params, scene, q_pairs, num_samples: int = 16, padding=0.0):
    """Batched parallel edge checks (the VisibilityGraph workhorse)."""
    return jax.vmap(
        lambda pair: check_edge(
            model, params, scene, pair[0], pair[1], num_samples, padding
        )
    )(q_pairs)


def visibility_graph(
    model, params, scene, points, num_samples: int = 16, padding: float = 0.0
):
    """Adjacency matrix of the visibility graph over sample configurations.

    The reference's parallel VisibilityGraph (planning/visibility_graph.h:
    thread-parallel pairwise edge checks between sampled configurations,
    feeding clique-cover IRIS).  TPU-native: ALL n(n-1)/2 edges check at
    once — one vmap over the flattened pair list, each edge sampled at
    num_samples interpolated configurations.

    Args:
      points: (n, nq) sample configurations.
    Returns:
      adjacency: (n, n) bool, symmetric, True where the straight-line edge
      is collision-free; the diagonal is each point's own validity.
    """
    n = points.shape[0]
    iu, ju = jnp.triu_indices(n, k=1)
    q_pairs = jnp.stack([points[iu], points[ju]], axis=1)  # (m, 2, nq)
    free = check_edges(
        model, params, scene, q_pairs, num_samples=num_samples,
        padding=padding,
    )
    adj = jnp.zeros((n, n), bool)
    adj = adj.at[iu, ju].set(free)
    adj = adj.at[ju, iu].set(free)
    valid = check_configs(model, params, scene, points, padding=padding)
    adj = adj.at[jnp.arange(n), jnp.arange(n)].set(valid)
    # an edge into an invalid endpoint is not usable
    adj = jnp.logical_and(adj, valid[None, :])
    adj = jnp.logical_and(adj, valid[:, None])
    return adj
