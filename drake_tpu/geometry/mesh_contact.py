"""Convex mesh-mesh narrow phase + AABB broad phase.

The reference runs mesh pairs through FCL's GJK/EPA with a BVH broad phase
(geometry/proximity/bvh.h, distance_to_shape_callback.h).  The TPU engine
keeps its fixed-count masked-pair discipline instead: every candidate pair
produces a static number of (phi, point, normal) rows and far pairs are
masked, so the whole scene query stays one jittable program.

Narrow phase (convex hulls): vertex-vs-hull signed distance BOTH ways.
For a convex polytope with outward face planes (n_f, d_f), the max plane
distance  max_f (n_f . x + d_f)  IS the signed distance for points inside
(the regime that matters for contact) and a sign-correct underestimate
outside.  The K deepest vertices of A against hull(B) plus the K deepest of
B against hull(A) give a vertex-face contact manifold — the dominant
contact class for convex stacking/settling (edge-edge pairs are not
generated; flagged limitation, same class as the K-deepest mesh-vs-SDF
sampling in scene.py).

Broad phase: world-space AABBs per geometry with an activation margin.
Mesh-mesh narrow phases are gated behind ``lax.cond`` on AABB overlap —
under jit the FLOPs are actually skipped (the reference's BVH saves the
same mesh-pair work); cheap analytic pairs are merely phi-masked.

Hulls are computed once on the host at scene-build time (scipy qhull — the
same role as the reference's convex hull preprocessing in parser.h).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.geometry import shapes as sh


@functools.lru_cache(maxsize=None)
def _hull_cache(vertices_key: Tuple) -> Tuple[np.ndarray, np.ndarray]:
    verts = np.asarray(vertices_key, np.float64).reshape(-1, 3)
    from scipy.spatial import ConvexHull

    hull = ConvexHull(verts)
    eqs = hull.equations  # (F, 4): n.x + d <= 0 inside, |n| = 1
    return eqs[:, :3].copy(), eqs[:, 3].copy()


def hull_planes(mesh: sh.Mesh) -> Tuple[np.ndarray, np.ndarray]:
    """Outward unit face normals (F, 3) and offsets (F,) of the convex hull
    of the mesh's vertices, in the geometry frame."""
    key = tuple(np.asarray(mesh.vertices, np.float64).reshape(-1).tolist())
    return _hull_cache(key)


def hull_sdf_point(normals, offsets, p):
    """Signed distance of point(s) p to the hull (exact inside, sign-correct
    underestimate outside) + the deepest face's outward normal."""
    d = p @ normals.T + offsets  # (..., F)
    idx = jnp.argmax(d, axis=-1)
    phi = jnp.max(d, axis=-1)
    n = normals[idx]
    return phi, n


def mesh_mesh_contacts(
    mesh_a: sh.Mesh, Ra, pa, mesh_b: sh.Mesh, Rb, pb, dtype, k_each: int = 4
):
    """Vertex-vs-hull contacts both ways; returns 2*k_each rows of
    (phi, p_W, n_W) with n_W from B into A (the ContactData convention)."""
    na_np, da_np = hull_planes(mesh_a)
    nb_np, db_np = hull_planes(mesh_b)
    nA = jnp.asarray(na_np, dtype)
    dA = jnp.asarray(da_np, dtype)
    nB = jnp.asarray(nb_np, dtype)
    dB = jnp.asarray(db_np, dtype)
    vA = jnp.asarray(np.asarray(mesh_a.vertices), dtype)
    vB = jnp.asarray(np.asarray(mesh_b.vertices), dtype)

    out = []
    # A's vertices against hull(B): work in B's frame.
    vA_W = vA @ Ra.T + pa
    vA_B = (vA_W - pb) @ Rb
    phi, n_B = hull_sdf_point(nB, dB, vA_B)
    n_W = n_B @ Rb.T  # outward from B = from B into A
    kA = min(k_each, vA.shape[0])
    neg, idx = jax.lax.top_k(-phi, kA)
    out += [(-neg[k], vA_W[idx[k]], n_W[idx[k]]) for k in range(kA)]
    # B's vertices against hull(A): normals flip (ContactData wants B->A).
    vB_W = vB @ Rb.T + pb
    vB_A = (vB_W - pa) @ Ra
    phi, n_A = hull_sdf_point(nA, dA, vB_A)
    n_W = -(n_A @ Ra.T)
    kB = min(k_each, vB.shape[0])
    neg, idx = jax.lax.top_k(-phi, kB)
    out += [(-neg[k], vB_W[idx[k]], n_W[idx[k]]) for k in range(kB)]
    return out


# ---------------------------------------------------------------------------
# AABB broad phase.
# ---------------------------------------------------------------------------


def shape_aabb(shape, R, p, dtype):
    """World-frame AABB (lo (3,), hi (3,)) of a posed shape."""
    big = jnp.full((3,), 1e9, dtype)
    if isinstance(shape, sh.HalfSpace):
        return -big, big  # unbounded: overlaps everything
    if isinstance(shape, sh.Sphere):
        r = jnp.asarray(shape.radius, dtype)
        return p - r, p + r
    if isinstance(shape, sh.Capsule):
        a, b = sh.capsule_segment_points(R, p, shape.length)
        r = jnp.asarray(shape.radius, dtype)
        return jnp.minimum(a, b) - r, jnp.maximum(a, b) + r
    if isinstance(shape, sh.Box):
        half = 0.5 * jnp.abs(R) @ jnp.asarray(shape.size, dtype)
        return p - half, p + half
    if isinstance(shape, sh.Mesh):
        v = jnp.asarray(np.asarray(shape.vertices), dtype) @ R.T + p
        return jnp.min(v, axis=0), jnp.max(v, axis=0)
    return -big, big  # unknown shapes never prune


def aabb_overlap(lo_a, hi_a, lo_b, hi_b, margin: float = 0.0):
    """Scalar bool: the two boxes (inflated by margin) intersect."""
    return jnp.all((lo_a <= hi_b + margin) & (lo_b <= hi_a + margin))
