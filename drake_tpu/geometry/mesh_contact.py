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
B against hull(A) give a vertex-face contact manifold, and
``edge_edge_contacts`` adds the EDGE-EDGE class (the SAT cross-axis
manifold FCL's GJK/EPA would find): crossed-edge configurations — e.g.
two beams at 90 deg resting across each other, where no vertex of either
body is inside the other — get contact rows with the cross-product
separating axis as normal and the SAT projection overlap as depth.  All
of it is fixed-count and masked, so the scene query stays one jittable
program.

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
# Edge-edge narrow phase (the SAT cross-axis contact class).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _hull_edges_cache(vertices_key: Tuple) -> np.ndarray:
    """Unique TRUE hull edges (E, 2) vertex-index pairs.

    qhull triangulates faces, so raw simplex edges include coplanar-face
    diagonals; an edge is kept only if its two adjacent triangles are
    non-coplanar (a real crease of the polytope — the only edges that
    generate distinct SAT cross axes)."""
    verts = np.asarray(vertices_key, np.float64).reshape(-1, 3)
    from scipy.spatial import ConvexHull

    hull = ConvexHull(verts)
    tri_n = hull.equations[:, :3]  # unit outward normals per simplex
    edge_faces = {}
    for f, simplex in enumerate(hull.simplices):
        for i in range(3):
            e = tuple(sorted((simplex[i], simplex[(i + 1) % 3])))
            edge_faces.setdefault(e, []).append(f)
    edges = []
    for e, faces in edge_faces.items():
        if len(faces) != 2:
            continue
        if abs(np.dot(tri_n[faces[0]], tri_n[faces[1]])) < 1.0 - 1e-9:
            edges.append(e)
    return np.asarray(sorted(edges), np.int64).reshape(-1, 2)


def hull_edges(mesh: sh.Mesh) -> np.ndarray:
    key = tuple(np.asarray(mesh.vertices, np.float64).reshape(-1).tolist())
    return _hull_edges_cache(key)


def _segment_closest(p1, q1, p2, q2, eps):
    """Closest points between segment batches [p1,q1] x [p2,q2] (Ericson)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = jnp.where(
        denom > eps, jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0, 1),
        0.0,
    )
    t = (b * s + f) / jnp.maximum(e, eps)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(
        jnp.abs(t - t_cl) > 0,
        jnp.clip((b * t_cl - c) / jnp.maximum(a, eps), 0, 1),
        s,
    )
    cA = p1 + s[..., None] * d1
    cB = p2 + t_cl[..., None] * d2
    return cA, cB


def edge_edge_contacts(
    mesh_a: sh.Mesh, Ra, pa, mesh_b: sh.Mesh, Rb, pb, dtype, k: int = 4
):
    """k deepest edge-edge contact rows (phi, p_W, n_W), n_W from B into A.

    For every hull-edge pair: the separating axis is n = da x db (the SAT
    cross axis); depth is the hulls' projection overlap on n; the contact
    point is the mid-point of the segments' closest points.  A pair is a
    REAL edge-edge contact only when (a) the axis is well-defined, (b) the
    projections overlap, (c) the two edges pass within that overlap of
    each other, and (d) the mid-point lies essentially inside both hulls.
    Invalid pairs are masked with phi = +1 (inactive in SAP).  Reference
    role: FCL EPA edge-edge features via
    geometry/proximity/distance_to_shape_callback.h.
    """
    ea = hull_edges(mesh_a)
    eb = hull_edges(mesh_b)
    vA = jnp.asarray(np.asarray(mesh_a.vertices), dtype) @ Ra.T + pa
    vB = jnp.asarray(np.asarray(mesh_b.vertices), dtype) @ Rb.T + pb
    eps = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-8, dtype)

    pA0, pA1 = vA[ea[:, 0]], vA[ea[:, 1]]  # (Ea, 3)
    pB0, pB1 = vB[eb[:, 0]], vB[eb[:, 1]]  # (Eb, 3)
    Ea, Eb = pA0.shape[0], pB0.shape[0]
    # Pairwise broadcast to (Ea*Eb, 3).
    a0 = jnp.repeat(pA0, Eb, axis=0)
    a1 = jnp.repeat(pA1, Eb, axis=0)
    b0 = jnp.tile(pB0, (Ea, 1))
    b1 = jnp.tile(pB1, (Ea, 1))

    cA, cB = _segment_closest(a0, a1, b0, b1, eps)
    mid = 0.5 * (cA + cB)
    seg_d = jnp.linalg.norm(cA - cB, axis=-1)

    axis = jnp.cross(a1 - a0, b1 - b0)
    axis_n = jnp.linalg.norm(axis, axis=-1)
    ok_axis = axis_n > 1e-6
    n = axis / jnp.maximum(axis_n, eps)[..., None]
    # Orient from B into A (centroid direction).
    ca, cb_ = jnp.mean(vA, 0), jnp.mean(vB, 0)
    sgn = jnp.sign(jnp.sum(n * (ca - cb_)[None, :], -1))
    n = n * jnp.where(sgn == 0, 1.0, sgn)[..., None]

    # SAT projection overlap along each pair's axis.
    projA = vA @ n.T  # (nA, P)
    projB = vB @ n.T
    overlap = jnp.minimum(projA.max(0), projB.max(0)) - jnp.maximum(
        projA.min(0), projB.min(0)
    )

    # Mid-point must be (essentially) inside both hulls.
    na_np, da_np = hull_planes(mesh_a)
    nb_np, db_np = hull_planes(mesh_b)
    mid_A = (mid - pa) @ Ra
    mid_B = (mid - pb) @ Rb
    phiA, _ = hull_sdf_point(jnp.asarray(na_np, dtype),
                             jnp.asarray(da_np, dtype), mid_A)
    phiB, _ = hull_sdf_point(jnp.asarray(nb_np, dtype),
                             jnp.asarray(db_np, dtype), mid_B)
    diag = jnp.maximum(
        jnp.linalg.norm(vA.max(0) - vA.min(0)),
        jnp.linalg.norm(vB.max(0) - vB.min(0)),
    )
    tol = 1e-3 * diag
    valid = (
        ok_axis
        & (overlap > 0)
        & (seg_d <= overlap + tol)
        & (phiA < tol)
        & (phiB < tol)
    )
    phi = jnp.where(valid, -overlap, 1.0)
    kk = min(k, phi.shape[0])
    neg, idx = jax.lax.top_k(-phi, kk)
    safe_n = jnp.where(
        valid[idx][:, None], n[idx], jnp.asarray([0.0, 0.0, 1.0], dtype)
    )
    return [(-neg[j], mid[idx[j]], safe_n[j]) for j in range(kk)]


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
