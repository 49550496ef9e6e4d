"""Mesh ingestion: OBJ parsing, convex hulls, vertex decimation.

Host-side (numpy) — the role of the reference's mesh pipeline
(geometry/proximity/obj_to_surface_mesh.h + qhull convex hulls used by
parser-registered Mesh/Convex shapes).  Output feeds the point-sampled
Mesh collision shape (geometry/shapes.py) and the triangle-mesh
visualizer path (viz/meshcat.py set_triangle_mesh).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def parse_obj(source: str, scale: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a Wavefront OBJ file path or string -> (verts (n,3) float64,
    faces (m,3) int32).  Polygons are fan-triangulated; v/vt/vn indices
    resolve to the vertex index; negative indices supported."""
    if "\n" in source or source.lstrip().startswith(("v ", "#", "o ", "f ")):
        lines = source.splitlines()
    else:
        with open(source) as f:
            lines = f.read().splitlines()
    verts, faces = [], []
    for line in lines:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v":
            verts.append([float(x) for x in parts[1:4]])
        elif parts[0] == "f":
            idx = []
            for tok in parts[1:]:
                i = int(tok.split("/")[0])
                idx.append(i - 1 if i > 0 else len(verts) + i)
            for k in range(1, len(idx) - 1):  # fan triangulation
                faces.append([idx[0], idx[k], idx[k + 1]])
    v = np.asarray(verts, np.float64) * scale
    f = np.asarray(faces, np.int32) if faces else np.zeros((0, 3), np.int32)
    return v, f


def convex_hull_vertices(verts: np.ndarray) -> np.ndarray:
    """Vertices of the convex hull (qhull role).

    Degenerate (non-full-dimensional) clouds — collinear segments, coplanar
    3-D patches — make plain qhull raise; retry with joggle ('QJ') and, if
    that also fails, return the deduplicated cloud unreduced (still a valid
    V-representation, just not minimal).  Mirrors the reference's tolerance
    of flat sets in MinkowskiSum/VPolytope.
    """
    from scipy.spatial import ConvexHull, QhullError

    v = np.asarray(verts, float)
    try:
        hull = ConvexHull(v)
    except QhullError:
        try:
            hull = ConvexHull(v, qhull_options="QJ")
        except QhullError:
            return np.unique(v, axis=0)
    return v[hull.vertices]


def decimate_vertices(verts: np.ndarray, max_vertices: int) -> np.ndarray:
    """Greedy farthest-point sampling down to ``max_vertices`` — keeps the
    extremes that matter for contact."""
    v = np.asarray(verts, float)
    n = v.shape[0]
    if n <= max_vertices:
        return v
    # Start from the lowest point (contact-relevant) and greedily add the
    # farthest-from-the-set vertex.
    chosen = [int(np.argmin(v[:, 2]))]
    d = np.linalg.norm(v - v[chosen[0]], axis=1)
    for _ in range(max_vertices - 1):
        nxt = int(np.argmax(d))
        chosen.append(nxt)
        d = np.minimum(d, np.linalg.norm(v - v[nxt], axis=1))
    return v[np.asarray(chosen)]


def box_mesh(size) -> Tuple[np.ndarray, np.ndarray]:
    """Unit test helper: the 8-corner box mesh."""
    sx, sy, sz = np.asarray(size, float) / 2.0
    verts = np.array(
        [
            [x, y, z]
            for x in (-sx, sx)
            for y in (-sy, sy)
            for z in (-sz, sz)
        ]
    )
    faces = []
    # 12 triangles (2 per face) via the corner index pattern.
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    for a, b, c, d in quads:
        faces.append([a, b, c])
        faces.append([a, c, d])
    return verts, np.asarray(faces, np.int32)

def _point_triangle_distance(p: np.ndarray, tri: np.ndarray) -> np.ndarray:
    """Exact unsigned point-triangle distances, fully vectorized.

    p: (M, 3) query points; tri: (T, 3, 3) triangle vertices.
    Returns (M, T) distances (Ericson, Real-Time Collision Detection §5.1.5
    — the closest-point region classification, broadcast over M x T).
    """
    a = tri[:, 0][None]  # (1, T, 3)
    ab = (tri[:, 1] - tri[:, 0])[None]
    ac = (tri[:, 2] - tri[:, 0])[None]
    ap = p[:, None, :] - a  # (M, T, 3)

    d1 = np.einsum("mtk,mtk->mt", np.broadcast_arrays(ab, ap)[0], ap)
    d2 = np.einsum("mtk,mtk->mt", np.broadcast_arrays(ac, ap)[0], ap)
    bp = ap - ab  # p - b
    d3 = np.einsum("mtk,mtk->mt", np.broadcast_arrays(ab, bp)[0], bp)
    d4 = np.einsum("mtk,mtk->mt", np.broadcast_arrays(ac, bp)[0], bp)
    cp = ap - ac  # p - c
    d5 = np.einsum("mtk,mtk->mt", np.broadcast_arrays(ab, cp)[0], cp)
    d6 = np.einsum("mtk,mtk->mt", np.broadcast_arrays(ac, cp)[0], cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = va + vb + vc
    eps = 1e-30
    # Barycentric of the interior-region projection.
    v = vb / np.where(np.abs(denom) < eps, eps, denom)
    w = vc / np.where(np.abs(denom) < eps, eps, denom)

    # Edge/vertex clamps per region (vectorized region select).
    ab2 = np.einsum("xtk,xtk->xt", ab, ab)  # (1, T)
    ac2 = np.einsum("xtk,xtk->xt", ac, ac)
    t_ab = np.clip(d1 / np.where(ab2 < eps, eps, ab2), 0.0, 1.0)
    t_ac = np.clip(d2 / np.where(ac2 < eps, eps, ac2), 0.0, 1.0)
    den_bc = (d4 - d3) + (d5 - d6)
    t_bc = np.clip(
        (d4 - d3) / np.where(np.abs(den_bc) < eps, eps, den_bc), 0.0, 1.0
    )

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (~in_a) & (~in_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (~in_a) & (~in_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (~in_b) & (~in_c) & (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    interior = ~(in_a | in_b | in_c | on_ab | on_ac | on_bc)

    v_full = np.where(interior, v, 0.0)
    w_full = np.where(interior, w, 0.0)
    v_full = np.where(on_ab, t_ab, v_full)
    w_full = np.where(on_bc, 1.0 - t_bc, w_full)
    v_full = np.where(on_bc, t_bc, v_full)
    w_full = np.where(on_ac, t_ac, w_full)
    v_full = np.where(in_b, 1.0, v_full)
    w_full = np.where(in_c, 1.0, w_full)

    closest = a + v_full[..., None] * ab + w_full[..., None] * ac
    return np.linalg.norm(p[:, None, :] - closest, axis=-1)


def bake_mesh_sdf(
    vertices,
    faces,
    resolution: int = 48,
    padding: float | None = None,
    chunk: int = 2048,
):
    """Bake a signed-distance voxel grid from a watertight triangle mesh.

    The host-side precompute behind geometry.shapes.MeshSdf — the role of
    the reference's mesh proximity machinery (geometry/proximity/
    distance_to_shape_callback.h, mesh_distance_boundary.h) recast for TPU:
    meshes become a dense (N, N, N) grid sampled on-device by trilinear
    interpolation (static shape, MXU/VPU-friendly), instead of BVH
    traversals per query.

    Distance: exact point-triangle (vectorized, chunked).  Sign: ray-parity
    along +x per (y, z) grid line (the mesh must be watertight; a tiny
    deterministic jitter avoids edge double-counts).

    Returns (grid (N,N,N) float32, origin (3,) float64, dx float).
    Grid value at index (i,j,k) is the signed distance at
    origin + dx * (i,j,k); negative inside.
    """
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64).reshape(-1, 3)
    if f.shape[0] == 0:
        raise ValueError("bake_mesh_sdf needs triangles")
    tri = v[f]  # (T, 3, 3)
    lo = v.min(axis=0)
    hi = v.max(axis=0)
    if padding is None:
        padding = 0.15 * float((hi - lo).max()) + 1e-9
    lo = lo - padding
    hi = hi + padding
    N = int(resolution)
    dx = float((hi - lo).max() / (N - 1))
    axes = [lo[d] + dx * np.arange(N) for d in range(3)]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)  # (N^3, 3)

    # Unsigned distance, chunked over points.
    ud = np.empty(pts.shape[0], np.float64)
    for s in range(0, pts.shape[0], chunk):
        ud[s : s + chunk] = _point_triangle_distance(
            pts[s : s + chunk], tri
        ).min(axis=1)

    # Sign by ray parity: one +x ray per (y, z) line.  Jitter the line off
    # exact vertex/edge coordinates (deterministic, ~1e-4 dx).
    yq = axes[1][:, None] + 1.2345e-4 * dx  # (N, 1)
    zq = axes[2][None, :] + 2.3456e-4 * dx  # (1, N)
    ay, az = tri[:, 0, 1], tri[:, 0, 2]  # (T,)
    by, bz = tri[:, 1, 1], tri[:, 1, 2]
    cy, cz = tri[:, 2, 1], tri[:, 2, 2]
    # 2-D barycentric of (yq, zq) in the (y, z) projection, (N, N, T).
    d_yz = (by - ay) * (cz - az) - (cy - ay) * (bz - az)  # (T,)
    ok = np.abs(d_yz) > 1e-14
    inv = np.where(ok, 1.0 / np.where(ok, d_yz, 1.0), 0.0)
    py = yq[..., None] - ay  # (N, N, T)
    pz = zq[..., None] - az
    w1 = ((cz - az) * py - (cy - ay) * pz) * inv
    w2 = (-(bz - az) * py + (by - ay) * pz) * inv
    hit = ok & (w1 >= 0.0) & (w2 >= 0.0) & (w1 + w2 <= 1.0)
    x_hit = (
        tri[:, 0, 0]
        + w1 * (tri[:, 1, 0] - tri[:, 0, 0])
        + w2 * (tri[:, 2, 0] - tri[:, 0, 0])
    )  # (N, N, T)
    # Parity for grid x_i: number of crossings with x_hit > x_i.
    xs = axes[0]  # (N,)
    crossings = hit[None] & (x_hit[None] > xs[:, None, None, None])
    inside = (crossings.sum(axis=-1) % 2).astype(bool)  # (N, N, N)

    sdf = np.where(inside.reshape(-1), -ud, ud)
    return sdf.reshape(N, N, N).astype(np.float32), lo, dx


def make_terrain_mesh(
    heights: np.ndarray,
    x0: float,
    y0: float,
    spacing: float,
    z_bottom: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Watertight solid terrain mesh from a height grid.

    heights: (nx, ny) top-surface z at (x0 + i*spacing, y0 + j*spacing);
    the solid extends down to z_bottom (closed bottom + side walls).
    Returns (verts (n,3), faces (m,3)) for MeshSdf.from_mesh — the
    non-convex mesh-terrain asset (hull-based contact would fill dips).
    """
    h = np.asarray(heights, float)
    nx, ny = h.shape
    xs = x0 + spacing * np.arange(nx)
    ys = y0 + spacing * np.arange(ny)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    top = np.stack([X, Y, h], axis=-1).reshape(-1, 3)
    bot = np.stack([X, Y, np.full_like(h, z_bottom)], axis=-1).reshape(-1, 3)
    verts = np.concatenate([top, bot], axis=0)
    nb = nx * ny  # bottom-vertex index offset

    def vid(i, j, bottom=False):
        return i * ny + j + (nb if bottom else 0)

    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a, b = vid(i, j), vid(i + 1, j)
            c, d = vid(i, j + 1), vid(i + 1, j + 1)
            faces += [[a, b, d], [a, d, c]]  # top
            a, b, c, d = a + nb, b + nb, c + nb, d + nb
            faces += [[a, d, b], [a, c, d]]  # bottom (reversed)
    for i in range(nx - 1):  # y = min / max walls
        for bottom_j, flip in ((0, True), (ny - 1, False)):
            t0, t1 = vid(i, bottom_j), vid(i + 1, bottom_j)
            b0, b1 = vid(i, bottom_j, True), vid(i + 1, bottom_j, True)
            quad = [[t0, t1, b1], [t0, b1, b0]]
            faces += [q[::-1] for q in quad] if flip else quad
    for j in range(ny - 1):  # x = min / max walls
        for bottom_i, flip in ((0, False), (nx - 1, True)):
            t0, t1 = vid(bottom_i, j), vid(bottom_i, j + 1)
            b0, b1 = vid(bottom_i, j, True), vid(bottom_i, j + 1, True)
            quad = [[t0, t1, b1], [t0, b1, b0]]
            faces += [q[::-1] for q in quad] if flip else quad
    return verts, np.asarray(faces, np.int32)
