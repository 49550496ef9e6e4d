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
