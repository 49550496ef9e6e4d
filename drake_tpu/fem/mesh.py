"""Tetrahedral mesh generators for FEM deformables.

Host-side (numpy) mesh construction producing static arrays, the role of the
reference's mesh ingestion for deformable bodies (reference
geometry/proximity/make_mesh_from_vtk.h, examples' torus.vtk).  Instead of
loading VTK assets, meshes are generated procedurally: a structured grid is
split into 6 tetrahedra per cell along the main diagonal (Kuhn subdivision —
translation-invariant, hence conforming across cells, including periodic
wraps, which gives a genuine solid torus).
"""

from __future__ import annotations

import numpy as np

# The 6 Kuhn tetrahedra of the unit cube: each follows a permutation of the
# axes from corner 000 to corner 111.
_PERMS = [
    (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0),
]


def _kuhn_tets(cell_corner_index):
    """cell_corner_index: function (di, dj, dk) -> global vertex id."""
    tets = []
    for p in _PERMS:
        off = np.zeros(3, dtype=int)
        verts = [cell_corner_index(0, 0, 0)]
        for axis in p:
            off[axis] = 1
            verts.append(cell_corner_index(*off))
        tets.append(verts)
    return tets


def box_tet_mesh(nx: int, ny: int, nz: int, size=(1.0, 1.0, 1.0)):
    """Axis-aligned box [0,sx]x[0,sy]x[0,sz] as a (verts, tets) pair."""
    sx, sy, sz = size
    xs = np.linspace(0, sx, nx + 1)
    ys = np.linspace(0, sy, ny + 1)
    zs = np.linspace(0, sz, nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    tets = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                tets.extend(
                    _kuhn_tets(lambda di, dj, dk: vid(i + di, j + dj, k + dk))
                )
    return verts, np.asarray(tets, dtype=np.int32)


def torus_tet_mesh(
    major_radius: float = 0.3,
    minor_half: float = 0.08,
    segments: int = 24,
    n_cross: int = 2,
):
    """Solid torus (square cross-section) centered at the origin, axis +z.

    A periodic sweep of an (n_cross x n_cross)-cell square cross-section
    around the ring; Kuhn subdivision stays conforming across the periodic
    wrap.  Returns (verts (N, 3), tets (M, 4)).
    """
    S, n = segments, n_cross
    nv_cross = (n + 1) * (n + 1)

    def vid(s, a, b):
        return (s % S) * nv_cross + a * (n + 1) + b

    verts = np.zeros((S * nv_cross, 3))
    for s in range(S):
        th = 2.0 * np.pi * s / S
        cs, sn = np.cos(th), np.sin(th)
        for a in range(n + 1):
            for b in range(n + 1):
                u = (a / n - 0.5) * 2.0 * minor_half  # radial offset
                w = (b / n - 0.5) * 2.0 * minor_half  # vertical offset
                r = major_radius + u
                verts[vid(s, a, b)] = (r * cs, r * sn, w)

    tets = []
    for s in range(S):
        for a in range(n):
            for b in range(n):
                tets.extend(
                    _kuhn_tets(
                        lambda ds, da, db: vid(s + ds, a + da, b + db)
                    )
                )
    return verts, np.asarray(tets, dtype=np.int32)


def signed_volumes(verts: np.ndarray, tets: np.ndarray) -> np.ndarray:
    d1 = verts[tets[:, 1]] - verts[tets[:, 0]]
    d2 = verts[tets[:, 2]] - verts[tets[:, 0]]
    d3 = verts[tets[:, 3]] - verts[tets[:, 0]]
    return np.einsum("ij,ij->i", np.cross(d1, d2), d3) / 6.0


def fix_orientation(verts: np.ndarray, tets: np.ndarray) -> np.ndarray:
    """Flip inverted tets so all rest volumes are positive."""
    vol = signed_volumes(verts, tets)
    tets = tets.copy()
    flip = vol < 0
    tets[flip, 1], tets[flip, 2] = (
        tets[flip, 2].copy(),
        tets[flip, 1].copy(),
    )
    assert (signed_volumes(verts, tets) > 0).all()
    return tets
