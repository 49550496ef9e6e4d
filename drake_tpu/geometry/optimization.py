"""Convex-set algebra for planning (geometry/optimization role).

The reference's ConvexSet hierarchy (geometry/optimization/convex_set.h:
HPolyhedron, Hyperellipsoid, VPolytope, Point, Intersection,
CartesianProduct, MinkowskiSum) powers IRIS and GCS.  drake_tpu's IRIS/GCS
already use the HPolyhedron/Hyperellipsoid cores (planning/iris.py); this
module completes the set family and the cross-set operations, with every
membership/geometry query a pure JAX function (batched point containment is
one vmap) and the LP-backed queries (VPolytope membership, Chebyshev
center) going through the in-house program container rather than a host LP
library.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Canonical half-space/ellipsoid types live with IRIS; re-exported here so
# users can import everything from geometry.optimization (the reference
# layout).
from drake_tpu.planning.iris import HPolyhedron, Hyperellipsoid

__all__ = [
    "HPolyhedron",
    "Hyperellipsoid",
    "VPolytope",
    "Point",
    "Spectrahedron",
    "Intersection",
    "intersection",
    "cartesian_product",
    "minkowski_sum_boxes",
    "minkowski_sum",
    "chebyshev_center",
    "ellipsoid_contains",
    "ellipsoid_from_sphere",
]


class VPolytope(NamedTuple):
    """Convex hull of vertices (geometry/optimization/vpolytope.h role)."""

    vertices: jnp.ndarray  # (k, n)

    @staticmethod
    def from_box(lower, upper) -> "VPolytope":
        lower = np.asarray(lower, float)
        upper = np.asarray(upper, float)
        n = lower.shape[0]
        corners = np.stack(
            [
                np.where(
                    [(i >> j) & 1 for j in range(n)], upper, lower
                )
                for i in range(2**n)
            ]
        )
        return VPolytope(vertices=jnp.asarray(corners))

    @staticmethod
    def from_points(points) -> "VPolytope":
        """Reduce a cloud to its hull vertices (host-side qhull)."""
        from drake_tpu.geometry.mesh_io import convex_hull_vertices

        return VPolytope(
            vertices=jnp.asarray(convex_hull_vertices(np.asarray(points)))
        )

    def contains(self, x, tol: float = 1e-7):
        """Membership by convex-combination least squares + simplex
        projection check — solved as a small NNLS via projected gradient
        (fixed iterations, jit/vmap-friendly; no host LP)."""
        V = self.vertices  # (k, n)
        k = V.shape[0]
        x = jnp.asarray(x, V.dtype)

        # min_w ||V'w - x||^2  s.t. w >= 0, sum w = 1  (projected gradient
        # on the simplex).
        G = V @ V.T
        c = V @ x
        L = jnp.linalg.norm(G, ord="fro") + 1e-9  # Lipschitz bound

        def simplex_project(w):
            """Euclidean projection onto the probability simplex
            (sort-based, Held-Wolfe-Crowder)."""
            u = jnp.sort(w)[::-1]
            css = jnp.cumsum(u) - 1.0
            idx = jnp.arange(1, k + 1, dtype=w.dtype)
            cond = u - css / idx > 0
            rho = jnp.sum(cond)
            theta = css[rho.astype(int) - 1] / rho
            return jnp.maximum(w - theta, 0.0)

        def body(w, _):
            grad = G @ w - c
            return simplex_project(w - grad / L), None

        w0 = jnp.full((k,), 1.0 / k, V.dtype)
        w, _ = jax.lax.scan(body, w0, None, length=200)
        dist = jnp.linalg.norm(V.T @ w - x)
        return dist <= tol + 1e-6 * (1.0 + jnp.linalg.norm(x))


class Point(NamedTuple):
    """A singleton set (geometry/optimization/point.h role)."""

    x: jnp.ndarray

    def contains(self, y, tol: float = 1e-9):
        return jnp.linalg.norm(self.x - jnp.asarray(y, self.x.dtype)) <= tol


class Spectrahedron(NamedTuple):
    """Affine slice of the PSD cone: {x : F0 + sum_i x_i Fi >= 0 (PSD)}
    (geometry/optimization/spectrahedron.h role).

    The reference wraps a MathematicalProgram's PSD constraints; here the
    set is the LMI data directly — membership is a pure JAX eigenvalue
    check (batched containment is one vmap), and the interior-point query
    is the SDP  max t  s.t.  F(x) - t I >= 0  through the in-house
    program container + ADMM conic backend.
    """

    F: jnp.ndarray  # (k+1, m, m) symmetric; F[0] is the constant term

    @property
    def ambient_dimension(self) -> int:
        return self.F.shape[0] - 1

    def matrix(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, self.F.dtype)
        return self.F[0] + jnp.tensordot(x, self.F[1:], axes=1)

    def contains(self, x, tol: float = 1e-7):
        return jnp.linalg.eigvalsh(self.matrix(x))[0] >= -tol

    def interior_point(self) -> Tuple[jnp.ndarray, float]:
        """(x*, t*) maximizing the smallest eigenvalue margin t of F(x);
        t* > 0 iff the spectrahedron has nonempty interior.

        The margin is CLAMPED to |t| <= sum|F| so the SDP is bounded even
        for unbounded spectrahedra (e.g. F0=0, F1=I, where t can grow with
        |x| without limit).  The sign of t* (the interior test) is exact;
        the magnitude is only meaningful when the clamp is inactive."""
        from drake_tpu.solvers.program import MathematicalProgram

        F = np.asarray(self.F, float)
        k, m = F.shape[0] - 1, F.shape[1]
        prog = MathematicalProgram()
        xt = prog.NewContinuousVariables(k + 1, "xt")  # (x, t)
        prog.AddLinearCost(np.concatenate([np.zeros(k), [-1.0]]), xt)
        # F0 + sum x_i Fi - t I >= 0  as an LMI in (x, t).
        lmi = [F[0]] + [F[1 + i] for i in range(k)] + [-np.eye(m)]
        prog.AddLinearMatrixInequalityConstraint(lmi, xt)
        # Clamp t so the SDP is never unbounded.  For unbounded
        # spectrahedra the true margin is +inf; the clamp keeps the solve
        # well-posed and preserves sign(t*) — see the docstring.
        bound = float(np.abs(F).sum())
        prog.AddLinearConstraint(
            np.concatenate([np.zeros(k), [1.0]])[None], -bound, bound, xt
        )
        res = prog.Solve()
        sol = np.atleast_1d(res.GetSolution(xt))
        return jnp.asarray(sol[:k]), float(sol[k])


class Intersection:
    """Intersection of arbitrary member sets (intersection.h role) —
    membership is the conjunction of member memberships."""

    def __init__(self, *sets):
        self.sets = tuple(sets)

    def contains(self, x, tol: float = 1e-7):
        inside = jnp.asarray(True)
        for s in self.sets:
            if isinstance(s, HPolyhedron):
                inside = jnp.logical_and(
                    inside, jnp.all(s.A @ jnp.asarray(x) <= s.b + tol)
                )
            elif isinstance(s, Hyperellipsoid):
                inside = jnp.logical_and(inside, ellipsoid_contains(s, x, tol))
            else:
                inside = jnp.logical_and(inside, s.contains(x, tol))
        return inside


def intersection(a: HPolyhedron, b: HPolyhedron) -> HPolyhedron:
    """Intersection of half-space sets = stacked rows
    (intersection.h role for the polyhedral case)."""
    return HPolyhedron(
        A=jnp.concatenate([a.A, b.A], axis=0),
        b=jnp.concatenate([a.b, b.b], axis=0),
    )


def cartesian_product(a: HPolyhedron, b: HPolyhedron) -> HPolyhedron:
    """A x B in block-diagonal H-form (cartesian_product.h role)."""
    ma, na = a.A.shape
    mb, nb = b.A.shape
    A = jnp.zeros((ma + mb, na + nb), a.A.dtype)
    A = A.at[:ma, :na].set(a.A)
    A = A.at[ma:, na:].set(b.A)
    return HPolyhedron(A=A, b=jnp.concatenate([a.b, b.b]))


def minkowski_sum_boxes(
    lower1, upper1, lower2, upper2
) -> HPolyhedron:
    """Minkowski sum of two axis-aligned boxes (minkowski_sum.h role for
    the box case — the sum of boxes is the box of summed bounds)."""
    return HPolyhedron.box(
        jnp.asarray(lower1) + jnp.asarray(lower2),
        jnp.asarray(upper1) + jnp.asarray(upper2),
    )


def minkowski_sum(a: VPolytope, b: VPolytope) -> VPolytope:
    """Exact Minkowski sum of V-polytopes (minkowski_sum.h role): the hull
    of pairwise vertex sums (host-side qhull reduction)."""
    Va = np.asarray(a.vertices, float)
    Vb = np.asarray(b.vertices, float)
    sums = (Va[:, None, :] + Vb[None, :, :]).reshape(-1, Va.shape[1])
    return VPolytope.from_points(sums)


def chebyshev_center(poly: HPolyhedron) -> Tuple[jnp.ndarray, float]:
    """Largest inscribed ball: the LP  max_r (x, r)  s.t.
    a_i'x + ||a_i|| r <= b_i  (HPolyhedron::ChebyshevCenter role), solved
    with the in-house IPM via the program container."""
    from drake_tpu.solvers.program import MathematicalProgram

    A = np.asarray(poly.A, float)
    b = np.asarray(poly.b, float)
    m, n = A.shape
    norms = np.linalg.norm(A, axis=1)
    prog = MathematicalProgram()
    xr = prog.NewContinuousVariables(n + 1, "xr")  # (x, r)
    prog.AddLinearCost(np.concatenate([np.zeros(n), [-1.0]]), xr)
    rows = np.concatenate([A, norms[:, None]], axis=1)
    prog.AddLinearConstraint(rows, np.full(m, -np.inf), b, xr)
    prog.AddLinearConstraint(
        np.concatenate([np.zeros(n), [1.0]])[None], 0.0, np.inf, xr
    )
    res = prog.Solve()
    sol = np.atleast_1d(res.GetSolution(xr))
    return jnp.asarray(sol[:n]), float(sol[n])


def ellipsoid_contains(E: Hyperellipsoid, x, tol: float = 1e-9):
    """(x-d)'C'C(x-d) <= 1."""
    y = E.C @ (jnp.asarray(x, E.d.dtype) - E.d)
    return jnp.sum(y * y) <= 1.0 + tol


def ellipsoid_from_sphere(center, radius: float) -> Hyperellipsoid:
    center = jnp.asarray(center)
    n = center.shape[0]
    return Hyperellipsoid(
        C=jnp.eye(n, dtype=center.dtype) / radius, d=center
    )


class Hyperrectangle(NamedTuple):
    """Axis-aligned box {x : lb <= x <= ub} (hyperrectangle.h role).

    The only ConvexSet with trivially exact uniform sampling and bounding
    boxes — the reference uses it as the sampling domain for IRIS and
    clique-cover seeding."""

    lower: jnp.ndarray  # (n,)
    upper: jnp.ndarray  # (n,)

    def contains(self, x, tol: float = 0.0):
        return jnp.logical_and(
            jnp.all(x >= self.lower - tol), jnp.all(x <= self.upper + tol)
        )

    def center(self):
        return 0.5 * (self.lower + self.upper)

    def uniform_sample(self, key, num_samples: Optional[int] = None):
        """Exact uniform draw(s) (UniformSample role)."""
        shape = (
            self.lower.shape
            if num_samples is None
            else (num_samples,) + self.lower.shape
        )
        u = jax.random.uniform(key, shape, self.lower.dtype)
        return self.lower + u * (self.upper - self.lower)

    def to_hpolyhedron(self) -> HPolyhedron:
        n = self.lower.shape[0]
        eye = jnp.eye(n, dtype=self.lower.dtype)
        return HPolyhedron(
            A=jnp.concatenate([eye, -eye]),
            b=jnp.concatenate([self.upper, -self.lower]),
        )

    @staticmethod
    def maybe_calc_axis_aligned_bounding_box(points) -> "Hyperrectangle":
        """Tight AABB of a point set (MaybeCalcAxisAlignedBoundingBox role
        for the sets whose bounding box is their vertex hull)."""
        points = jnp.asarray(points)
        return Hyperrectangle(
            lower=jnp.min(points, axis=0), upper=jnp.max(points, axis=0)
        )


class AffineSubspace(NamedTuple):
    """{translation + basis @ u : u in R^k} (affine_subspace.h role).

    basis is (n, k) with independent columns; k = 0 is a point."""

    basis: jnp.ndarray  # (n, k)
    translation: jnp.ndarray  # (n,)

    @property
    def affine_dimension(self) -> int:
        return self.basis.shape[1]

    def project(self, x):
        """Orthogonal projection of x onto the subspace (Projection role)."""
        d = jnp.asarray(x) - self.translation
        u, *_ = jnp.linalg.lstsq(self.basis, d)
        return self.translation + self.basis @ u

    def contains(self, x, tol: float = 1e-9):
        return jnp.linalg.norm(jnp.asarray(x) - self.project(x)) <= tol

    def to_local_coordinates(self, x):
        """Least-squares coordinates of (the projection of) x."""
        u, *_ = jnp.linalg.lstsq(self.basis, jnp.asarray(x) - self.translation)
        return u

    @staticmethod
    def affine_hull(points, tol: float = 1e-9) -> "AffineSubspace":
        """Affine hull of a point set via SVD (AffineHull role,
        affine_subspace.h:AffineHull)."""
        points = jnp.asarray(points)
        c = jnp.mean(points, axis=0)
        _, s, vt = jnp.linalg.svd(points - c, full_matrices=False)
        rank = int(jnp.sum(s > tol * jnp.maximum(s[0], 1.0)))
        return AffineSubspace(basis=vt[:rank].T, translation=c)


class AffineBall(NamedTuple):
    """{B u + center : ||u||_2 <= 1} (affine_ball.h role) — the image-map
    dual of Hyperellipsoid (which is the preimage form x' A'A x <= 1);
    handles degenerate (flat) ellipsoids the quadratic form cannot."""

    B: jnp.ndarray  # (n, k)
    center: jnp.ndarray  # (n,)

    def contains(self, x, tol: float = 1e-9):
        d = jnp.asarray(x) - self.center
        u, resid, *_ = jnp.linalg.lstsq(self.B, d)
        # Off-image component must vanish and the pullback must be in the
        # unit ball.
        off = jnp.linalg.norm(d - self.B @ u)
        return jnp.logical_and(off <= tol, jnp.linalg.norm(u) <= 1.0 + tol)

    def volume(self):
        """Lebesgue volume in the ambient space (0 if flat): |det B| V_n."""
        n, k = self.B.shape
        if n != k:
            return jnp.asarray(0.0, self.B.dtype)
        from math import gamma, pi

        unit = pi ** (n / 2) / gamma(n / 2 + 1)
        return jnp.abs(jnp.linalg.det(self.B)) * unit

    @staticmethod
    def from_hyperellipsoid(e: Hyperellipsoid) -> "AffineBall":
        """Hyperellipsoid {x : (x-d)'C'C(x-d) <= 1} -> image form B = C^-1."""
        return AffineBall(B=jnp.linalg.inv(e.C), center=e.d)

    @staticmethod
    def make_unit_ball(dim: int, dtype=jnp.float64) -> "AffineBall":
        return AffineBall(
            B=jnp.eye(dim, dtype=dtype), center=jnp.zeros(dim, dtype)
        )

    @staticmethod
    def make_axis_aligned(radii, center) -> "AffineBall":
        radii = jnp.asarray(radii)
        return AffineBall(B=jnp.diag(radii), center=jnp.asarray(center))


__all__ += ["Hyperrectangle", "AffineSubspace", "AffineBall"]
