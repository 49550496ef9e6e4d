"""IRIS: iterative regional inflation by semidefinite programming.

Re-derivation of the reference's Iris (geometry/optimization/iris.h,
Deits & Tedrake 2014): alternate between
  1. SEPARATING HYPERPLANES: for each convex obstacle, the closest point
     to the current ellipsoid (in its metric) yields a tangent plane that
     excludes the obstacle from the region polytope;
  2. MAXIMUM-VOLUME INSCRIBED ELLIPSOID (MVIE) of the polytope
     {x : Ax <= b}: maximize log det L s.t. ||L a_i|| + a_i'd <= b_i.

The reference calls Mosek/qhull; here the MVIE is solved directly — in
configuration-space dimensions (2-7) the parameter count is tiny, so a
damped Newton log-barrier loop (jax.grad/jax.hessian on <= 35 parameters)
replaces the SDP backend, and obstacle closest points come from the
analytic shape set (sphere / box / point clouds).  Everything jits.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class HPolyhedron(NamedTuple):
    """{x : A x <= b} (geometry/optimization/hpolyhedron.h role)."""

    A: jnp.ndarray  # (m, n)
    b: jnp.ndarray  # (m,)

    def contains(self, x, tol=1e-9):
        return jnp.all(self.A @ x <= self.b + tol)

    @staticmethod
    def box(lower, upper) -> "HPolyhedron":
        lower = jnp.asarray(lower, jnp.float64)
        upper = jnp.asarray(upper, jnp.float64)
        n = lower.shape[0]
        eye = jnp.eye(n, dtype=lower.dtype)
        return HPolyhedron(
            A=jnp.concatenate([eye, -eye]),
            b=jnp.concatenate([upper, -lower]),
        )


class Hyperellipsoid(NamedTuple):
    """{x : (x-d)' C'C (x-d) <= 1}; volume ~ det(C)^-1
    (geometry/optimization/hyperellipsoid.h role)."""

    C: jnp.ndarray  # (n, n)
    d: jnp.ndarray  # (n,)


@dataclasses.dataclass(frozen=True)
class IrisObstacle:
    """Convex obstacle presented to IRIS: either an analytic shape or a
    vertex cloud (the VPolytope role)."""

    kind: str  # "sphere" | "box" | "points"
    center: np.ndarray = None
    radius: float = 0.0
    half: np.ndarray = None  # box half extents (axis-aligned)
    points: np.ndarray = None  # (k, n) vertex cloud


def _closest_point_metric(ob: IrisObstacle, E: Hyperellipsoid):
    """Closest obstacle point to the ellipsoid center in the C-metric,
    and the outward (from ellipsoid) unit direction at that point."""
    d = E.d
    if ob.kind == "sphere":
        c = jnp.asarray(ob.center, d.dtype)
        # In the metric space y = C x, the sphere is still convex but not a
        # sphere; the Euclidean closest point is exact for spheres in the
        # original space and works well in practice (IRIS only needs a
        # separating, not the optimal, plane).
        v = c - d
        dist = jnp.linalg.norm(v)
        x_star = c - ob.radius * v / jnp.maximum(dist, 1e-12)
        return x_star
    if ob.kind == "box":
        c = jnp.asarray(ob.center, d.dtype)
        h = jnp.asarray(ob.half, d.dtype)
        return jnp.clip(d, c - h, c + h)
    if ob.kind == "points":
        # Closest point of the convex hull of the cloud in the C-metric:
        # a few Frank-Wolfe steps (exact enough for a separating plane; the
        # plane is then pushed to the true support point).
        P = jnp.asarray(ob.points, d.dtype)  # (k, n)
        y = jnp.mean(P, axis=0)

        def fw(i, y):
            g = (E.C.T @ E.C) @ (y - d)
            s = P[jnp.argmin(P @ g)]
            gamma = 2.0 / (i + 2.0)
            return y + gamma * (s - y)

        y = jax.lax.fori_loop(0, 30, fw, y)
        return y
    raise ValueError(ob.kind)


def _separating_plane(ob: IrisObstacle, E: Hyperellipsoid):
    """Tangent plane a'x <= b at the closest point, excluding the obstacle.

    a points from the ellipsoid toward the obstacle; for point clouds the
    plane is pushed out to the hull's support point so the WHOLE obstacle
    is excluded (the reference tangent-plane step)."""
    x_star = _closest_point_metric(ob, E)
    # Gradient of the ellipsoid level set at x_star: C'C (x - d).
    a = (E.C.T @ E.C) @ (x_star - E.d)
    a = a / jnp.maximum(jnp.linalg.norm(a), 1e-12)
    b = a @ x_star
    if ob.kind == "sphere":
        b = a @ jnp.asarray(ob.center, a.dtype) - ob.radius
    elif ob.kind == "box":
        c = jnp.asarray(ob.center, a.dtype)
        h = jnp.asarray(ob.half, a.dtype)
        # Support of the box in direction -a.
        b = a @ c - jnp.sum(h * jnp.abs(a))
    elif ob.kind == "points":
        b = jnp.min(jnp.asarray(ob.points, a.dtype) @ a)
    return a, b


def _mvie(A, b, x0, num_newton: int = 40):
    """Max-volume inscribed ellipsoid of {Ax <= b} by damped Newton on the
    log-barrier formulation; x0 must be strictly inside."""
    m, n = A.shape
    dtype = A.dtype
    tri = jnp.tril_indices(n)

    def unpack(z):
        L = jnp.zeros((n, n), dtype).at[tri].set(z[: len(tri[0])])
        d = z[len(tri[0]) :]
        return L, d

    def cost(z, mu):
        L, d = unpack(z)
        # Margins: b_i - a_i'd - ||L' a_i|| > 0.
        margins = b - A @ d - jnp.linalg.norm(A @ L, axis=1)
        # Maximize log det(L L') = 2 sum log diag L (L lower-tri, diag>0
        # enforced by the barrier on diag).
        diag = jnp.diagonal(L)
        return (
            -2.0 * jnp.sum(jnp.log(jnp.maximum(diag, 1e-30)))
            - mu * jnp.sum(jnp.log(jnp.maximum(margins, 1e-30)))
        )

    # Initialize: small ball around x0.
    margins0 = b - A @ x0
    r0 = 0.1 * jnp.min(margins0) / jnp.max(jnp.linalg.norm(A, axis=1))
    z0 = jnp.zeros(len(tri[0]) + n, dtype)
    z0 = z0.at[jnp.arange(len(tri[0]))[jnp.cumsum(jnp.arange(n) + 1) - 1]].set(
        r0
    )
    z0 = z0.at[len(tri[0]) :].set(x0)

    def newton_step(z, mu):
        g = jax.grad(cost)(z, mu)
        H = jax.hessian(cost)(z, mu)
        H = H + 1e-8 * jnp.eye(z.shape[0], dtype=dtype)
        dz = -jnp.linalg.solve(H, g)
        # Backtracking to stay strictly feasible (finite cost).
        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.03, 0.01, 0.0], dtype)
        cands = z[None] + alphas[:, None] * dz[None]
        vals = jax.vmap(lambda zz: cost(zz, mu))(cands)
        vals = jnp.where(jnp.isfinite(vals), vals, jnp.inf)
        best = jnp.argmin(vals)
        return cands[best]

    z = z0
    for mu in (1.0, 0.3, 0.1, 0.03, 0.01):
        for _ in range(num_newton // 5):
            z = newton_step(z, mu)
    L, d = unpack(z)
    # Ellipsoid {x = d + L u, |u|<=1}  ->  C = inv(L).
    C = jnp.linalg.inv(L + 1e-12 * jnp.eye(n, dtype=dtype))
    return Hyperellipsoid(C=C, d=d)


def iris(
    seed,  # (n,) collision-free seed point
    obstacles: Sequence[IrisObstacle],
    domain: HPolyhedron,
    num_iterations: int = 4,
) -> Tuple[HPolyhedron, Hyperellipsoid]:
    """Grow a convex collision-free region from ``seed``.

    Returns the polytope (domain rows + one separating row per obstacle
    per final iteration) and the inscribed ellipsoid.
    """
    seed = jnp.asarray(seed, jnp.float64)
    n = seed.shape[0]
    E = Hyperellipsoid(
        C=jnp.eye(n, dtype=jnp.float64) / 1e-2, d=seed
    )  # tiny initial ball
    A_dom, b_dom = domain.A, domain.b
    region = HPolyhedron(A=A_dom, b=b_dom)
    for _ in range(num_iterations):
        rows_a, rows_b = [], []
        for ob in obstacles:
            a, b_val = _separating_plane(ob, E)
            rows_a.append(a)
            rows_b.append(b_val)
        if rows_a:
            A = jnp.concatenate([A_dom, jnp.stack(rows_a)], axis=0)
            b = jnp.concatenate([b_dom, jnp.stack(rows_b)])
        else:
            A, b = A_dom, b_dom
        # Keep the seed inside: if a plane cuts the seed off (can happen
        # with the closest-point approximations), relax it to pass just
        # outside the seed.
        viol = A @ seed - b
        b = jnp.where(viol > 0, A @ seed + 1e-6, b)
        region = HPolyhedron(A=A, b=b)
        E = _mvie(A, b, seed)
    return region, E


# ---------------------------------------------------------------------------
# Configuration-space IRIS over the plant's own collision geometry
# (IrisInConfigurationSpace role, geometry/optimization/iris.h) and
# clique-cover seeding (planning/iris/iris_from_clique_cover.h role).
# ---------------------------------------------------------------------------


def iris_in_configuration_space(
    model,
    params,
    scene,
    q_seed,
    domain: HPolyhedron,
    num_iterations: int = 4,
    samples_per_iteration: int = 512,
    max_planes_per_iteration: int = 10,
    bisection_steps: int = 12,
    padding: float = 0.0,
    margin: float = 1e-3,
    key=None,
) -> Tuple[HPolyhedron, Hyperellipsoid]:
    """Grow a C-SPACE polytope around ``q_seed`` certified against the
    plant's collision pairs (the IrisInConfigurationSpace role).

    Counterexample search is sampled (the IRIS-ZO / fast-IRIS style that
    the reference's clique-cover pipeline also uses): draw configurations
    from the current region's inscribed ellipsoid, keep colliding ones,
    bisect each along the ray to the ellipsoid center to find the
    free-to-colliding boundary, then cut with ellipsoid-metric tangent
    planes at the closest counterexamples (nearest first, re-filtering
    after every cut — the reference's SeparatingPlanes loop order).
    All collision checks run batched on device (vmap over the scene query).
    """
    import jax
    import jax.numpy as jnp

    from drake_tpu.geometry.collision_checker import min_distance

    if key is None:
        key = jax.random.PRNGKey(0)
    q_seed = jnp.asarray(q_seed, jnp.float64)
    n = q_seed.shape[0]
    A_dom, b_dom = domain.A, domain.b
    region = HPolyhedron(A=A_dom, b=b_dom)
    E = Hyperellipsoid(C=jnp.eye(n, dtype=jnp.float64) / 1e-2, d=q_seed)

    phi_of = jax.jit(
        jax.vmap(lambda q: min_distance(model, params, scene, q))
    )

    def bisect_to_boundary(q_bad):
        """Walk q_bad toward the ellipsoid center to the last colliding
        point (fixed-count bisection; start point IS colliding)."""

        def body(carry, _):
            lo, hi = carry  # lo: free t, hi: colliding t (q = d + t*(q_bad-d))
            mid = 0.5 * (lo + hi)
            q_mid = E.d + mid * (q_bad - E.d)
            free = min_distance(model, params, scene, q_mid) > padding
            return (jnp.where(free, mid, lo), jnp.where(free, hi, mid)), None

        (lo, hi), _ = jax.lax.scan(
            body, (jnp.asarray(0.0, jnp.float64), jnp.asarray(1.0, jnp.float64)),
            None, length=bisection_steps,
        )
        return E.d + hi * (q_bad - E.d)

    bisect_v = jax.jit(jax.vmap(bisect_to_boundary))

    for it in range(num_iterations):
        key, k1, k2 = jax.random.split(key, 3)
        # Ellipsoid-uniform proposals clipped to the region.
        u = jax.random.normal(k1, (samples_per_iteration, n), jnp.float64)
        u = u / jnp.linalg.norm(u, axis=1, keepdims=True)
        radii = jax.random.uniform(
            k2, (samples_per_iteration, 1), jnp.float64
        ) ** (1.0 / n)
        qs = E.d + (radii * u) @ jnp.linalg.inv(E.C).T
        inside = jnp.all(
            qs @ region.A.T <= region.b[None, :] + 1e-12, axis=1
        )
        phis = phi_of(qs)
        colliding = inside & (phis <= padding)
        idx = np.where(np.asarray(colliding))[0]
        if idx.size:
            q_cex = np.asarray(bisect_v(qs[idx]))
            # Ellipsoid-metric distances; cut nearest first.
            dist = np.linalg.norm(
                (q_cex - np.asarray(E.d)) @ np.asarray(E.C).T, axis=1
            )
            order = np.argsort(dist)
            rows_a, rows_b = [], []
            CtC = np.asarray(E.C).T @ np.asarray(E.C)
            alive = np.ones(idx.size, bool)
            for j in order:
                if not alive[j] or len(rows_a) >= max_planes_per_iteration:
                    continue
                x_star = q_cex[j]
                a = CtC @ (x_star - np.asarray(E.d))
                nrm = np.linalg.norm(a)
                if nrm < 1e-12:
                    continue
                a = a / nrm
                b_val = float(a @ x_star) - margin
                rows_a.append(a)
                rows_b.append(b_val)
                alive &= q_cex @ a <= b_val + 1e-12  # re-filter behind the cut
            if rows_a:
                A = jnp.concatenate(
                    [region.A, jnp.asarray(np.stack(rows_a))], axis=0
                )
                b = jnp.concatenate(
                    [region.b, jnp.asarray(np.asarray(rows_b))]
                )
                # Never cut the seed off.
                viol = A @ q_seed - b
                b = jnp.where(viol > 0, A @ q_seed + 1e-6, b)
                region = HPolyhedron(A=A, b=b)
        E = _mvie(region.A, region.b, q_seed)
    return region, E


def iris_from_clique_cover_seeds(
    model,
    params,
    scene,
    domain: HPolyhedron,
    num_samples: int = 256,
    num_seeds: int = 3,
    visibility_samples: int = 8,
    padding: float = 0.0,
    key=None,
):
    """Greedy clique-cover SEEDING (iris_from_clique_cover.h role): sample
    free configurations, build the visibility graph (batched edge checks),
    repeatedly take the highest-degree vertex's clique-ish neighborhood,
    and return each clique's Chebyshev-ish center as an IRIS seed.
    Compose with iris_in_configuration_space per seed."""
    import jax
    import jax.numpy as jnp

    from drake_tpu.geometry.collision_checker import check_configs, check_edge

    if key is None:
        key = jax.random.PRNGKey(1)
    n = domain.A.shape[1]
    # Axis-aligned sampling bounds read off the domain's box rows.
    b_up = jnp.asarray(
        np.array([
            np.min(np.asarray(domain.b)[np.asarray(domain.A)[:, i] > 0.5])
            if np.any(np.asarray(domain.A)[:, i] > 0.5) else 1.0
            for i in range(n)
        ])
    )
    b_lo = jnp.asarray(
        np.array([
            -np.min(np.asarray(domain.b)[np.asarray(domain.A)[:, i] < -0.5])
            if np.any(np.asarray(domain.A)[:, i] < -0.5) else -1.0
            for i in range(n)
        ])
    )
    qs = jax.random.uniform(
        key, (num_samples, n), jnp.float64,
        minval=b_lo[None], maxval=b_up[None],
    )
    free = np.asarray(check_configs(model, params, scene, qs, padding))
    qs_free = np.asarray(qs)[free]
    m = qs_free.shape[0]
    if m == 0:
        return []
    # Visibility graph (edge checks, batched per row).
    vis = np.zeros((m, m), bool)
    check_e = jax.jit(
        jax.vmap(
            lambda q1, q2: check_edge(
                model, params, scene, q1, q2,
                num_samples=visibility_samples, padding=padding,
            )
        )
    )
    for i in range(m):
        qi = jnp.tile(jnp.asarray(qs_free[i])[None], (m, 1))
        vis[i] = np.asarray(check_e(qi, jnp.asarray(qs_free)))
    np.fill_diagonal(vis, False)
    seeds = []
    alive = np.ones(m, bool)
    for _ in range(num_seeds):
        deg = (vis & alive[None, :] & alive[:, None]).sum(axis=1)
        deg[~alive] = -1
        v = int(np.argmax(deg))
        if deg[v] <= 0:
            break
        members = np.where(vis[v] & alive)[0].tolist() + [v]
        center = np.mean(qs_free[members], axis=0)
        from drake_tpu.geometry.collision_checker import check_config

        if not bool(check_config(model, params, scene, jnp.asarray(center),
                                 padding)):
            # Clique mean can be in collision (non-convex free space):
            # fall back to the member closest to the mean.
            d2 = np.sum((qs_free[members] - center) ** 2, axis=1)
            center = qs_free[members[int(np.argmin(d2))]]
        seeds.append(center)
        alive[members] = False
    return seeds
