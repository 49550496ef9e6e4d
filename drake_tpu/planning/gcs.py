"""GCS trajectory optimization: smooth trajectories through convex regions.

Re-derivation of the reference's GcsTrajectoryOptimization
(planning/trajectory_optimization/gcs_trajectory_optimization.h, Marcucci
et al.): the reference solves one mixed-integer convex program over the
whole graph of convex sets.  Without a MICP backend, this implementation
factors the problem the way GCS rounding does in practice:

  1. DISCRETE: build the region graph (edge iff polytopes overlap —
     Chebyshev-center LP through the MathematicalProgram container) and
     Dijkstra the cheapest region sequence between the sets containing
     start and goal;
  2. CONTINUOUS: one Bezier curve per region in the sequence, control
     points constrained to their region (convex-hull property makes
     containment exact), C0/C1 continuity at junctions, endpoint
     constraints, and a quadratic smoothness cost — a single QP.

Compose with trajopt/toppra.py for time-optimal timing of the path.
"""

from __future__ import annotations

import heapq
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.planning.iris import HPolyhedron
from drake_tpu.solvers.program import MathematicalProgram


class CompositeBezier(NamedTuple):
    """Piecewise Bezier path on s in [0, 1]; segment j covers
    [j/m, (j+1)/m]."""

    control_points: jnp.ndarray  # (m, k+1, n)

    def value(self, s):
        m = self.control_points.shape[0]
        s = jnp.clip(s, 0.0, 1.0 - 1e-9)
        j = jnp.floor(s * m).astype(jnp.int32)
        u = s * m - j
        cps = self.control_points[j]  # (k+1, n)
        # De Casteljau (static order).
        k = cps.shape[0] - 1
        pts = [cps[i] for i in range(k + 1)]
        for r in range(k):
            pts = [
                (1 - u) * pts[i] + u * pts[i + 1]
                for i in range(len(pts) - 1)
            ]
        return pts[0]

    def derivative_value(self, s):
        return jax.jacfwd(self.value)(jnp.asarray(s, jnp.float64))


def _chebyshev_radius(r1: HPolyhedron, r2: HPolyhedron) -> float:
    """Radius of the largest ball inside the intersection (LP); > 0 means
    the regions genuinely overlap."""
    A = np.concatenate([np.asarray(r1.A), np.asarray(r2.A)])
    b = np.concatenate([np.asarray(r1.b), np.asarray(r2.b)])
    norms = np.linalg.norm(A, axis=1)
    n = A.shape[1]
    prog = MathematicalProgram()
    xr = prog.NewContinuousVariables(n + 1, "xr")
    prog.AddLinearCost(np.concatenate([np.zeros(n), [-1.0]]), xr)
    rows = np.concatenate([A, norms[:, None]], axis=1)
    prog.AddLinearConstraint(rows, -np.inf, b, xr)
    prog.AddLinearConstraint(
        np.concatenate([np.zeros((1, n)), [[1.0]]], axis=1), 0.0, 1e3, xr
    )
    res = prog.Solve()
    if not res.is_success():
        return -1.0
    return float(res.GetSolution(xr)[-1])


class GcsTrajectoryOptimization:
    def __init__(self, regions: Sequence[HPolyhedron], order: int = 3):
        self.regions = list(regions)
        self.order = order
        n_reg = len(self.regions)
        self.edges = []
        for i in range(n_reg):
            for j in range(i + 1, n_reg):
                if _chebyshev_radius(self.regions[i], self.regions[j]) > 1e-6:
                    self.edges.append((i, j))

    def _centroid(self, i):
        # Chebyshev center of the region (LP).
        A = np.asarray(self.regions[i].A)
        b = np.asarray(self.regions[i].b)
        norms = np.linalg.norm(A, axis=1)
        prog = MathematicalProgram()
        n = A.shape[1]
        xr = prog.NewContinuousVariables(n + 1)
        prog.AddLinearCost(np.concatenate([np.zeros(n), [-1.0]]), xr)
        prog.AddLinearConstraint(
            np.concatenate([A, norms[:, None]], axis=1), -np.inf, b, xr
        )
        prog.AddLinearConstraint(
            np.concatenate([np.zeros((1, n)), [[1.0]]], axis=1), 0, 1e3, xr
        )
        res = prog.Solve()
        return np.asarray(res.GetSolution(xr)[:-1])

    def _region_of(self, x) -> Optional[int]:
        for i, r in enumerate(self.regions):
            if bool(r.contains(jnp.asarray(x, jnp.float64))):
                return i
        return None

    def _dijkstra(self, src: int, dst: int) -> Optional[List[int]]:
        adj = {i: [] for i in range(len(self.regions))}
        cents = [self._centroid(i) for i in range(len(self.regions))]
        for i, j in self.edges:
            w = float(np.linalg.norm(cents[i] - cents[j]))
            adj[i].append((j, w))
            adj[j].append((i, w))
        dist = {src: 0.0}
        prev = {}
        heap = [(0.0, src)]
        seen = set()
        while heap:
            d, u = heapq.heappop(heap)
            if u in seen:
                continue
            seen.add(u)
            if u == dst:
                break
            for v, w in adj[u]:
                nd = d + w
                if nd < dist.get(v, np.inf):
                    dist[v] = nd
                    prev[v] = u
                    heapq.heappush(heap, (nd, v))
        if dst not in seen:
            return None
        path = [dst]
        while path[-1] != src:
            path.append(prev[path[-1]])
        return path[::-1]

    def solve(self, start, goal):
        """Plan start -> goal via the FAST path: Dijkstra region sequencing
        on centroid-distance edge weights, then one Bezier QP.  On graphs
        where the cheapest sequence depends on the continuous geometry, use
        ``solve_relaxation`` (the reference's joint convex relaxation +
        rounding).  Returns (CompositeBezier, result) or (None, None)."""
        start = np.asarray(start, float)
        goal = np.asarray(goal, float)
        i0 = self._region_of(start)
        i1 = self._region_of(goal)
        if i0 is None or i1 is None:
            raise ValueError("start/goal not covered by any region")
        seq = [i0] if i0 == i1 else self._dijkstra(i0, i1)
        if seq is None:
            return None, None
        return self._solve_sequence(seq, start, goal)

    def _solve_sequence(self, seq, start, goal):
        """The continuous stage: one Bezier curve per region of ``seq``
        (control points region-contained), C0/C1 junctions, endpoint
        equalities, quadratic smoothness — a single QP."""
        m = len(seq)
        k = self.order
        n = start.shape[0]
        prog = MathematicalProgram()
        cps = prog.NewContinuousVariables(m * (k + 1) * n, "cp")

        def cp_index(seg, ctrl):
            base = (seg * (k + 1) + ctrl) * n
            return cps[base : base + n]

        # Region containment for every control point (convex hull property).
        for s_i, reg in enumerate(seq):
            A = np.asarray(self.regions[reg].A)
            b = np.asarray(self.regions[reg].b)
            for c in range(k + 1):
                prog.AddLinearConstraint(A, -np.inf, b, cp_index(s_i, c))
        # Endpoints.
        eye = np.eye(n)
        prog.AddLinearEqualityConstraint(eye, start, cp_index(0, 0))
        prog.AddLinearEqualityConstraint(eye, goal, cp_index(m - 1, k))
        # C0 + C1 continuity at junctions: last cp of seg j == first cp of
        # seg j+1; and (P_k - P_{k-1}) of seg j == (P_1 - P_0) of seg j+1.
        for j in range(m - 1):
            for (ca, cb) in (((j, k), (j + 1, 0)),):
                va, vb = cp_index(*ca), cp_index(*cb)
                row = np.zeros((n, prog.num_vars))
                row[:, va.start : va.start + n] = eye
                row[:, vb.start : vb.start + n] = -eye
                prog.AddLinearEqualityConstraint(
                    row, np.zeros(n), prog._blocks[0]
                )
            rowd = np.zeros((n, prog.num_vars))
            pa1, pa0 = cp_index(j, k), cp_index(j, k - 1)
            pb1, pb0 = cp_index(j + 1, 1), cp_index(j + 1, 0)
            rowd[:, pa1.start : pa1.start + n] += eye
            rowd[:, pa0.start : pa0.start + n] -= eye
            rowd[:, pb1.start : pb1.start + n] -= eye
            rowd[:, pb0.start : pb0.start + n] += eye
            prog.AddLinearEqualityConstraint(
                rowd, np.zeros(n), prog._blocks[0]
            )
        # Quadratic smoothness: sum |P_{c+1} - P_c|^2 over all segments.
        nv = prog.num_vars
        D = np.zeros((nv, nv))
        for s_i in range(m):
            for c in range(k):
                a = cp_index(s_i, c).start
                b2 = cp_index(s_i, c + 1).start
                for d in range(n):
                    D[a + d, a + d] += 1
                    D[b2 + d, b2 + d] += 1
                    D[a + d, b2 + d] -= 1
                    D[b2 + d, a + d] -= 1
        prog.AddQuadraticCost(2.0 * D, np.zeros(nv), prog._blocks[0])
        res = prog.Solve()
        z = np.asarray(res.GetSolution(prog._blocks[0]))
        ctrl = jnp.asarray(z.reshape(m, k + 1, n))
        return CompositeBezier(control_points=ctrl), res

    # ------------------------------------------------------------------
    # Joint convex relaxation + randomized rounding (the reference's
    # GraphOfConvexSets::SolveShortestPath behavior,
    # geometry/optimization/graph_of_convex_sets.h; Marcucci et al.).
    # ------------------------------------------------------------------

    def _flow_relaxation(self, start, goal):
        """The SPP-in-GCS convex relaxation as one SOCP.

        Per directed edge e=(u,v): flow phi_e in [0,1] and perspective
        points y_e = phi_e x_u, z_e = phi_e x_v with A_u y_e <= phi_e b_u
        (perspective containment); flow + spatial conservation at interior
        vertices; cost sum t_e with ||z_e - y_e|| <= t_e (the perspective
        of the Euclidean edge length).  Solved by the in-house ADMM conic
        backend (solvers/conic.py) through the program container.

        Returns (directed edge list with virtual source=-1 / sink=-2,
        flows (E,)).
        """
        start = np.asarray(start, float)
        goal = np.asarray(goal, float)
        n = start.shape[0]
        SRC, SNK = -1, -2
        edges = []
        for i, r in enumerate(self.regions):
            if bool(r.contains(jnp.asarray(start, jnp.float64))):
                edges.append((SRC, i))
            if bool(r.contains(jnp.asarray(goal, jnp.float64))):
                edges.append((i, SNK))
        for i, j in self.edges:
            edges.append((i, j))
            edges.append((j, i))
        E = len(edges)
        W = 2 + 2 * n  # per-edge layout [phi, t, y(n), z(n)]

        prog = MathematicalProgram()
        w = prog.NewContinuousVariables(E * W, "w")

        def idx(e, what):
            base = e * W
            return {
                "phi": (base, base + 1),
                "t": (base + 1, base + 2),
                "y": (base + 2, base + 2 + n),
                "z": (base + 2 + n, base + 2 + 2 * n),
            }[what]

        nv = E * W
        blk = prog._blocks[0]

        def rows_for(pairs, m_rows):
            """Sparse row builder: pairs = [(col0, coeff_matrix)...]."""
            R = np.zeros((m_rows, nv))
            for col0, M in pairs:
                M = np.atleast_2d(M)
                R[:, col0 : col0 + M.shape[1]] += M
            return R

        eye_n = np.eye(n)
        for e, (u, v) in enumerate(edges):
            p0, _ = idx(e, "phi")
            y0, _ = idx(e, "y")
            z0, _ = idx(e, "z")
            # phi in [0, 1].
            R = rows_for([(p0, [[1.0]])], 1)
            prog.AddLinearConstraint(R, 0.0, 1.0, blk)
            # Perspective containment / fixed endpoints.
            if u == SRC:
                R = rows_for([(y0, eye_n), (p0, -start[:, None])], n)
                prog.AddLinearEqualityConstraint(R, np.zeros(n), blk)
            else:
                A = np.asarray(self.regions[u].A)
                b = np.asarray(self.regions[u].b)
                R = rows_for([(y0, A), (p0, -b[:, None])], A.shape[0])
                prog.AddLinearConstraint(R, -np.inf, np.zeros(A.shape[0]), blk)
            if v == SNK:
                R = rows_for([(z0, eye_n), (p0, -goal[:, None])], n)
                prog.AddLinearEqualityConstraint(R, np.zeros(n), blk)
            else:
                A = np.asarray(self.regions[v].A)
                b = np.asarray(self.regions[v].b)
                R = rows_for([(z0, A), (p0, -b[:, None])], A.shape[0])
                prog.AddLinearConstraint(R, -np.inf, np.zeros(A.shape[0]), blk)
            # ||z - y|| <= t  (Lorentz cone on [t; z - y]).
            t0, _ = idx(e, "t")
            A_soc = np.zeros((1 + n, nv))
            A_soc[0, t0] = 1.0
            A_soc[1:, z0 : z0 + n] = eye_n
            A_soc[1:, y0 : y0 + n] = -eye_n
            prog.AddLorentzConeConstraint(A_soc, np.zeros(1 + n), blk)

        # Flow conservation.
        out_of = {}
        into = {}
        for e, (u, v) in enumerate(edges):
            out_of.setdefault(u, []).append(e)
            into.setdefault(v, []).append(e)
        # Source emits unit flow.
        R = rows_for(
            [(idx(e, "phi")[0], [[1.0]]) for e in out_of.get(SRC, [])], 1
        )
        prog.AddLinearEqualityConstraint(R, np.ones(1), blk)
        for vtx in range(len(self.regions)):
            ins = into.get(vtx, [])
            outs = out_of.get(vtx, [])
            if not ins and not outs:
                continue
            # phi balance (interior vertices pass flow through).
            pairs = [(idx(e, "phi")[0], [[1.0]]) for e in ins] + [
                (idx(e, "phi")[0], [[-1.0]]) for e in outs
            ]
            prog.AddLinearEqualityConstraint(
                rows_for(pairs, 1), np.zeros(1), blk
            )
            # Degree <= 1 (relaxed subtour guard).
            prog.AddLinearConstraint(
                rows_for([(idx(e, "phi")[0], [[1.0]]) for e in ins], 1),
                0.0, 1.0, blk,
            )
            # Spatial conservation: sum_in z = sum_out y.
            pairs = [(idx(e, "z")[0], eye_n) for e in ins] + [
                (idx(e, "y")[0], -eye_n) for e in outs
            ]
            prog.AddLinearEqualityConstraint(
                rows_for(pairs, n), np.zeros(n), blk
            )

        c = np.zeros(nv)
        for e in range(E):
            c[idx(e, "t")[0]] = 1.0
        prog.AddLinearCost(c, blk)
        res = prog.Solve()
        sol = np.asarray(res.GetSolution(blk))
        flows = np.array([sol[idx(e, "phi")[0]] for e in range(E)])
        return edges, flows

    def solve_relaxation(
        self, start, goal, max_paths: int = 5, seed: int = 0
    ):
        """Reference-equivalent GCS solve: convex flow relaxation + the
        standard randomized rounding (sample simple paths with edge
        probabilities proportional to the relaxed flows, solve the Bezier
        QP for each distinct sequence, keep the cheapest).  Falls back to
        the Dijkstra fast path if the relaxation finds no flow."""
        start = np.asarray(start, float)
        goal = np.asarray(goal, float)
        edges, flows = self._flow_relaxation(start, goal)
        SRC, SNK = -1, -2
        rng = np.random.default_rng(seed)
        out_of = {}
        for e, (u, v) in enumerate(edges):
            if flows[e] > 1e-4:
                out_of.setdefault(u, []).append((v, flows[e]))

        def sample_path(greedy: bool):
            path, u, visited = [], SRC, set()
            for _ in range(len(self.regions) + 2):
                cands = [
                    (v, f) for v, f in out_of.get(u, []) if v not in visited
                ]
                if not cands:
                    return None
                if greedy:
                    v = max(cands, key=lambda c: c[1])[0]
                else:
                    p = np.array([f for _, f in cands])
                    v = cands[rng.choice(len(cands), p=p / p.sum())][0]
                if v == SNK:
                    return path
                path.append(v)
                visited.add(v)
                u = v
            return None

        seqs = []
        g = sample_path(greedy=True)
        if g:
            seqs.append(tuple(g))
        for _ in range(8 * max_paths):
            if len(seqs) >= max_paths:
                break
            s = sample_path(greedy=False)
            if s and tuple(s) not in seqs:
                seqs.append(tuple(s))
        best = (None, None, np.inf)
        for seq in seqs:
            traj, res = self._solve_sequence(list(seq), start, goal)
            if res is not None and res.is_success():
                # Compare by true path length of the rounded trajectory.
                ss = np.linspace(0.0, 1.0, 64)
                pts = np.asarray(jax.vmap(traj.value)(jnp.asarray(ss)))
                length = float(
                    np.sum(np.linalg.norm(np.diff(pts, axis=0), axis=1))
                )
                if length < best[2]:
                    best = (traj, res, length)
        if best[0] is None:
            return self.solve(start, goal)
        return best[0], best[1]
