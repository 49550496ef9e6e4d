"""MIP global inverse kinematics via branch-and-bound rotation relaxation.

Reference: multibody/inverse_kinematics/global_inverse_kinematics.h — the
reference escapes IK's local minima by solving a mixed-integer program
whose continuous variables are (relaxed) link rotation matrices and whose
binaries partition SO(3) into McCormick regions; a posture is then
reconstructed from the relaxed rotations.

TPU-native design point: the same binary-sector relaxation on the PLANAR
rotation group (each link's cumulative angle a_i is represented by a unit
vector (c_i, s_i); binaries choose one of K circle sectors, each sector
adds its chord cut, an outer tangent polygon bounds the circle from
outside) driven by the in-house best-first branch-and-bound
(solvers/branch_and_bound.py) over QP relaxations.  The end-effector
position is LINEAR in the (c_i, s_i) unknowns, so the target cost is
convex and obstacle avoidance becomes a disjunctive (binary) choice of
separating half-plane — the classic mixed-integer obstacle model.  A
short Gauss-Newton polish reconstructs exact joint angles from the
relaxed circle points (the role of the reference's
ReconstructGeneralizedPositionSolution).

Scope: planar serial chains (the 3D extension partitions SO(3) instead of
S^1 with the identical B&B machinery).  Unlike multi-start NLP
(ik.solve_global_ik), this solver is START-FREE: it cannot be trapped by
a basin, which is exactly the property the reference's MIP buys.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np


def planar_global_ik_mip(
    link_lengths: Sequence[float],
    p_target,
    obstacles: Sequence[Tuple[np.ndarray, float]] = (),
    sectors: int = 8,
    tangents: int = 8,
    polish_iters: int = 40,
    dtype=None,
):
    """Globally solve planar IK: EE of an N-link chain to ``p_target``.

    The chain lives in the x-z plane with links hanging along -z at zero
    angle (matching the planar test arms): joint i rotates about +y, so
    R_y(a) maps the rest direction (0, -1) to (-sin a, -cos a) and the
    cumulative angle a_i places link i's tip at
    tip_i = tip_{i-1} + l_i * (-sin a_i, -cos a_i).

    obstacles: list of ((x, z), radius) circles that every JOINT point
    (link tip) must clear.

    Returns (q, info): joint angles (N,) — q_i = a_i - a_{i-1} — and a
    dict with the MIP stats, relaxed cost, and polished EE error.
    """
    from drake_tpu.solvers.program import MathematicalProgram, Variables

    L = [float(l) for l in link_lengths]
    n = len(L)
    t = np.asarray(p_target, float).reshape(2)

    prog = MathematicalProgram()
    cs = prog.NewContinuousVariables(2 * n, "cs")  # [c_1, s_1, ..., c_n, s_n]
    y = prog.NewBinaryVariables(n * sectors, "sector")
    # One 4-way half-plane disjunction per (joint point, obstacle).
    n_disj = 4
    w_list = [
        prog.NewBinaryVariables(n_disj, "side")
        for _ in range(len(obstacles) * n)
    ]

    span = Variables(0, prog.num_vars, "all")

    def full_row(pairs):
        """Sparse row over the full variable span: pairs = [(idx, coef)]."""
        row = np.zeros(prog.num_vars)
        for idx, coef in pairs:
            row[idx] = coef
        return row

    # Per-angle circle relaxation.
    BIG_M = 2.0
    for i in range(n):
        ci, si = cs.start + 2 * i, cs.start + 2 * i + 1
        prog.AddBoundingBoxConstraint(
            -1.0, 1.0, Variables(ci, 2, f"cs{i}")
        )
        # Outer tangent polygon: c cos(phi) + s sin(phi) <= 1.
        for m in range(tangents):
            phi = 2 * math.pi * (m + 0.5) / tangents
            prog.AddLinearConstraint(
                full_row([(ci, math.cos(phi)), (si, math.sin(phi))])[None],
                [-np.inf], [1.0], span,
            )
        # Sector chord cuts (big-M gated): y_k = 1 forces
        # c cos(mid_k) + s sin(mid_k) >= cos(pi / sectors), written as
        # c cos + s sin - M y_k >= chord - M.
        chord = math.cos(math.pi / sectors)
        for k in range(sectors):
            mid = -math.pi + (2 * k + 1) * math.pi / sectors
            yk = y.start + i * sectors + k
            prog.AddLinearConstraint(
                full_row(
                    [(ci, math.cos(mid)), (si, math.sin(mid)), (yk, -BIG_M)]
                )[None],
                [chord - BIG_M], [np.inf], span,
            )
        # Exactly one sector.
        prog.AddLinearEqualityConstraint(
            full_row(
                [(y.start + i * sectors + k, 1.0) for k in range(sectors)]
            )[None],
            [1.0], span,
        )

    # Joint point j (tip of link j) = sum_{i<=j} l_i (-s_i, -c_i): linear.
    def point_rows(j):
        rx = full_row(
            [(cs.start + 2 * i + 1, -L[i]) for i in range(j + 1)]
        )
        rz = full_row(
            [(cs.start + 2 * i, -L[i]) for i in range(j + 1)]
        )
        return rx, rz

    # Obstacle disjunctions: for each (joint point, obstacle), one of 4
    # axis-aligned half-planes  n_d . (p - o) >= r  must hold.
    reach = sum(L)
    M_OBS = 4.0 * reach + 4.0
    normals = [(1.0, 0.0), (-1.0, 0.0), (0.0, 1.0), (0.0, -1.0)]
    wi = 0
    for (o, r) in obstacles:
        o = np.asarray(o, float).reshape(2)
        for j in range(n):
            rx, rz = point_rows(j)
            w = w_list[wi]
            wi += 1
            for d, (nx, nz) in enumerate(normals):
                # w_d = 1 forces n_d . p >= r + n_d . o, big-M gated:
                # n_d . p - M w_d >= r + n_d . o - M.
                row = nx * rx + nz * rz
                row[w.start + d] -= M_OBS
                rhs = float(r + nx * o[0] + nz * o[1]) - M_OBS
                prog.AddLinearConstraint(
                    row[None], [rhs], [np.inf], span
                )
            prog.AddLinearConstraint(
                full_row([(w.start + d, 1.0) for d in range(n_disj)])[None],
                [1.0], [np.inf], span,
            )

    # Cost: || B cs - t ||^2, B the EE position map (linear in cs).
    rx, rz = point_rows(n - 1)
    B = np.stack([rx[: 2 * n], rz[: 2 * n]])
    prog.AddQuadraticCost(
        2.0 * B.T @ B, -2.0 * B.T @ t, cs, c=float(t @ t)
    )

    res = prog.Solve()
    info = {
        "mip_success": res.is_success(),
        "relaxed_cost": res.optimal_cost,
        **res.solver_info,
    }
    if not res.is_success():
        return None, info

    z = np.asarray(res.GetSolution(cs), float)
    a = np.array([math.atan2(z[2 * i + 1], z[2 * i]) for i in range(n)])
    q = np.diff(np.concatenate([[0.0], a]))

    # Gauss-Newton polish on the exact FK (the reference's posture
    # reconstruction role), keeping obstacle clearance with a projected
    # step: reject steps that enter an obstacle.
    def fk_points(qv):
        av = np.cumsum(qv)
        pts = np.zeros((n + 1, 2))
        for i in range(n):
            pts[i + 1] = pts[i] + L[i] * np.array(
                [-math.sin(av[i]), -math.cos(av[i])]
            )
        return pts, av

    def clear(qv):
        pts, _ = fk_points(qv)
        for (o, r) in obstacles:
            o = np.asarray(o, float)
            if np.any(np.linalg.norm(pts[1:] - o, axis=1) < r - 1e-9):
                return False
        return True

    for _ in range(polish_iters):
        pts, av = fk_points(q)
        err = pts[-1] - t
        if np.linalg.norm(err) < 1e-12:
            break
        # d tip / d q_k = sum_{i>=k} l_i (-cos a_i, sin a_i).
        J = np.zeros((2, n))
        for k in range(n):
            for i in range(k, n):
                J[:, k] += L[i] * np.array(
                    [-math.cos(av[i]), math.sin(av[i])]
                )
        dq = np.linalg.lstsq(J, -err, rcond=None)[0]
        alpha = 1.0
        while alpha > 1e-4:
            q_try = q + alpha * dq
            if clear(q_try):
                q = q_try
                break
            alpha *= 0.5

    pts, _ = fk_points(q)
    info["ee_error"] = float(np.linalg.norm(pts[-1] - t))
    info["clear"] = clear(q)
    return q, info
