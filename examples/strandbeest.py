"""Strandbeest: one Jansen-linkage leg, built from the link/joint GRAPH.

Reference parity: examples/multibody/strandbeest/ — Theo Jansen's walking
linkage, the reference's showcase for kinematic loops (its model closes
loops with constraints after the parser builds a tree).  Here the mechanism
is declared as a LinkGraph WITH its three loops; the topology layer
(drake_tpu/multibody/topology.py — the multibody/topology graph->forest
role) picks a spanning forest and cuts the loop joints into SAP ball
constraints, and the classic circle-intersection construction seeds the
correct assembly branch (the linkage has 16 assembly branches; only this
one walks).

The leg (standard Jansen "holy numbers", cm -> m): crank m=15 about the
origin; fixed pivot P=(-38, -7.8); binary bars j, k from the crank pin;
rigid ternary plates (b,d,e) about P and (g,h,i) carrying the foot; bars
c (P->hip) and f (knee->ankle) complete the three loops.

Driving the crank at constant rate makes the foot trace the famous flat-
bottomed walking curve.  Checks: the three loops stay closed through 4 s
of SAP dynamics, the crank completes a revolution, and the foot path has
a long stride with a nearly flat lower stroke, entirely below the axle.

Run: python examples/strandbeest.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--f32", action="store_true", help="TPU mode")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
if not args.f32:
    jax.config.update("jax_enable_x64", True)

from drake_tpu.contact import plant as cplant
from drake_tpu.contact.sap import SapParameters
from drake_tpu.geometry.scene import CollisionScene
from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody import topology as topo

DT = jnp.float32 if args.f32 else jnp.float64

# Jansen's holy numbers (cm -> m).
S = 0.01
LEN_A, LEN_B, LEN_C, LEN_D = 38.0 * S, 41.5 * S, 39.3 * S, 40.1 * S
LEN_E, LEN_F, LEN_G, LEN_H = 55.8 * S, 39.4 * S, 36.7 * S, 65.7 * S
LEN_I, LEN_J, LEN_K, LEN_L, LEN_M = (49.0 * S, 50.0 * S, 61.9 * S,
                                     7.8 * S, 15.0 * S)
P_PIVOT = np.array([-LEN_A, -LEN_L])  # (x, z): the second fixed pivot
Y = (0.0, 1.0, 0.0)                   # the mechanism lives in the x-z plane


def _plate(r1, r2, opposite):
    """Second vertex of a rigid plate (origin, (r1,0,0), V2), CCW branch."""
    cphi = (r1**2 + r2**2 - opposite**2) / (2 * r1 * r2)
    sphi = np.sqrt(max(0.0, 1 - cphi**2))
    return (r2 * cphi, 0.0, r2 * sphi)


C_V = _plate(LEN_B, LEN_D, LEN_E)  # knee vertex of the top plate
F_V = _plate(LEN_G, LEN_I, LEN_H)  # foot vertex of the bottom plate


def _bar(g: topo.LinkGraph, name: str, length: float):
    m = 0.1 * length
    g.add_link(name, mass=m, com=(length / 2, 0, 0),
               inertia_com=np.diag([1e-5, m * length**2 / 12,
                                    m * length**2 / 12]))


def build_leg():
    g = topo.LinkGraph()
    g.add_link("crank", mass=0.2,
               inertia_com=np.diag([1e-5, 0.2 * LEN_M**2 / 3,
                                    0.2 * LEN_M**2 / 3]))
    _bar(g, "bar_j", LEN_J)
    _bar(g, "bar_k", LEN_K)
    _bar(g, "bar_c", LEN_C)
    _bar(g, "bar_f", LEN_F)
    # Ternary plates: frame at the pivot vertex, +x toward the 1st vertex.
    g.add_link("tri_top", mass=0.4, com=(0.15, 0, 0.15),
               inertia_com=np.diag([0.004, 0.008, 0.004]))
    g.add_link("tri_bot", mass=0.4, com=(0.1, 0, 0.1),
               inertia_com=np.diag([0.006, 0.012, 0.006]))

    tip = (LEN_M, 0.0, 0.0)
    piv = (P_PIVOT[0], 0.0, P_PIVOT[1])
    g.add_joint("world_crank", parent=topo.WORLD, child="crank", axis=Y)
    g.add_joint("crank_j", parent="crank", child="bar_j", axis=Y, p_PJ=tip)
    g.add_joint("crank_k", parent="crank", child="bar_k", axis=Y, p_PJ=tip)
    g.add_joint("world_tri_top", parent=topo.WORLD, child="tri_top",
                axis=Y, p_PJ=piv)
    g.add_joint("world_c", parent=topo.WORLD, child="bar_c", axis=Y,
                p_PJ=piv)
    # The three loops (cut by the spanning forest into ball constraints):
    g.add_joint("j_triTop", parent="bar_j", child="tri_top", axis=Y,
                p_PJ=(LEN_J, 0, 0), p_CJ=(LEN_B, 0, 0))
    g.add_joint("k_triBot", parent="bar_k", child="tri_bot", axis=Y,
                p_PJ=(LEN_K, 0, 0))
    g.add_joint("c_triBot", parent="bar_c", child="tri_bot", axis=Y,
                p_PJ=(LEN_C, 0, 0))
    g.add_joint("triTop_f", parent="tri_top", child="bar_f", axis=Y,
                p_PJ=C_V)
    g.add_joint("f_triBot", parent="bar_f", child="tri_bot", axis=Y,
                p_PJ=(LEN_F, 0, 0), p_CJ=(LEN_G, 0, 0))
    return g


def _circle_intersect(c1, r1, c2, r2, upper: bool):
    """(x,z)-plane circle-circle intersection, picking the upper/lower z."""
    d = np.linalg.norm(c2 - c1)
    if d > r1 + r2 or d < abs(r1 - r2):
        raise ValueError("linkage locked: circles do not intersect")
    a = (r1**2 - r2**2 + d**2) / (2 * d)
    h = np.sqrt(max(r1**2 - a**2, 0.0))
    mid = c1 + a * (c2 - c1) / d
    perp = np.array([-(c2 - c1)[1], (c2 - c1)[0]]) / d
    p1, p2 = mid + h * perp, mid - h * perp
    return p1 if (p1[1] > p2[1]) == upper else p2


def _rot_ccw(v, cphi, sphi):
    return np.array([cphi * v[0] - sphi * v[1], sphi * v[0] + cphi * v[1]])


def jansen_pose(psi: float, model) -> np.ndarray:
    """Joint angles of the WALKING branch at crank angle psi.

    The classic construction: B = circ(A,j) ∩ circ(P,b) upper;
    hip D = circ(A,k) ∩ circ(P,c) lower; knee C rigid (CCW) on the top
    plate; ankle E = circ(C,f) ∩ circ(D,g) lower; foot rigid on the
    bottom plate.  Joint angle = world angle − parent world angle, with
    R_y(θ)·x̂ = (cosθ, 0, −sinθ) ⇒ θ(d) = atan2(−d_z, d_x).
    """
    A = LEN_M * np.array([np.cos(psi), np.sin(psi)])
    B = _circle_intersect(A, LEN_J, P_PIVOT, LEN_B, upper=True)
    D = _circle_intersect(A, LEN_K, P_PIVOT, LEN_C, upper=False)
    cphi = (LEN_B**2 + LEN_D**2 - LEN_E**2) / (2 * LEN_B * LEN_D)
    C = P_PIVOT + LEN_D * _rot_ccw((B - P_PIVOT) / LEN_B, cphi,
                                   np.sqrt(1 - cphi**2))
    E = _circle_intersect(C, LEN_F, D, LEN_G, upper=False)

    theta = lambda d: np.arctan2(-d[1], d[0])
    th_crank = theta(A)
    th_top = theta((B - P_PIVOT) / LEN_B)
    th_c = theta((D - P_PIVOT) / LEN_C)
    th_j = theta((B - A) / LEN_J) - th_crank
    th_k = theta((D - A) / LEN_K) - th_crank
    th_f = theta((E - C) / LEN_F) - th_top
    th_bot = theta((E - D) / LEN_G) - th_c
    angles = {"crank": th_crank, "tri_top": th_top, "bar_c": th_c,
              "bar_j": th_j, "bar_k": th_k, "bar_f": th_f, "tri_bot": th_bot}
    return np.array([angles[n] for n in model.body_names])


def main():
    g = build_leg()
    model, params, balls, welds = g.build(DT)
    forest = g.spanning_forest()
    print(f"links: {len(model.body_names)}, tree joints: "
          f"{len(forest.tree_edges)}, cut loops: {len(forest.loop_joints)}")
    assert len(forest.loop_joints) == 3 and not welds

    nq = model.num_positions
    crank = model.body_index("crank")
    tri_bot = model.body_index("tri_bot")

    # Seed the walking branch from the construction, polish with assemble.
    q_seed = jnp.asarray(jansen_pose(np.pi / 3, model), jnp.float64)
    r0 = float(jnp.linalg.norm(
        topo.loop_residual(model, params, balls, q_seed.astype(DT))))
    q0, err = topo.assemble(model, params, balls, q_seed)
    print(f"construction residual {r0:.2e}; assembled {err:.2e}")
    assert err < 1e-8, "assembly failed"
    q0 = jnp.asarray(q0, DT)

    def foot_pos(q):
        R, p = kin.forward_kinematics(model, params, q)
        return p[tri_bot] + R[tri_bot] @ jnp.asarray(F_V, q.dtype)

    h = 2e-3
    dsys = cplant.make_discrete_system(
        model, params, CollisionScene.build([]), h,
        ball_constraints=balls,
        sap_params=SapParameters(max_iterations=40, rel_tolerance=1e-8),
    )
    omega, kp, kd = 2.0, 40.0, 4.0
    x = jnp.concatenate([q0, jnp.zeros(nq, DT)])

    @jax.jit
    def step(xx, t):
        th_des = q0[crank] - omega * t  # crank runs clockwise (−ψ rate)
        u = jnp.zeros(nq, DT).at[crank].set(
            kp * (th_des - xx[crank]) + kd * (-omega - xx[nq + crank]))
        return dsys.g(params, xx, u)

    n_steps = int(4.0 / h)
    feet, loop_errs = [], []
    t = jnp.asarray(0.0, DT)
    for i in range(n_steps):
        x = step(x, i * h)
        if i % 10 == 0:
            feet.append(np.asarray(foot_pos(x[:nq])))
            loop_errs.append(float(jnp.linalg.norm(
                topo.loop_residual(model, params, balls, x[:nq]))))
    feet = np.stack(feet)
    assert np.isfinite(np.asarray(x)).all()
    print(f"max loop error through dynamics: {max(loop_errs):.2e}")
    assert max(loop_errs) < 5e-3

    swept = abs(float(x[crank] - q0[crank]))
    print(f"crank swept {swept:.2f} rad")
    assert swept > 2 * np.pi  # at least one full revolution

    x_span = feet[:, 0].max() - feet[:, 0].min()
    z_span = feet[:, 2].max() - feet[:, 2].min()
    z_lo = np.percentile(feet[:, 2], 25)
    low = feet[feet[:, 2] <= z_lo]
    flat = low[:, 2].max() - low[:, 2].min()
    print(f"foot path: x span {x_span:.3f} m, z span {z_span:.3f} m, "
          f"zmax {feet[:, 2].max():.3f}, lower-quartile flatness "
          f"{flat * 1000:.1f} mm")
    assert x_span > 0.5            # the Jansen stride (~0.68 m)
    assert feet[:, 2].max() < -0.5  # foot stays well below the axle
    assert flat < 0.25 * z_span     # the famous flat ground stroke
    print("strandbeest leg OK")


if __name__ == "__main__":
    main()
