"""SAP: Semi-Analytic Primal solver for discrete frictional contact.

Re-derivation of Drake's SAP contact solver (Castro, Permenter, Han 2021,
arXiv:2110.10107 — cited at reference multibody/contact_solvers/sap/
sap_model.h:210-213) as a pure jittable function.  The reference pipeline
(SapDriver::CalcContactProblemCache sap_driver.cc:785 → SapSolver::
SolveWithGuess sap_solver.cc:228, supernodal sparse Cholesky + rtsafe exact
line search) becomes:

    v_next = argmin_v  1/2 (v - v*)' A (v - v*) + sum_i l_i(J_i v)

with per-contact regularized friction-cone costs.  TPU design:
  - dense H = A + J' G J and Cholesky solves (nv <= ~20 per robot — dense
    beats sparse supernodal on MXU, and everything vmaps over scenes),
  - per-contact projection gamma = P_R(y) in closed form; its derivative
    G = -dgamma/dvc via jacfwd (exact, replaces hand-coded Hessian blocks),
  - exact line search by guarded Newton/bisection on dcost/dalpha
    (the rtsafe logic of sap_solver.cc:580, as a fixed-iteration while_loop),
  - gradients via the implicit-function theorem at the optimum
    (custom_vjp), exactly the reference's approach for AutoDiffXd
    (sap_solver.cc:137-211).

Point-contact regularization (sap_friction_cone_constraint.h:19-64 semantics):
    Rn = max( 1/(h k (h + tau_d)),  beta^2/(4 pi^2) * w )
    Rt = sigma * w
    vhat_n = -phi0 / (h + tau_d)      (clamped in the near-rigid regime)
with w the per-contact Delassus diagonal scale, sigma = 1e-3, beta = 1.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_tpu.geometry.scene import CollisionScene, contact_frame
from drake_tpu.math import rotations as rot
from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.model import _NV, MultibodyModel, MultibodyParams


@dataclasses.dataclass(frozen=True)
class SapParameters:
    beta: float = 1.0  # near-rigid parameter (sap_solver.h:44)
    sigma: float = 1e-3  # friction regularization (sap_solver.h:63)
    rel_tolerance: float = 1e-6  # momentum residual tolerance
    max_iterations: int = 30
    # Points per level of the two-level vectorized line search (see
    # _solve_sap_core): resolution ~ alpha_max / points^2 + secant.
    line_search_points: int = 16
    alpha_max: float = 1.5
    # Planning-grade fast path: when > 0, run EXACTLY this many Newton
    # iterations as a fixed-length lax.scan (no while_loop — so no
    # batch-max lockstep under vmap and far fewer dispatched ops) with a
    # single-level line search.  Use for MPC-internal rollouts
    # (derivative and line-search passes) while the real state advance
    # keeps the full converged solver; the custom_vjp IFT gradients stay
    # exact at whatever point the fast path reaches.
    unroll_iterations: int = 0
    # Contact-constraint model (DiscreteContactApproximation role,
    # multibody_plant.h:230): "cone" = regularized friction-cone projection
    # (kSap); "hc_lagged"/"hc_similar" = the convex Hunt-Crossley
    # approximations (kLagged/kSimilar, sap_hunt_crossley_constraint.h:
    # gamma_n/dt = (fe0 + dt k xdot)+ (1 + d xdot)+ with regularized
    # friction via the soft tangential norm).
    contact_model: str = "cone"
    # Stiction velocity tolerance for the HC soft norm (Drake's
    # stiction_tolerance default, 1e-4 m/s).
    stiction_tolerance: float = 1e-4
    # Contact-jacobian formulation: "jacfwd" (fastest through the MPC's
    # outer jacrev: 1,084 vs 1,015/959 solves/s for the analytic forms at
    # B=1024) or "analytic" (matmul-shaped intermediates, no 6.3x-padded
    # per-contact temps, halves generated code).  NOTE neither fits a
    # B=2048 MPC program in 16 GiB HBM — peak temp is dominated by the
    # iLQR linearization live ranges, ~14 MiB/lane in every formulation
    # (benchmarks/crash_forensics.py ladder; BASELINE.md round 4) — so
    # B=1024/chip is the committed capacity and batch scales ACROSS chips
    # (scenario sharding, __graft_entry__.dryrun_multichip).
    contact_jacobian: str = "jacfwd"


class HcData(NamedTuple):
    """Per-contact Hunt-Crossley constraint data (the InvariantData of
    sap_hunt_crossley_constraint.h:19-38).  All (nc,) arrays."""

    k: jnp.ndarray  # contact stiffness
    d: jnp.ndarray  # Hunt-Crossley dissipation (s/m)
    fe0: jnp.ndarray  # previous-step elastic force k*x0 (signed)
    n0: jnp.ndarray  # previous-step normal impulse (for kLagged friction)
    eps: jnp.ndarray  # soft-norm regularization epsilon_s
    h: jnp.ndarray  # time step (replicated per contact for clean vmaps)


class SapData(NamedTuple):
    """Assembled convex problem (the SapContactProblem analog).

    Contact constraints plus one-sided joint-limit constraints
    (sap_limit_constraint.h role): limits act as 1-D frictionless contacts
    with velocity rows J_lim and bias vhat_lim."""

    A: jnp.ndarray  # (nv, nv) dynamics matrix
    v_star: jnp.ndarray  # (nv,) free-motion velocity
    J: jnp.ndarray  # (nc, 3, nv) contact Jacobians (rows t1, t2, n)
    R: jnp.ndarray  # (nc, 3) regularization diag (Rt, Rt, Rn)
    vhat: jnp.ndarray  # (nc, 3) bias velocity (0, 0, vhat_n)
    mu: jnp.ndarray  # (nc,) friction
    J_lim: jnp.ndarray  # (nl, nv) limit rows (+e_j lower, -e_j upper)
    R_lim: jnp.ndarray  # (nl,)
    vhat_lim: jnp.ndarray  # (nl,)
    J_eq: jnp.ndarray  # (ne, nv) two-sided holonomic rows (couplers,
    # distance/ball/weld constraints)
    R_eq: jnp.ndarray  # (ne,)
    vhat_eq: jnp.ndarray  # (ne,)
    J_pd: jnp.ndarray  # (npd, nv) implicit-PD actuation rows (e_j)
    R_pd: jnp.ndarray  # (npd,) 1/(h (Kp h + Kd))
    vhat_pd: jnp.ndarray  # (npd,) servo bias velocity
    glim_pd: jnp.ndarray  # (npd,) impulse bound h * effort_limit
    hc: Optional[HcData] = None  # Hunt-Crossley data (contact_model="hc_*")


class SapSolution(NamedTuple):
    v: jnp.ndarray  # (nv,) next-step generalized velocity
    gamma: jnp.ndarray  # (nc, 3) contact impulses in contact frames
    iterations: jnp.ndarray
    momentum_residual: jnp.ndarray


# ---------------------------------------------------------------------------
# Per-contact projection: gamma(vc) and cost.
# ---------------------------------------------------------------------------


def _project_gamma(y, R, mu):
    """Projection of y onto the friction cone in the R-metric (closed form).

    y: (3,) unprojected impulse [yt1, yt2, yn]; R: (3,) diag (Rt, Rt, Rn).
    Regions (standard R-metric cone projection):
      stiction:   ||yt|| <= mu * yn           -> gamma = y
      no contact: yn <= -(mu Rt / Rn) ||yt||  -> gamma = 0
      sliding:    boundary, gamma_n = (Rt mu ||yt|| + Rn yn)/(Rt mu^2 + Rn)
    """
    Rt, Rn = R[0], R[2]
    yt = y[:2]
    yn = y[2]
    yr = jnp.sqrt(yt @ yt + 1e-30)
    mu_hat = mu * Rt / Rn

    gn_slide = (Rt * mu * yr + Rn * yn) / (Rt * mu**2 + Rn)
    t_hat = yt / yr
    gamma_slide = jnp.concatenate([mu * gn_slide * t_hat, gn_slide[None]])

    stiction = yr <= mu * yn
    separate = yn <= -mu_hat * yr
    gamma = jnp.where(
        stiction, y, jnp.where(separate, jnp.zeros_like(y), gamma_slide)
    )
    return gamma


def _contact_cost(vc, R, vhat, mu):
    """l(vc) = 1/2 gamma' R gamma with gamma = P_R((vhat - vc)/R).

    The R-metric projection identity gives d l / d vc = -gamma.
    """
    y = (vhat - vc) / R
    gamma = _project_gamma(y, R, mu)
    return 0.5 * jnp.sum(gamma * R * gamma), gamma


# ---------------------------------------------------------------------------
# Hunt-Crossley convex approximations (kLagged / kSimilar).
#
# Re-derivation of sap_hunt_crossley_constraint.{h,cc} (Castro, Han,
# Masterjohn 2023, arXiv:2312.03908): the discrete normal impulse is
#   n(vn) = h (fe0 - h k vn)+ (1 - d vn)+,
# friction is regularized through the soft norm ||vt||_s = sqrt(|vt|^2 +
# eps^2) - eps.  The whole constraint is expressed HERE as one scalar cost
# l(vc); impulses are -dl/dvc and the 3x3 Hessian block d2l/dvc2 comes from
# autodiff — replacing the reference's hand-coded DoCalcImpulse /
# DoCalcCostHessian (sap_hunt_crossley_constraint.cc:116-260) with the
# closed-form antiderivative N (cc:68-114) only.
# ---------------------------------------------------------------------------


def _hc_antiderivative(h, k, d, fe0, vn):
    """N(vn): antiderivative of n, constant past v_hat = min(vx, vd)."""
    vd = 1.0 / (d + 1e-20)
    vx = fe0 / h / (k + 1e-20)
    v_hat = jnp.minimum(vx, vd)
    v = jnp.minimum(vn, v_hat)
    df = -h * k * v
    return h * (
        v * (fe0 + 0.5 * df) - d * v * v / 2.0 * (fe0 + 2.0 / 3.0 * df)
    )


def _hc_cost(vc, mu, hc_i, similar: bool):
    """Scalar convex cost of one Hunt-Crossley contact at velocity vc.

    hc_i: per-contact HcData leaf tuple (k, d, fe0, n0, eps, h).
    kSimilar: l = -N(z), z = vn - mu ||vt||_s  (friction from current n(z)).
    kLagged:  l = -N(vn) + mu ||vt||_s n0      (friction from lagged n0).
    """
    k, d, fe0, n0, eps, h = hc_i
    vt = vc[:2]
    vn = vc[2]
    vt_soft = jnp.sqrt(vt @ vt + eps * eps) - eps
    if similar:
        z = vn - mu * vt_soft
        return -_hc_antiderivative(h, k, d, fe0, z)
    return -_hc_antiderivative(h, k, d, fe0, vn) + mu * vt_soft * n0


def _hc_gamma(vc, mu, hc_i, similar: bool):
    """Impulse gamma = -dl/dvc (exact; n(z) and the soft tangent emerge
    from differentiating the antiderivative-based cost)."""
    return -jax.grad(_hc_cost)(vc, mu, hc_i, similar)


# ---------------------------------------------------------------------------
# Problem assembly.
# ---------------------------------------------------------------------------


def make_contact_jacobian(
    model, params, q, contact, scene_frames, method: str = "jacfwd"
):
    """J: (nc, 3, nv) mapping v -> contact-frame relative velocity of A wrt B.

    Two formulations of the same linear map (bit-compatible outputs):

    - ``"jacfwd"`` (default): forward-mode jacobian of the per-contact
      point-velocity loop.  The fastest form through the MPC's outer
      jacrev at the committed operating scales (measured: 1,084 vs 1,015
      solves/s for the analytic form at B=1024, BASELINE.md round 4) and
      the best-quality numerics — but under second-order AD its
      per-contact jnp.cross graphs materialize (..., 1, 3)-shaped HLO
      temps that pad 6.3x on TPU tiling: ~20 x 624 MB live at B=2048,
      crashing the worker (benchmarks/crash_forensics.py memory_analysis).

    - ``"analytic"``: build J from the tree's world spatial jacobians
      (kin.world_velocity_jacobians) with matmul-shaped intermediates —
      no padded temps, half the generated code, ~11% slower end-to-end at
      B=1024 (gathers trade compute for live buffers).  Neither form fits
      B=2048 in HBM (see SapParameters.contact_jacobian); select with
      profile_mpc.py --analytic-jacobian.
    """
    nv = model.num_velocities
    dtype = q.dtype
    nc = contact.phi.shape[0]
    if nc == 0:
        return jnp.zeros((0, 3, nv), dtype)

    if method == "analytic":
        J_W = kin.world_velocity_jacobians(model, params, q)  # (nb, 6, nv)
        _, p_WB = kin.forward_kinematics(model, params, q)
        # Pad a zero jacobian/origin at index nb for world-anchored sides.
        nb = model.num_bodies
        J_pad = jnp.concatenate([J_W, jnp.zeros((1, 6, nv), dtype)], axis=0)
        p_pad = jnp.concatenate([p_WB, jnp.zeros((1, 3), dtype)], axis=0)
        idx_a = jnp.asarray(
            [b if b >= 0 else nb for b in contact.body_a], jnp.int32
        )
        idx_b = jnp.asarray(
            [b if b >= 0 else nb for b in contact.body_b], jnp.int32
        )

        def point_jacs(idx):
            Jb = J_pad[idx]  # (nc, 6, nv)
            r = contact.p_W - p_pad[idx]  # (nc, 3)
            # Jp = Jv + [w]x r per column  ==  Jv - [r]x Jw, as one batched
            # matmul: skew(r) (nc, 3, 3) @ Jw (nc, 3, nv).
            zero = jnp.zeros_like(r[:, 0])
            skew = jnp.stack(
                [
                    jnp.stack([zero, -r[:, 2], r[:, 1]], axis=-1),
                    jnp.stack([r[:, 2], zero, -r[:, 0]], axis=-1),
                    jnp.stack([-r[:, 1], r[:, 0], zero], axis=-1),
                ],
                axis=-2,
            )  # (nc, 3, 3)
            return Jb[:, 3:] - jnp.einsum("cij,cjv->civ", skew, Jb[:, :3])

        Jp = point_jacs(idx_a) - point_jacs(idx_b)  # (nc, 3, nv)
        frames = jnp.stack(list(scene_frames))  # (nc, 3, 3) [t1 t2 n] cols
        return jnp.einsum("cji,cjv->civ", frames, Jp)

    def contact_vel_all(v):
        V_W = kin.world_velocities(model, params, q, v)  # (nb, 6)
        _, p_WB = kin.forward_kinematics(model, params, q)

        def point_vel(body, p_W):
            if body < 0:
                return jnp.zeros(3, dtype)
            w = V_W[body, :3]
            vo = V_W[body, 3:]
            return vo + jnp.cross(w, p_W - p_WB[body])

        vcs = []
        for c in range(nc):
            va = point_vel(contact.body_a[c], contact.p_W[c])
            vb = point_vel(contact.body_b[c], contact.p_W[c])
            vcs.append(scene_frames[c].T @ (va - vb))  # (3,) [t1, t2, n]
        return jnp.stack(vcs)

    # contact_vel_all is linear in v: its jacobian is exact via jacfwd.
    return jax.jacfwd(contact_vel_all)(jnp.zeros(nv, dtype))

def assemble(
    model: MultibodyModel,
    params: MultibodyParams,
    scene: CollisionScene,
    q,
    v0,
    tau_applied,
    h: float,
    sap_params: SapParameters = SapParameters(),
    external_forces_W=None,
    joint_limits=None,  # optional (q_lower (nv,), q_upper (nv,)) arrays
    couplers=None,  # optional list of (joint_name_a, joint_name_b, ratio, offset)
    ball_constraints=None,  # [(body_a, p_AP (3,), body_b, p_BQ (3,)), ...]
    distance_constraints=None,  # [(body_a, p_AP, body_b, p_BQ, d0), ...]
    weld_constraints=None,  # [(body_a, R_AP, p_AP, body_b, R_BQ, p_BQ), ...]
    pd_controllers=None,  # (specs, qd, vd, u_ff); specs = ((joint, Kp, Kd, e_lim), ...)
) -> tuple:
    """Build SapData at (q, v0) — the SapDriver::CalcContactProblemCache role."""
    dtype = q.dtype
    nv = model.num_velocities

    M = dyn.mass_matrix(model, params, q)
    # Implicit joint damping: A = M + h D  (Drake's linearized dynamics).
    D = jnp.zeros(nv, dtype)
    for i, jt in enumerate(model.joint_types):
        vo = model.v_offsets[i]
        nvi = _NV[jt]  # full joint zoo (revolute/prismatic/ball/planar/screw/...)
        if nvi and jt != "floating":
            # Per-dof viscous damping on every velocity of the joint (Drake
            # applies Joint::damping() to each dof; floating bodies default 0).
            D = D.at[vo : vo + nvi].set(params.damping[i])
    A = M + h * jnp.diag(D)
    # Bias WITHOUT damping (damping handled implicitly in A).
    C = dyn.bias_forces(model, params, q, v0, external_forces_W) - D * v0
    p0 = M @ v0 + h * (tau_applied - C)
    v_star = jnp.linalg.solve(A, p0)

    contact = scene.query(model, params, q)
    frames = contact_frame(contact.n_W)  # (nc, 3, 3)
    frames_list = [frames[c] for c in range(contact.phi.shape[0])]
    J = make_contact_jacobian(
        model, params, q, contact, frames_list,
        method=sap_params.contact_jacobian,
    )

    # Delassus diagonal scale per contact: w = tr(J A^-1 J')/3.
    A_inv_Jt = jnp.linalg.solve(A, J.reshape(-1, nv).T).T.reshape(J.shape)
    W_diag = jnp.einsum("cik,cjk->cij", J, A_inv_Jt)
    w = jnp.trace(W_diag, axis1=1, axis2=2) / 3.0

    k = contact.stiffness
    tau_d = contact.dissipation
    Rn_phys = 1.0 / (h * k * (h + tau_d))
    Rn_near_rigid = sap_params.beta**2 / (4.0 * jnp.pi**2) * w
    Rn = jnp.maximum(Rn_phys, Rn_near_rigid)
    Rt = sap_params.sigma * w
    R = jnp.stack([Rt, Rt, Rn], axis=1)

    # Bias: push out at the rate the compliant law dictates; in the
    # near-rigid regime Drake clamps the time scale to h.
    t_scale = jnp.where(Rn_phys >= Rn_near_rigid, h + tau_d, h)
    vhat_n = -contact.phi / t_scale
    vhat = jnp.stack([jnp.zeros_like(vhat_n), jnp.zeros_like(vhat_n), vhat_n], axis=1)

    # Hunt-Crossley invariant data (contact_model="hc_lagged"/"hc_similar",
    # sap_hunt_crossley_constraint.cc MakeData): fe0 = k x0 (signed, so
    # still-separated pairs engage only if they approach fast enough —
    # speculative contact), n0 = h fe0+ (1 - d vn0)+ at the previous
    # velocity, eps = max(stiction_tol, mu Rt n0).  The scene's dissipation
    # parameter is interpreted as the HC d (s/m) under these models.
    if sap_params.contact_model != "cone":
        fe0 = -k * contact.phi
        vn0 = jnp.einsum("cij,j->ci", J, v0)[:, 2]
        d_hc = tau_d
        n0 = h * jnp.maximum(fe0, 0.0) * jnp.maximum(1.0 - d_hc * vn0, 0.0)
        eps = jnp.maximum(
            sap_params.stiction_tolerance, contact.friction * Rt * n0
        )
        hc = HcData(
            k=k, d=d_hc, fe0=fe0, n0=n0, eps=eps,
            h=jnp.full_like(fe0, h),
        )
    else:
        hc = None

    # One-sided joint-limit constraints (sap_limit_constraint role): for each
    # 1-dof joint, phi_lower = q - ql >= 0 with row +e_j, phi_upper = qu - q
    # with row -e_j; near-rigid regularization from the Delassus scale.
    if joint_limits is not None:
        q_lower, q_upper = joint_limits
        # Map each v index to its q value (1-dof joints only).
        q_of_v = jnp.zeros(nv, dtype)
        sel = []
        for i, jt in enumerate(model.joint_types):
            if jt in ("revolute", "prismatic"):
                q_of_v = q_of_v.at[model.v_offsets[i]].set(q[model.q_offsets[i]])
                sel.append(model.v_offsets[i])
        sel = jnp.asarray(sel, jnp.int32) if sel else jnp.zeros(0, jnp.int32)
        eye = jnp.eye(nv, dtype=dtype)
        J_lim = jnp.concatenate([eye[sel], -eye[sel]], axis=0)
        phi_lim = jnp.concatenate(
            [q_of_v[sel] - q_lower[sel], q_upper[sel] - q_of_v[sel]]
        )
        w_lim = jnp.einsum(
            "lv,vw,lw->l", J_lim, jnp.linalg.inv(A), J_lim
        )
        R_lim = sap_params.beta**2 / (4.0 * jnp.pi**2) * w_lim
        vhat_lim = -phi_lim / h
    else:
        J_lim = jnp.zeros((0, nv), dtype)
        R_lim = jnp.zeros((0,), dtype)
        vhat_lim = jnp.zeros((0,), dtype)

    # Two-sided holonomic equality family (sap_coupler/distance/ball/weld
    # constraint roles, sap_driver.cc:383,423,512,607): each contributes
    # rows g = J v with position error phi, regularized near-rigid and
    # biased vhat = -phi/h (Baumgarte at the rate SAP's near-rigid analysis
    # allows).
    eq_rows, eq_phis = [], []

    # Couplers: q_a = rho q_b + offset.
    for name_a, name_b, rho, offset in couplers or ():
        ia = model.joint_names.index(name_a)
        ib = model.joint_names.index(name_b)
        va_, vb_ = model.v_offsets[ia], model.v_offsets[ib]
        qa_, qb_ = model.q_offsets[ia], model.q_offsets[ib]
        eq_rows.append(jnp.zeros(nv, dtype).at[va_].set(1.0).at[vb_].set(-rho))
        eq_phis.append(q[qa_] - rho * q[qb_] - offset)

    if ball_constraints or distance_constraints or weld_constraints:
        R_WB, p_WB = kin.forward_kinematics(model, params, q)

        def point_pos(body, p_B):
            p_B = jnp.asarray(p_B, dtype)
            if body < 0:
                return p_B
            return p_WB[body] + R_WB[body] @ p_B

        def rel_point_vel(body_a, p_WP, body_b, p_WQ):
            """v -> world velocity of P (on A) minus Q (on B); linear."""

            def f(v):
                V_W = kin.world_velocities(model, params, q, v)

                def pv(body, p_W):
                    if body < 0:
                        return jnp.zeros(3, dtype)
                    return V_W[body, 3:] + jnp.cross(
                        V_W[body, :3], p_W - p_WB[body]
                    )

                return pv(body_a, p_WP) - pv(body_b, p_WQ)

            return f

        def rel_ang_vel(body_a, body_b):
            def f(v):
                V_W = kin.world_velocities(model, params, q, v)
                wa = V_W[body_a, :3] if body_a >= 0 else jnp.zeros(3, dtype)
                wb = V_W[body_b, :3] if body_b >= 0 else jnp.zeros(3, dtype)
                return wa - wb

            return f

        z = jnp.zeros(nv, dtype)

        # Ball: points P (on A) and Q (on B) coincide — 3 rows.
        for body_a, p_AP, body_b, p_BQ in ball_constraints or ():
            p_WP, p_WQ = point_pos(body_a, p_AP), point_pos(body_b, p_BQ)
            J3 = jax.jacfwd(rel_point_vel(body_a, p_WP, body_b, p_WQ))(z)
            phi3 = p_WP - p_WQ
            for r_ in range(3):
                eq_rows.append(J3[r_])
                eq_phis.append(phi3[r_])

        # Distance: |P - Q| = d0 — 1 row along the line of centers.
        for body_a, p_AP, body_b, p_BQ, d0 in distance_constraints or ():
            p_WP, p_WQ = point_pos(body_a, p_AP), point_pos(body_b, p_BQ)
            d_vec = p_WP - p_WQ
            dist = jnp.sqrt(d_vec @ d_vec + 1e-14)
            n_hat = d_vec / dist
            J3 = jax.jacfwd(rel_point_vel(body_a, p_WP, body_b, p_WQ))(z)
            eq_rows.append(n_hat @ J3)
            eq_phis.append(dist - d0)

        # Weld: frame P (on A) coincides with frame Q (on B) — 6 rows
        # (3 rotational via the SO(3) log, 3 translational).
        for body_a, R_AP, p_AP, body_b, R_BQ, p_BQ in weld_constraints or ():
            R_AP = jnp.asarray(R_AP, dtype)
            R_BQ = jnp.asarray(R_BQ, dtype)
            R_WP = R_WB[body_a] @ R_AP if body_a >= 0 else R_AP
            R_WQ = R_WB[body_b] @ R_BQ if body_b >= 0 else R_BQ
            p_WP, p_WQ = point_pos(body_a, p_AP), point_pos(body_b, p_BQ)
            Jw = jax.jacfwd(rel_ang_vel(body_a, body_b))(z)
            phi_rot = rot.rotation_log(R_WP @ R_WQ.T)
            J3 = jax.jacfwd(rel_point_vel(body_a, p_WP, body_b, p_WQ))(z)
            phi3 = p_WP - p_WQ
            for r_ in range(3):
                eq_rows.append(Jw[r_])
                eq_phis.append(phi_rot[r_])
            for r_ in range(3):
                eq_rows.append(J3[r_])
                eq_phis.append(phi3[r_])

    if eq_rows:
        J_eq = jnp.stack(eq_rows)
        phi_eq = jnp.stack(eq_phis)
        w_eq = jnp.einsum("lv,vw,lw->l", J_eq, jnp.linalg.inv(A), J_eq)
        # Degenerate rows (e.g. the out-of-plane axis of a planar loop
        # closure) have w = 0, which would make R = 0 and poison the solve
        # with 0/0 — floor w at a small fraction of the largest row scale.
        w_floor = 1e-8 * jnp.max(w_eq) + 1e-14
        w_eq = jnp.maximum(w_eq, w_floor)
        R_eq = sap_params.beta**2 / (4.0 * jnp.pi**2) * w_eq
        vhat_eq = -phi_eq / h
    else:
        J_eq = jnp.zeros((0, nv), dtype)
        R_eq = jnp.zeros((0,), dtype)
        vhat_eq = jnp.zeros((0,), dtype)

    # Implicit PD actuation with effort limits (sap_pd_controller_constraint
    # role, sap_driver.cc:708): tau = clamp(Kp (qd - q_next) + Kd (vd - v)
    # + u_ff, +-e_lim) solved implicitly in v (q_next = q + h v), i.e.
    # gamma = clip((vhat - v_j)/R, +-h e_lim) with R = 1/(h (Kp h + Kd)).
    if pd_controllers is not None:
        specs, qd_des, vd_des, u_ff = pd_controllers
        pd_rows, pd_vhat, pd_R, pd_glim = [], [], [], []
        for k, (jname, Kp, Kd, e_lim) in enumerate(specs):
            ij = model.joint_names.index(jname)
            vo, qo = model.v_offsets[ij], model.q_offsets[ij]
            denom = Kp * h + Kd
            if float(denom) <= 0.0:
                raise ValueError(
                    f"pd controller on '{jname}': Kp*h + Kd must be > 0"
                )
            pd_rows.append(jnp.zeros(nv, dtype).at[vo].set(1.0))
            pd_vhat.append(
                (Kp * (qd_des[k] - q[qo]) + Kd * vd_des[k] + u_ff[k]) / denom
            )
            pd_R.append(jnp.asarray(1.0 / (h * denom), dtype))
            pd_glim.append(jnp.asarray(h * e_lim, dtype))
        J_pd = jnp.stack(pd_rows)
        vhat_pd = jnp.stack(pd_vhat)
        R_pd = jnp.stack(pd_R)
        glim_pd = jnp.stack(pd_glim)
    else:
        J_pd = jnp.zeros((0, nv), dtype)
        R_pd = jnp.zeros((0,), dtype)
        vhat_pd = jnp.zeros((0,), dtype)
        glim_pd = jnp.zeros((0,), dtype)

    data = SapData(
        A=A, v_star=v_star, J=J, R=R, vhat=vhat, mu=contact.friction,
        J_lim=J_lim, R_lim=R_lim, vhat_lim=vhat_lim,
        J_eq=J_eq, R_eq=R_eq, vhat_eq=vhat_eq,
        J_pd=J_pd, R_pd=R_pd, vhat_pd=vhat_pd, glim_pd=glim_pd,
        hc=hc,
    )
    return data, contact


# ---------------------------------------------------------------------------
# The convex Newton solve.
# ---------------------------------------------------------------------------


def _limit_gamma(data: SapData, v):
    """One-sided limit impulses: gamma_l = max(0, (vhat - J v)/R)."""
    vc_l = data.J_lim @ v
    return jnp.maximum((data.vhat_lim - vc_l) / data.R_lim, 0.0)


def _eq_gamma(data: SapData, v):
    """Two-sided holonomic impulses (sap_coupler/ball/weld constraint role):
    gamma_e = (vhat - J v)/R, no projection (always active)."""
    return (data.vhat_eq - data.J_eq @ v) / data.R_eq


def _pd_gamma(data: SapData, v):
    """Effort-limited implicit-PD impulses (sap_pd_controller_constraint
    role): gamma = clip((vhat - v_j)/R, -h e_lim, +h e_lim)."""
    y = (data.vhat_pd - data.J_pd @ v) / data.R_pd
    return jnp.clip(y, -data.glim_pd, data.glim_pd)


def _pd_cost(data: SapData, v):
    """Antiderivative of -gamma_pd w.r.t. vc: R (c^2/2 + c (y - c)) with
    c = clip(y); quadratic inside the effort box, linear outside."""
    y = (data.vhat_pd - data.J_pd @ v) / data.R_pd
    c = jnp.clip(y, -data.glim_pd, data.glim_pd)
    return jnp.sum(data.R_pd * (0.5 * c * c + c * (y - c)))


def _total_cost(data: SapData, v,
                sap_params: "SapParameters" = None):
    p = sap_params or SapParameters()
    dv = v - data.v_star
    cost = 0.5 * dv @ (data.A @ dv)
    vc = jnp.einsum("cij,j->ci", data.J, v)
    if p.contact_model == "cone":
        costs, gammas = jax.vmap(_contact_cost)(vc, data.R, data.vhat, data.mu)
    else:
        similar = p.contact_model == "hc_similar"
        costs = jax.vmap(lambda v1, m1, hc1: _hc_cost(v1, m1, hc1, similar))(
            vc, data.mu, data.hc
        )
        gammas = jax.vmap(lambda v1, m1, hc1: _hc_gamma(v1, m1, hc1, similar))(
            vc, data.mu, data.hc
        )
    if data.R_lim.shape[0]:
        gl = _limit_gamma(data, v)
        cost = cost + 0.5 * jnp.sum(data.R_lim * gl * gl)
    if data.R_eq.shape[0]:
        ge = _eq_gamma(data, v)
        cost = cost + 0.5 * jnp.sum(data.R_eq * ge * ge)
    if data.R_pd.shape[0]:
        cost = cost + _pd_cost(data, v)
    return cost + jnp.sum(costs), gammas


def _solve_sap_core(data: SapData, v_guess, sap_params: SapParameters):
    """Newton with exact-ish line search, op-count-optimized for TPU.

    The reference's per-iteration cost profile (sap_solver.cc:228-340:
    Hessian factorization + rtsafe scalar line search) is the wrong shape for
    a TPU, where each small batched op carries fixed dispatch latency and the
    cost is op COUNT, not FLOPs.  Two restructurings (measured 28 ms -> ~6 ms
    per batched step at batch 256):

      - ONE grad/Hessian evaluation per Newton iteration: the residual check
        reuses the next iteration's gradient (carried through the loop)
        instead of recomputing it.
      - The rtsafe sequential line search (20 iterations x 3 full-constraint
        evaluations with J matvecs) becomes a TWO-LEVEL VECTORIZED search on
        f(alpha) = dcost/dalpha, which is monotone increasing (the cost is
        convex): precompute the directional quantities dvc = J dv once (the
        CalcCostAlongLine trick, sap_solver.cc:345), then evaluate f on a
        K-point alpha grid in ONE batched op, bracket the sign change, refine
        with a second K-point grid inside the bracket, and finish with a
        secant step.  Resolution ~ alpha_max/K^2 plus secant — tighter than
        20 rtsafe iterations in practice, at ~2 batched ops instead of ~60
        sequential constraint evaluations.
    """
    nv = v_guess.shape[0]
    dtype = v_guess.dtype
    p = sap_params

    similar = p.contact_model == "hc_similar"
    if p.contact_model == "cone":

        def gamma_one(vc1, R1, vhat1, mu1, hc1):
            return _project_gamma((vhat1 - vc1) / R1, R1, mu1)

    else:

        def gamma_one(vc1, R1, vhat1, mu1, hc1):
            return _hc_gamma(vc1, mu1, hc1, similar)

    hc_args = (
        data.hc
        if data.hc is not None
        else HcData(*([jnp.zeros_like(data.mu)] * 6))
    )

    def gamma_all(vc_all):  # (nc, 3) -> (nc, 3)
        return jax.vmap(gamma_one)(vc_all, data.R, data.vhat, data.mu, hc_args)

    def G_all(vc_all):  # (nc, 3) -> (nc, 3, 3): G = -dgamma/dvc (PSD)
        return -jax.vmap(jax.jacfwd(gamma_one))(
            vc_all, data.R, data.vhat, data.mu, hc_args
        )

    has_lim = bool(data.R_lim.shape[0])
    has_eq = bool(data.R_eq.shape[0])
    has_pd = bool(data.R_pd.shape[0])

    def grad_and_hess(v):
        vc = jnp.einsum("cij,j->ci", data.J, v)
        gammas = gamma_all(vc)
        # G_i = -dgamma/dvc (3x3, PSD); exact via jacfwd of the projection.
        Gs = G_all(vc)
        grad = data.A @ (v - data.v_star) - jnp.einsum("cij,ci->j", data.J, gammas)
        H = data.A + jnp.einsum("cik,ckl,clj->ij",
                                jnp.swapaxes(data.J, 1, 2), Gs, data.J)
        if has_lim:
            gl = _limit_gamma(data, v)
            grad = grad - data.J_lim.T @ gl
            G_l = (gl > 0).astype(v.dtype) / data.R_lim
            H = H + (data.J_lim.T * G_l) @ data.J_lim
        if has_eq:
            ge = _eq_gamma(data, v)
            grad = grad - data.J_eq.T @ ge
            H = H + (data.J_eq.T / data.R_eq) @ data.J_eq
        if has_pd:
            gp = _pd_gamma(data, v)
            grad = grad - data.J_pd.T @ gp
            y_pd = (data.vhat_pd - data.J_pd @ v) / data.R_pd
            act = (jnp.abs(y_pd) < data.glim_pd).astype(v.dtype)
            H = H + (data.J_pd.T * (act / data.R_pd)) @ data.J_pd
        return grad, H, gammas

    momentum_scale = jnp.linalg.norm(data.A @ data.v_star) + 1e-12

    def exact_line_search(v, dv):
        """Two-level vectorized bracketing + secant on f(a) = dcost/dalpha."""
        # Directional precompute: f(a) needs only O(nc) work per alpha.
        Adv = data.A @ dv
        a0 = dv @ (data.A @ (v - data.v_star))
        a1 = dv @ Adv
        vc0 = jnp.einsum("cij,j->ci", data.J, v)
        dvc = jnp.einsum("cij,j->ci", data.J, dv)
        if has_lim:
            vl0, dvl = data.J_lim @ v, data.J_lim @ dv
        if has_eq:
            ve0, dve = data.J_eq @ v, data.J_eq @ dv
        if has_pd:
            vp0, dvp = data.J_pd @ v, data.J_pd @ dv

        def f(alphas):  # vectorized over a (K,) alpha grid
            al = alphas[:, None, None]
            g = jax.vmap(gamma_all)(vc0[None] + al * dvc[None])  # (K, nc, 3)
            out = a0 + alphas * a1 - jnp.einsum("kci,ci->k", g, dvc)
            if has_lim:
                gl = jnp.maximum(
                    (data.vhat_lim - (vl0[None] + alphas[:, None] * dvl[None]))
                    / data.R_lim,
                    0.0,
                )
                out = out - gl @ dvl
            if has_eq:
                ge = (
                    data.vhat_eq - (ve0[None] + alphas[:, None] * dve[None])
                ) / data.R_eq
                out = out - ge @ dve
            if has_pd:
                gp = jnp.clip(
                    (data.vhat_pd - (vp0[None] + alphas[:, None] * dvp[None]))
                    / data.R_pd,
                    -data.glim_pd,
                    data.glim_pd,
                )
                out = out - gp @ dvp
            return out

        K = p.line_search_points

        def refine(lo, hi):
            """One grid level: bracket the sign change of monotone f."""
            alphas = lo + (hi - lo) * jnp.linspace(0.0, 1.0, K).astype(dtype)
            fs = f(alphas)
            # Last index with f < 0 (f(lo) <= 0 by construction).
            i = jnp.maximum(jnp.sum(fs < 0) - 1, 0)
            return alphas[i], alphas[jnp.minimum(i + 1, K - 1)], fs[i], fs[
                jnp.minimum(i + 1, K - 1)
            ]

        zero = jnp.asarray(0.0, dtype)
        amax = jnp.asarray(p.alpha_max, dtype)
        lo2, hi2, flo, fhi = refine(zero, amax)
        if p.unroll_iterations <= 0:
            lo2, hi2, flo, fhi = refine(lo2, hi2)
        # Secant finish inside the final bracket.
        denom = fhi - flo
        alpha = lo2 - flo * (hi2 - lo2) / jnp.where(
            jnp.abs(denom) > 1e-20, denom, 1.0
        )
        alpha = jnp.clip(alpha, lo2, hi2)
        # If f(alpha_max) <= 0 the cost still decreases at the cap: take it.
        return jnp.where(fhi <= 0, amax, alpha)

    if p.unroll_iterations > 0:
        # Fixed-iteration planning path: a lax.scan with no convergence
        # gating.  Under vmap every lane does the same (small) amount of
        # work instead of locking to the slowest lane's while_loop count.
        def body_fixed(v, _):
            grad, H, _ = grad_and_hess(v)
            L = jax.scipy.linalg.cho_factor(H)
            dv = -jax.scipy.linalg.cho_solve(L, grad)
            alpha = exact_line_search(v, dv)
            # Branch-free NaN safeguard: with no convergence gating, one
            # ill-conditioned f32 factorization in one vmapped lane would
            # otherwise poison its whole MPC scenario.  A zero step leaves
            # the lane at its previous (finite) iterate.
            step = alpha * dv
            ok = jnp.all(jnp.isfinite(step))
            v_new = jnp.where(ok, v + step, v)
            # Residual diagnostic: gradient norm where this step was taken
            # (one iterate stale — avoids an extra grad/Hessian build).
            return v_new, jnp.linalg.norm(grad)

        v, grad_norms = jax.lax.scan(
            body_fixed, v_guess, None, length=p.unroll_iterations
        )
        vc = jnp.einsum("cij,j->ci", data.J, v)
        gammas = gamma_all(vc)
        res = grad_norms[-1] / momentum_scale
        return SapSolution(
            v=v,
            gamma=gammas,
            iterations=jnp.array(p.unroll_iterations),
            momentum_residual=res,
        )

    def body(state):
        v, grad, H, it, res = state
        L = jax.scipy.linalg.cho_factor(H)
        dv = -jax.scipy.linalg.cho_solve(L, grad)
        alpha = exact_line_search(v, dv)
        step = alpha * dv
        # Same branch-free NaN safeguard as the fixed path: a poisoned lane
        # keeps its previous iterate (and runs out the iteration budget)
        # instead of returning NaN velocities into the plant step.
        v_new = jnp.where(jnp.all(jnp.isfinite(step)), v + step, v)
        grad_new, H_new, _ = grad_and_hess(v_new)
        res_new = jnp.linalg.norm(grad_new) / momentum_scale
        return (v_new, grad_new, H_new, it + 1, res_new)

    def cond(state):
        _, _, _, it, res = state
        return jnp.logical_and(res > p.rel_tolerance, it < p.max_iterations)

    grad0, H0, _ = grad_and_hess(v_guess)
    res0 = jnp.linalg.norm(grad0) / momentum_scale
    v, _, _, it, res = jax.lax.while_loop(
        cond, body, (v_guess, grad0, H0, jnp.array(0), res0)
    )
    vc = jnp.einsum("cij,j->ci", data.J, v)
    gammas = gamma_all(vc)
    return SapSolution(v=v, gamma=gammas, iterations=it, momentum_residual=res)


# Implicit-function-theorem gradients at the optimum (sap_solver.cc:137-211's
# role).  residual g(v; data) = A(v - v*) - J' gamma(J v) = 0 at the solution;
# dv = -H^{-1} dg for perturbations of data.
@partial(jax.custom_vjp, nondiff_argnums=(2,))
def solve_sap(data: SapData, v_guess, sap_params: SapParameters = SapParameters()):
    return _solve_sap_core(data, v_guess, sap_params)


def _solve_fwd(data, v_guess, sap_params):
    sol = _solve_sap_core(data, v_guess, sap_params)
    return sol, (data, sol.v)


def _solve_bwd(sap_params, res, cot):
    data, v = res
    cot_v = cot.v  # only propagate through the velocity output

    def residual(data_, v_):
        vc = jnp.einsum("cij,j->ci", data_.J, v_)
        if sap_params.contact_model == "cone":
            gammas = jax.vmap(
                lambda vc_, R, vhat, mu: _project_gamma((vhat - vc_) / R, R, mu)
            )(vc, data_.R, data_.vhat, data_.mu)
        else:
            similar_ = sap_params.contact_model == "hc_similar"
            gammas = jax.vmap(
                lambda v1, m1, hc1: _hc_gamma(v1, m1, hc1, similar_)
            )(vc, data_.mu, data_.hc)
        r = data_.A @ (v_ - data_.v_star) - jnp.einsum(
            "cij,ci->j", data_.J, gammas
        )
        if data_.R_lim.shape[0]:
            r = r - data_.J_lim.T @ _limit_gamma(data_, v_)
        if data_.R_eq.shape[0]:
            r = r - data_.J_eq.T @ _eq_gamma(data_, v_)
        if data_.R_pd.shape[0]:
            r = r - data_.J_pd.T @ _pd_gamma(data_, v_)
        return r

    H = jax.jacfwd(lambda v_: residual(data, v_))(v)
    w = jnp.linalg.solve(H.T, cot_v)
    _, vjp_data = jax.vjp(lambda d: residual(d, v), data)
    (data_bar,) = vjp_data(-w)
    zero_guess = jnp.zeros_like(v)
    return (data_bar, zero_guess)


solve_sap.defvjp(_solve_fwd, _solve_bwd)
