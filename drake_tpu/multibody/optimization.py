"""Dynamics-aware optimization ingredients (multibody/optimization role).

Re-derivations of the reference's multibody/optimization/ components that
make physics quantities usable as MathematicalProgram costs/constraints:

  - ``centroidal_momentum``: the CentroidalMomentumConstraint quantity
    (reference: multibody/optimization/centroidal_momentum_constraint.h)
    h_WC(q, v) — spatial momentum about the instantaneous system CoM.
  - ``quaternion_integration_residual``: QuaternionIntegrationConstraint
    (quaternion_integration_constraint.h): z2 == z1 (x) exp(dt/2 w) up to
    the quaternion double cover.
  - ``add_static_equilibrium_constraints`` / ``StaticEquilibriumProblem``:
    static_equilibrium_problem.h — find (q, contact forces) with zero
    generalized-force residual, Coulomb-cone forces, and contact
    complementarity phi * f_n ~= 0.
  - ``sliding_friction_complementarity_residual``:
    sliding_friction_complementarity_constraint.h — split a contact force
    into static + sliding parts with the sliding part antiparallel to the
    tangential velocity.

All quantities are pure JAX functions of (q, v, forces), so they drop into
the program container's generic-constraint path (jax.grad supplies exact
derivatives — the role AutoDiffXd plays in the reference) and into rollout
losses directly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from drake_tpu.contact import sap
from drake_tpu.math import rotations
from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody import kinematics as kin


# ---------------------------------------------------------------------------
# Centroidal momentum.
# ---------------------------------------------------------------------------


def centroidal_momentum(model, params, q, v) -> jnp.ndarray:
    """Spatial momentum about the system CoM, in world: (6,) [h_ang; h_lin].

    The CalcSpatialMomentumInWorldAboutPoint role (multibody_plant.h) and
    the quantity constrained by CentroidalMomentumConstraint."""
    R_WB, p_WB = kin.forward_kinematics(model, params, q)
    V_W = kin.world_velocities(model, params, q, v)  # (nb, 6) about Bo
    m = params.mass
    total_mass = jnp.sum(m)
    p_com_W = p_WB + jnp.einsum("bij,bj->bi", R_WB, params.com)
    p_C = jnp.sum(m[:, None] * p_com_W, axis=0) / jnp.maximum(
        total_mass, 1e-12
    )
    w = V_W[:, :3]
    v_o = V_W[:, 3:]
    v_com = v_o + jnp.cross(w, p_com_W - p_WB)
    l_i = m[:, None] * v_com  # linear momentum per body
    # Rotational inertia about each body's CoM, re-expressed in world.
    I_W = jnp.einsum("bij,bjk,blk->bil", R_WB, params.inertia_com, R_WB)
    h_ang = jnp.sum(
        jnp.einsum("bij,bj->bi", I_W, w) + jnp.cross(p_com_W - p_C, l_i),
        axis=0,
    )
    h_lin = jnp.sum(l_i, axis=0)
    return jnp.concatenate([h_ang, h_lin])


def centroidal_momentum_residual(model, params, h_desired):
    """Constraint residual fn(q, v) = h_WC(q, v) - h_desired (6,)."""

    def residual(q, v):
        return centroidal_momentum(model, params, q, v) - h_desired

    return residual


# ---------------------------------------------------------------------------
# Quaternion integration.
# ---------------------------------------------------------------------------


def quaternion_integration_residual(z1, z2, w_B, dt):
    """Residual (4,) enforcing z2 == z1 (x) exp(dt/2 [0, w_B]), sign-free.

    The reference's QuaternionIntegrationConstraint with
    allow_quaternion_negation: the double cover is handled by flipping the
    prediction onto z2's hemisphere before subtracting."""
    z_pred = rotations.quat_integrate(z1, w_B, dt)
    s = jnp.sign(jnp.sum(z_pred * z2))
    s = jnp.where(s == 0, 1.0, s)
    return z2 - s * z_pred


# ---------------------------------------------------------------------------
# Static equilibrium.
# ---------------------------------------------------------------------------


def static_equilibrium_residual(
    model, params, scene, q, f_contact, tau_actuation=None
):
    """Generalized-force balance residual (nv,) at configuration q.

    f_contact: (nc, 3) contact forces in each contact frame (t1, t2, n),
    acting on body A (reaction on B).  Zero iff gravity/bias torques are
    balanced by contact forces + actuation."""
    nv = model.num_velocities
    dtype = q.dtype
    v0 = jnp.zeros(nv, dtype)
    bias = dyn.bias_forces(model, params, q, v0)  # gravity + (zero) Coriolis
    contact = scene.query(model, params, q)
    frames = []
    for c in range(contact.phi.shape[0]):
        n = contact.n_W[c]
        t1, t2 = _tangent_basis(n)
        frames.append(jnp.stack([t1, t2, n], axis=1))
    tau_c = jnp.zeros(nv, dtype)
    if contact.phi.shape[0]:
        J = sap.make_contact_jacobian(model, params, q, contact, frames)
        tau_c = jnp.einsum("cij,ci->j", J, f_contact)
    tau_a = (
        jnp.zeros(nv, dtype) if tau_actuation is None else tau_actuation
    )
    return bias - tau_c - tau_a


def _tangent_basis(n):
    """Two unit tangents orthogonal to n (same construction as the scene's
    contact_frame)."""
    ref = jnp.where(
        jnp.abs(n[0]) < 0.9,
        jnp.asarray([1.0, 0.0, 0.0], n.dtype),
        jnp.asarray([0.0, 1.0, 0.0], n.dtype),
    )
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(n, t1)
    return t1, t2


class StaticEquilibriumProblem:
    """Find (q, contact forces) in static equilibrium
    (static_equilibrium_problem.h role).

    Builds a MathematicalProgram with decision blocks q (nq) and per-contact
    forces f (nc*3, contact-frame (t1, t2, n)), subject to:
      - force balance: bias(q) = J(q)' f (+ actuation),
      - friction cones: mu^2 f_n^2 - ||f_t||^2 >= 0, f_n >= 0,
      - compliant complementarity: f_n = stiffness * max(-phi(q), 0), the
        pair's penalty force law, scaled by 1/sqrt(stiffness) and enforced
        to comp_tol.  The reference's bilinear phi*f_n row is degenerate
        for SQP (no LICQ); the compliant law selects the same physical
        solution smoothly.

    Start ``q_guess`` at (or slightly inside) contact: with every pair
    separated the force law's max(-phi, 0) has zero gradient and the NLP
    cannot discover contact on its own (the reference's SNOPT formulation
    has the same need for a touching initial guess).
    """

    def __init__(
        self,
        model,
        params,
        scene,
        q_guess,
        comp_tol: float = 1e-6,
        tau_actuation=None,
        q_bounds: Optional[Tuple] = None,
        f_guess=None,
    ):
        from drake_tpu.solvers.program import MathematicalProgram

        self.model = model
        self.params = params
        self.scene = scene
        nq = model.num_positions
        contact0 = scene.query(model, params, jnp.asarray(q_guess))
        nc = contact0.phi.shape[0]
        self.nc = nc
        prog = MathematicalProgram()
        self.q_var = prog.NewContinuousVariables(nq, "q")
        self.f_var = prog.NewContinuousVariables(max(3 * nc, 1), "f")
        prog.SetInitialGuess(self.q_var, q_guess)
        if q_bounds is not None:
            # Complementarity problems have spurious distant manifolds
            # (e.g. the flipped top-corner contact); a configuration box
            # around the guess keeps the NLP on the intended one — the
            # reference relies on good SNOPT guesses for the same reason.
            prog.AddBoundingBoxConstraint(q_bounds[0], q_bounds[1], self.q_var)
        if f_guess is None and nc:
            # Weight split over the contacts along each normal: a feasible-
            # ish starting point that keeps f_n in the cone interior.
            g = jnp.linalg.norm(jnp.asarray(params.gravity))
            fz = g * jnp.sum(params.mass) / max(nc, 1)
            f_guess = jnp.tile(jnp.asarray([0.0, 0.0, float(fz)]), (nc, 1))
        if f_guess is not None and nc:
            prog.SetInitialGuess(
                self.f_var, jnp.asarray(f_guess).reshape(3 * nc)
            )

        nv = model.num_velocities
        mdl, par, scn = model, params, scene

        # Generic constraints act on one contiguous block; (q, f) are
        # contiguous by construction, so constrain the stacked block.
        from drake_tpu.solvers.program import Variables

        zblock = Variables(
            self.q_var.start,
            self.q_var.size + self.f_var.size,
            "qf",
        )

        def balance(zf):
            q = zf[:nq]
            f = zf[nq : nq + 3 * nc].reshape(nc, 3) if nc else jnp.zeros(
                (0, 3), zf.dtype
            )
            return static_equilibrium_residual(
                mdl, par, scn, q, f, tau_actuation
            )

        prog.AddConstraint(balance, jnp.zeros(nv), jnp.zeros(nv), zblock)

        if nc:
            def cones(zf):
                f = zf[nq : nq + 3 * nc].reshape(nc, 3)
                q = zf[:nq]
                contact = scn.query(mdl, par, q)
                mu = contact.friction
                fn = f[:, 2]
                ft2 = f[:, 0] ** 2 + f[:, 1] ** 2
                cone = mu**2 * fn**2 - ft2
                # Compliant complementarity: the normal force equals the
                # penalty force of the pair's combined stiffness,
                # f_n = k * max(-phi, 0).  This replaces the reference's
                # bilinear phi*f_n <= tol row (which is degenerate for SQP
                # — no LICQ at the solution) with a smooth-enough equality
                # that has a unique physical manifold; penetration at
                # equilibrium is the compliant delta = f_n / k, matching
                # the discrete plant's contact model.
                phi = contact.phi
                # Scaled by sqrt(k): the geometric mean between force
                # units (Jacobian wrt q would be O(k) — ill-conditioned)
                # and metre units (rows O(1e-6) — invisible to the l1
                # merit next to the O(10 N) balance rows).
                s = jnp.sqrt(contact.stiffness)
                comp = fn / s - s * jnp.maximum(-phi, 0.0)
                return jnp.concatenate([fn, cone, comp])

            lo = jnp.concatenate(
                [
                    jnp.zeros(nc),  # f_n >= 0
                    jnp.zeros(nc),  # cone
                    jnp.full(nc, -comp_tol),  # compliant force law
                ]
            )
            hi = jnp.concatenate(
                [
                    jnp.full(nc, jnp.inf),
                    jnp.full(nc, jnp.inf),
                    jnp.full(nc, comp_tol),
                ]
            )
            prog.AddConstraint(cones, lo, hi, zblock)
        self.prog = prog

    def Solve(self, **kw):
        from drake_tpu.solvers.program import Solve

        return Solve(self.prog, **kw)

    def GetContactForces(self, result) -> jnp.ndarray:
        f = result.GetSolution(self.f_var)
        return jnp.asarray(f)[: 3 * self.nc].reshape(self.nc, 3)


# ---------------------------------------------------------------------------
# Manipulator-equation constraint + contact wrench evaluation.
# ---------------------------------------------------------------------------


def manipulator_equation_residual(
    model, params, scene, q, v, vdot, f_contact, tau_actuation=None
):
    """Residual (nv,) of the manipulator equations with explicit contact
    forces (manipulator_equation_constraint.h role):

        M(q) vdot + C(q, v) - B u - sum_c Jc(q)' f_c  =  0

    f_contact: (nc, 3) per-contact forces in the contact frame (t1, t2, n),
    acting on body A.  Used as a trajopt equality row so the optimizer
    co-decides (q, v, vdot, u, f) — the reference evaluates the same
    expression with AutoDiffXd; here jax.grad supplies exact derivatives."""
    nv = model.num_velocities
    dtype = q.dtype
    M = dyn.mass_matrix(model, params, q)
    bias = dyn.bias_forces(model, params, q, v)
    contact = scene.query(model, params, q)
    tau_c = jnp.zeros(nv, dtype)
    if contact.phi.shape[0]:
        frames = []
        for c in range(contact.phi.shape[0]):
            t1, t2 = _tangent_basis(contact.n_W[c])
            frames.append(jnp.stack([t1, t2, contact.n_W[c]], axis=1))
        J = sap.make_contact_jacobian(model, params, q, contact, frames)
        tau_c = jnp.einsum("cij,ci->j", J, f_contact)
    tau_a = jnp.zeros(nv, dtype) if tau_actuation is None else tau_actuation
    return M @ vdot + bias - tau_a - tau_c


def contact_wrench_on_body(model, params, scene, q, f_contact, body: int):
    """Spatial wrench (6,) = [torque; force] that the contact set applies to
    ``body``, about the world origin (contact_wrench_evaluator.h role).

    f_contact: (nc, 3) contact-frame forces on body A of each pair; body B
    receives the reaction."""
    contact = scene.query(model, params, q)
    dtype = q.dtype
    w = jnp.zeros(6, dtype)
    for c in range(contact.phi.shape[0]):
        t1, t2 = _tangent_basis(contact.n_W[c])
        F = jnp.stack([t1, t2, contact.n_W[c]], axis=1)  # frame cols
        f_W = F @ f_contact[c]
        sign = jnp.asarray(
            (1.0 if contact.body_a[c] == body else 0.0)
            - (1.0 if contact.body_b[c] == body else 0.0),
            dtype,
        )
        tau = jnp.cross(contact.p_W[c], f_W)
        w = w + sign * jnp.concatenate([tau, f_W])
    return w


# ---------------------------------------------------------------------------
# Sliding-friction complementarity.
# ---------------------------------------------------------------------------


def sliding_friction_complementarity_residual(
    f_total, f_static, f_sliding, v_t, mu, c_tol: float = 0.0
):
    """Residuals for the sliding/static force split
    (sliding_friction_complementarity_constraint.h).

    f = f_static + f_sliding; the sliding part must oppose the tangential
    velocity with magnitude mu*f_n; the static part is complementary to
    slip speed.  Returns a residual vector to pin at zero (equalities) —
    callers bound the complementarity rows by c_tol."""
    split = f_total - f_static - f_sliding
    # Sliding part antiparallel to v_t: f_sliding_t + mu*fn_sliding*v_t/|v_t|.
    speed = jnp.linalg.norm(v_t)
    dirn = v_t / jnp.maximum(speed, 1e-9)
    anti = f_sliding[:2] + mu * f_sliding[2] * dirn
    # Static part complementary to slip: |v_t| * f_static ~= 0.
    comp = speed * f_static
    return jnp.concatenate([split, anti, comp])
