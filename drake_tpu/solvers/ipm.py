"""Dense primal-dual interior-point QP solver (Mehrotra predictor-corrector).

The robustness backbone of the SQP stack.  The reference gets this robustness
from commercial/host solvers (SNOPT's QP core, OSQP, Mosek — reference:
solvers/).  On TPU we want a solver whose cost is a fixed, small number of
dense KKT factorizations — conditioning-insensitive (unlike first-order ADMM)
and fully batchable under vmap, so thousands of QPs solve in parallel on the
MXU.

    minimize    0.5 w'Pw + q'w
    subject to  G w = b
                lb <= w <= ub     (entries may be +-inf; handled by masks)

KKT system (masked bounds; sl, su slacks and zl, zu >= 0 duals):

    P w + q + G'y - zl + zu = 0
    G w - b                 = 0
    w - lb - sl             = 0        (rows with finite lb)
    ub - w - su             = 0        (rows with finite ub)
    sl.zl = mu_t,  su.zu = mu_t

Newton reduction:  dsl = dw + rl,  dsu = -dw + ru,
    dzl = (rhs_l - zl*dsl)/sl,  dzu = (rhs_u - zu*dsu)/su,
    rhs_l = mu_t - sl*zl - corr_l  (corr from Mehrotra's second-order term)
giving the quasidefinite system

    [[P + diag(zl/sl + zu/su), G'], [G, -reg I]] [dw, dy] = [-rd_bar, -rp]
    rd_bar = rd - (rhs_l - zl*rl)/sl + (rhs_u - zu*ru)/su

Infinite bounds are masked: their slacks pin to 1, duals to 0, contributing
nothing.  Iterations run under ``lax.while_loop`` with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class IpmOptions:
    max_iters: int = 30
    tol: float = 1e-9
    tau: float = 0.995  # fraction-to-boundary
    kkt_reg: float = 1e-9  # static regularization of the KKT system
    # f32 robustness knobs (leave at defaults for f64): iterative refinement
    # on each KKT solve recovers digits lost to barrier-induced conditioning;
    # d_max clamps the barrier diagonal z/s so the KKT condition number stays
    # within the dtype's reach (use refine_steps=1..2, d_max~1e6 for f32).
    # NOTE: clamping caps terminal accuracy — keep d_max >= 1e14 for f64.
    refine_steps: int = 0
    d_max: float = 1e14
    # Ruiz equilibration sweeps on the KKT data (OSQP-style: symmetric
    # diagonal scaling of [[P, G'], [G, 0]] towards unit row inf-norms plus
    # a cost normalization).  The single biggest f32 lever: dircol KKT
    # matrices mix time-step rows ~1e-2 with dynamics rows ~1e2, which eats
    # half the f32 mantissa before the barrier even starts.  0 = off.
    equilibrate: int = 0


class IpmSolution(NamedTuple):
    w: jnp.ndarray
    y: jnp.ndarray  # equality duals
    z_lower: jnp.ndarray  # duals for w >= lb (>= 0)
    z_upper: jnp.ndarray  # duals for w <= ub (>= 0)
    iterations: jnp.ndarray
    residual: jnp.ndarray
    converged: jnp.ndarray


def _ruiz_equilibrate(P, q, G, b, lb, ub, sweeps: int):
    """Diagonal scaling of the QP data towards unit KKT row norms.

    Returns (P^, q^, G^, b^, lb^, ub^, d, e, c) with the scaled problem in
    variables w^ = w / d; unscale via w = d*w^, y = e*y^/c, z = z^/(d*c).
    """
    dtype = q.dtype
    n, m = q.shape[0], b.shape[0]
    d = jnp.ones(n, dtype)
    e = jnp.ones(m, dtype)
    c = jnp.asarray(1.0, dtype)

    def sweep(_i, carry):
        P_, q_, G_, d, e, c = carry
        # Row inf-norms of the scaled KKT matrix [[P, G'], [G, 0]].
        rn = jnp.maximum(
            jnp.max(jnp.abs(P_), axis=1),
            jnp.max(jnp.abs(G_), axis=0) if m else jnp.zeros(n, dtype),
        )
        rm = jnp.max(jnp.abs(G_), axis=1) if m else jnp.zeros(0, dtype)
        sd = 1.0 / jnp.sqrt(jnp.clip(rn, 1e-12, 1e12))
        se = 1.0 / jnp.sqrt(jnp.clip(rm, 1e-12, 1e12))
        P_ = sd[:, None] * P_ * sd[None, :]
        q_ = sd * q_
        G_ = se[:, None] * G_ * sd[None, :]
        # Cost normalization (OSQP sec 5.1): gamma = 1/max(mean colnorm P, |q|).
        col = jnp.mean(jnp.max(jnp.abs(P_), axis=0))
        gamma = 1.0 / jnp.clip(
            jnp.maximum(col, jnp.max(jnp.abs(q_), initial=0.0)), 1e-8, 1e8
        )
        P_ = gamma * P_
        q_ = gamma * q_
        return (P_, q_, G_, d * sd, e * se, c * gamma)

    # fori_loop (while-lowered) — semantically identical to the earlier
    # lax.scan over sweeps.  NOTE: the round-4 crash forensics tested this
    # lowering as a candidate fix for the vmapped-Sl1QP worker fault
    # (crash class (b)) and it does NOT help — the fault is in the TPU
    # runtime, not the loop lowering (BASELINE.md round 4).
    P_, q_, G_, d, e, c = jax.lax.fori_loop(
        0, sweeps, sweep, (P, q, G, d, e, c)
    )
    b_ = e * b
    lb_ = lb / d  # +-inf stays +-inf
    ub_ = ub / d
    return P_, q_, G_, b_, lb_, ub_, d, e, c


def solve_qp_ipm(
    P, q, G, b, lb, ub, options: IpmOptions = IpmOptions()
) -> IpmSolution:
    """Solve the box/equality QP.  jit/vmap friendly; all shapes static.

    Traced under full-f32 matmul precision: TPU's default reduced-precision
    (bf16-pass) matmuls cannot reach the ~1e-8 complementarity residuals
    this solver asks for — the round-1 "0/32 feasible f32 dircol on TPU"
    failure was partly this.  Physics/MPC paths keep the fast default; only
    the NLP/QP stack pays for exactness.
    """
    with jax.default_matmul_precision("highest"):
        return _solve_qp_ipm_impl(P, q, G, b, lb, ub, options)


def _solve_qp_ipm_impl(
    P, q, G, b, lb, ub, options: IpmOptions = IpmOptions()
) -> IpmSolution:
    opts = options
    if opts.equilibrate:
        Ps, qs, Gs, bs, lbs, ubs, d_s, e_s, c_s = _ruiz_equilibrate(
            P, q, G, b, lb, ub, opts.equilibrate
        )
        inner = dataclasses.replace(options, equilibrate=0)
        sol = solve_qp_ipm(Ps, qs, Gs, bs, lbs, ubs, inner)
        w = d_s * sol.w
        y = e_s * sol.y / c_s
        zl = sol.z_lower / (d_s * c_s)
        zu = sol.z_upper / (d_s * c_s)
        # Report the UNSCALED residual so callers' tolerances mean what
        # they say.
        rd = P @ w + q + G.T @ y - zl + zu
        rp = G @ w - b
        scale = 1.0 + jnp.maximum(
            jnp.linalg.norm(q, ord=jnp.inf), jnp.linalg.norm(b, ord=jnp.inf)
        )
        res = (
            jnp.maximum(
                jnp.linalg.norm(rd, ord=jnp.inf),
                jnp.linalg.norm(rp, ord=jnp.inf),
            )
            / scale
        )
        return IpmSolution(
            w=w, y=y, z_lower=zl, z_upper=zu,
            iterations=sol.iterations, residual=res, converged=sol.converged,
        )
    dtype = q.dtype
    n = q.shape[0]
    m = b.shape[0]

    has_lb = jnp.isfinite(lb)
    has_ub = jnp.isfinite(ub)
    ml = has_lb.astype(dtype)
    mub = has_ub.astype(dtype)
    n_bounds = jnp.maximum(jnp.sum(ml) + jnp.sum(mub), 1.0)
    lb_safe = jnp.where(has_lb, lb, 0.0)
    ub_safe = jnp.where(has_ub, ub, 0.0)

    # Initial interior point.
    w = jnp.zeros(n, dtype)
    w = jnp.where(jnp.logical_and(has_lb, has_ub), 0.5 * (lb_safe + ub_safe), w)
    w = jnp.where(jnp.logical_and(has_lb, ~has_ub), lb_safe + 1.0, w)
    w = jnp.where(jnp.logical_and(~has_lb, has_ub), ub_safe - 1.0, w)
    sl = jnp.where(has_lb, jnp.maximum(w - lb_safe, 1.0), 1.0)
    su = jnp.where(has_ub, jnp.maximum(ub_safe - w, 1.0), 1.0)
    zl = ml * 1.0
    zu = mub * 1.0
    y = jnp.zeros(m, dtype)

    I_n = jnp.eye(n, dtype=dtype)
    I_m = jnp.eye(m, dtype=dtype)

    def residuals(w, y, zl, zu, sl, su):
        rd = P @ w + q + G.T @ y - zl + zu
        rp = G @ w - b
        rl = ml * (w - lb_safe - sl)
        ru = mub * (ub_safe - w - su)
        return rd, rp, rl, ru

    def body(state):
        w, y, zl, zu, sl, su, it, _, _ = state
        rd, rp, rl, ru = residuals(w, y, zl, zu, sl, su)
        mu = (jnp.sum(sl * zl) + jnp.sum(su * zu)) / n_bounds

        D = ml * zl / sl + mub * zu / su
        D = jnp.minimum(D, opts.d_max)
        K = jnp.block(
            [
                [P + jnp.diag(D) + opts.kkt_reg * I_n, G.T],
                [G, -opts.kkt_reg * I_m],
            ]
        )
        K_lu = jax.scipy.linalg.lu_factor(K)

        def kkt_solve(rhs):
            sol = jax.scipy.linalg.lu_solve(K_lu, rhs)
            for _ in range(opts.refine_steps):
                sol = sol + jax.scipy.linalg.lu_solve(K_lu, rhs - K @ sol)
            return sol

        def solve_dir(rhs_l, rhs_u):
            rd_bar = (
                rd
                - ml * (rhs_l - zl * rl) / sl
                + mub * (rhs_u - zu * ru) / su
            )
            sol = kkt_solve(jnp.concatenate([-rd_bar, -rp]))
            dw, dy = sol[:n], sol[n:]
            dsl = ml * (dw + rl)
            dsu = mub * (-dw + ru)
            dzl = ml * (rhs_l - zl * dsl) / sl
            dzu = mub * (rhs_u - zu * dsu) / su
            return dw, dy, dsl, dsu, dzl, dzu

        def max_step(v, dv, mask):
            ratio = jnp.where(
                jnp.logical_and(mask > 0, dv < 0),
                -opts.tau * v / jnp.minimum(dv, -1e-30),
                1.0,
            )
            return jnp.minimum(1.0, jnp.min(ratio))

        # Predictor (affine): mu_t = 0, no second-order correction.
        aff = solve_dir(-sl * zl, -su * zu)
        dw_a, dy_a, dsl_a, dsu_a, dzl_a, dzu_a = aff
        a_p = jnp.minimum(max_step(sl, dsl_a, ml), max_step(su, dsu_a, mub))
        a_d = jnp.minimum(max_step(zl, dzl_a, ml), max_step(zu, dzu_a, mub))
        mu_aff = (
            jnp.sum(ml * (sl + a_p * dsl_a) * (zl + a_d * dzl_a))
            + jnp.sum(mub * (su + a_p * dsu_a) * (zu + a_d * dzu_a))
        ) / n_bounds
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)
        mu_t = sigma * mu

        # Corrector with Mehrotra second-order terms.
        dw, dy, dsl, dsu, dzl, dzu = solve_dir(
            mu_t - sl * zl - dsl_a * dzl_a, mu_t - su * zu - dsu_a * dzu_a
        )
        a_p = jnp.minimum(max_step(sl, dsl, ml), max_step(su, dsu, mub))
        a_d = jnp.minimum(max_step(zl, dzl, ml), max_step(zu, dzu, mub))
        alpha = jnp.minimum(a_p, a_d)

        w = w + alpha * dw
        y = y + alpha * dy
        sl = jnp.where(has_lb, sl + alpha * dsl, 1.0)
        su = jnp.where(has_ub, su + alpha * dsu, 1.0)
        zl = jnp.where(has_lb, zl + alpha * dzl, 0.0)
        zu = jnp.where(has_ub, zu + alpha * dzu, 0.0)

        rd, rp, _, _ = residuals(w, y, zl, zu, sl, su)
        mu_new = (jnp.sum(sl * zl) + jnp.sum(su * zu)) / n_bounds
        scale = 1.0 + jnp.maximum(
            jnp.linalg.norm(q, ord=jnp.inf), jnp.linalg.norm(b, ord=jnp.inf)
        )
        res = (
            jnp.maximum(
                jnp.linalg.norm(rd, ord=jnp.inf), jnp.linalg.norm(rp, ord=jnp.inf)
            )
            / scale
        )
        done = jnp.logical_and(res <= opts.tol, mu_new <= opts.tol * scale)
        return (w, y, zl, zu, sl, su, it + 1, res, done)

    def cond(state):
        _, _, _, _, _, _, it, _, done = state
        return jnp.logical_and(~done, it < opts.max_iters)

    inf = jnp.asarray(jnp.inf, dtype)
    state = (w, y, zl, zu, sl, su, jnp.array(0), inf, jnp.array(False))
    w, y, zl, zu, sl, su, it, res, done = jax.lax.while_loop(cond, body, state)
    return IpmSolution(
        w=w, y=y, z_lower=zl, z_upper=zu, iterations=it, residual=res, converged=done
    )
