"""Compass gait: passive dynamic walking down a slope (hybrid limit cycle).

Reference examples/compass_gait/ (compass_gait.h/.cc: two-link passive
walker with a heel-strike witness; default params mass_hip=10, mass_leg=5,
length_leg=1, center_of_mass_leg=0.5, slope=0.0525).

TPU-native twist: BOTH the continuous dynamics and the heel-strike impact
map are derived from the Lagrangian by autodiff at trace time — no
hand-transcribed M/C/G or impact matrices (the classic source of compass
gait sign bugs).  Continuous: Euler-Lagrange via jacobians of the momentum
form.  Impact: conservation of (a) whole-walker angular momentum about the
new contact point and (b) trailing-leg angular momentum about the hip,
assembled as two linear forms in qdot via jacfwd.

Angles are measured from the ramp normal; x points down-slope.

Checks: the walker settles into the known passive limit cycle (post-impact
Poincare state converges), every heel strike dissipates energy, and the
average forward speed is positive.

Run:  python examples/compass_gait.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=14)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from drake_tpu.systems.base import ContinuousSystem
    from drake_tpu.systems.simulator import WitnessFunction, simulate_hybrid

    dtype = jnp.float64 if args.cpu else jnp.float32

    # Drake defaults (compass_gait_params.named_vector).
    m, mh, a, b = 5.0, 10.0, 0.5, 0.5
    l = a + b
    gamma = 0.0525
    grav = 9.81
    # gravity in ramp coordinates (x down-slope, y ramp-normal)
    g_ramp = jnp.asarray([np.sin(gamma) * grav, -np.cos(gamma) * grav])

    def u_vec(th):
        return jnp.stack([jnp.sin(th), jnp.cos(th)])

    def mass_points(q):
        """Positions of the 3 point masses (stance-leg m, hip mh, swing m)
        relative to the stance foot, in ramp coordinates."""
        th1, th2 = q[0], q[1]
        p_a = a * u_vec(th1)
        p_h = l * u_vec(th1)
        p_b = p_h - b * u_vec(th2)
        return jnp.stack([p_a, p_h, p_b])  # (3, 2)

    masses = jnp.asarray([m, mh, m])

    def lagrangian(q, qd):
        J = jax.jacfwd(mass_points)(q)  # (3, 2, 2)
        v = jnp.einsum("pij,j->pi", J, qd)
        ke = 0.5 * jnp.sum(masses[:, None] * v * v)
        pe = -jnp.sum(masses[:, None] * mass_points(q) * g_ramp[None, :])
        return ke - pe

    def dynamics(params, x, u, t):
        q, qd = x[:2], x[2:]
        p_fn = lambda qd_: jax.grad(lagrangian, argnums=1)(q, qd_)
        M = jax.jacfwd(p_fn)(qd)
        dLdq = jax.grad(lagrangian, argnums=0)(q, qd)
        dpdq = jax.jacfwd(lambda q_: jax.grad(lagrangian, argnums=1)(q_, qd))(q)
        qdd = jnp.linalg.solve(M, dLdq - dpdq @ qd)
        return jnp.concatenate([qd, qdd])

    system = ContinuousSystem(f=dynamics, num_states=4, num_inputs=0)

    def cross2(p, v):
        return p[0] * v[1] - p[1] * v[0]

    def heel_strike(params, x, t):
        """Impact map: swap legs, conserve the two angular momenta."""
        q, qd = x[:2], x[2:]
        J = jax.jacfwd(mass_points)(q)
        P = mass_points(q)
        v = jnp.einsum("pij,j->pi", J, qd)
        c = l * u_vec(q[0]) - l * u_vec(q[1])  # new contact point
        # (1) whole walker about the new contact; (2) trailing leg (mass
        # index 0, the old stance leg) about the hip.
        L1 = jnp.sum(
            jnp.stack([masses[i] * cross2(P[i] - c, v[i]) for i in range(3)])
        )
        L2 = m * cross2(P[0] - P[1], v[0])

        q_new = jnp.stack([q[1], q[0]])  # labels swap (angles are absolute)

        def post_momenta(qd_new):
            Jn = jax.jacfwd(mass_points)(q_new)
            Pn = mass_points(q_new)
            vn = jnp.einsum("pij,j->pi", Jn, qd_new)
            L1n = jnp.sum(
                jnp.stack(
                    [masses[i] * cross2(Pn[i], vn[i]) for i in range(3)]
                )
            )  # new contact is the new origin
            # trailing leg is now the SWING leg (mass index 2) about the hip
            L2n = m * cross2(Pn[2] - Pn[1], vn[2])
            return jnp.stack([L1n, L2n])

        A_post = jax.jacfwd(post_momenta)(jnp.zeros(2, x.dtype))
        qd_new = jnp.linalg.solve(A_post, jnp.stack([L1, L2]))
        return jnp.concatenate([q_new, qd_new])

    def guard(params, x, t):
        """Swing-toe height above the ramp, disqualified until the
        inter-leg angle opens past 0.15 rad — the mid-stride scuff (both
        legs near the ramp normal, the equal-leg-length grazing crossing)
        must not count, exactly the reference witness's disqualification."""
        th1, th2 = x[0], x[1]
        y_sw = l * (jnp.cos(th1) - jnp.cos(th2))
        stride_open = (th1 - th2) > 0.15
        return jnp.where(stride_open, y_sw, jnp.ones_like(y_sw))

    witness = WitnessFunction(
        g=guard, reset=heel_strike, direction="positive_then_negative"
    )

    # Near-limit-cycle initial condition (the reference's passive-walking
    # demo start: legs vertical, hip rolling forward, swing leg swinging
    # through fast).
    x0 = jnp.asarray([0.0, 0.0, 0.4, -2.0], dtype)
    t_final, dt = 12.0, 2e-3
    xs, ts, counts = simulate_hybrid(
        system, None, x0, t_final, dt, witnesses=(witness,)
    )
    xs = np.asarray(xs)
    n_steps = int(counts[0])
    print(f"heel strikes: {n_steps} over {t_final}s")

    # Post-impact Poincare section: states right after each leg swap.
    swaps = np.where(np.abs(np.diff(xs[:, 0])) > 0.1)[0]
    post = xs[swaps + 1]
    print("post-impact states (th1, th2, th1d, th2d):")
    for p in post[-4:]:
        print(f"  [{p[0]:+.4f} {p[1]:+.4f} {p[2]:+.4f} {p[3]:+.4f}]")

    assert n_steps >= 8, "walker fell or stalled"
    # limit cycle: consecutive post-impact states converge
    d_last = np.linalg.norm(post[-1] - post[-2])
    d_first = np.linalg.norm(post[1] - post[0]) + 1e-12
    print(f"Poincare contraction: |dx| {d_first:.2e} -> {d_last:.2e}")
    assert d_last < 0.05, "did not settle into a limit cycle"

    # The plastic impact map must not ADD kinetic energy (KE is frame
    # independent; ramp-frame PE legitimately shifts with the new stance
    # origin — that's how the walker harvests the slope).
    def kinetic(x):
        q, qd = jnp.asarray(x[:2]), jnp.asarray(x[2:])
        J = jax.jacfwd(mass_points)(q)
        v = jnp.einsum("pij,j->pi", J, qd)
        return float(0.5 * jnp.sum(masses[:, None] * v * v))

    ke_loss = []
    for i in swaps[-3:]:
        x_pre = jnp.asarray(xs[i], dtype)
        x_post = heel_strike(None, x_pre, 0.0)
        ke_loss.append(kinetic(x_pre) - kinetic(x_post))
    print(f"impact KE losses: {[f'{e:.3f}' for e in ke_loss]} J")
    assert all(e > -1e-9 for e in ke_loss), "impact must not add energy"
    print("COMPASS GAIT OK: passive limit cycle at slope "
          f"{gamma:.4f} rad, {n_steps} steps")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
