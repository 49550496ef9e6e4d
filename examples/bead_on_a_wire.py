"""Bead on a wire: minimal coordinates vs constrained (DAE) coordinates.

Reference parity: examples/bead_on_a_wire/bead_on_a_wire.h — a unit point
mass constrained to a user-supplied parametric wire f(s): R -> R^3, with two
formulations: Lagrangian dynamics of the second kind (minimal coordinate s)
and of the first kind (absolute coordinates + Lagrange multipliers, an
index-3 DAE).  The reference hand-derives both; here BOTH are produced by
autodiff from the single wire function:

  - minimal:   L(s, sdot) = 1/2 |f'(s)|^2 sdot^2 - g f_z(s); the
               Euler-Lagrange equation's M(s), M'(s), V'(s) come from
               jax.grad — change the wire, get new dynamics for free.
  - absolute:  xddot = f_g + J^T lambda with Baumgarte-stabilized
               constraint c(x) = x - f(s(x)) (the index-1 reduction the
               reference discusses), J from jax.jacfwd.

The demo integrates both on a helix from the same initial condition and
checks (a) they agree, (b) energy is conserved in minimal coordinates,
(c) the Baumgarte drift stays bounded.

Run: python examples/bead_on_a_wire.py --cpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax
import jax.numpy as jnp

GRAV = 9.81
RADIUS, PITCH = 1.0, 0.25  # helix: f(s) = [r cos s, r sin s, p s]


def wire(s):
    return jnp.array([RADIUS * jnp.cos(s), RADIUS * jnp.sin(s), PITCH * s])


def minimal_dynamics(state):
    """sdot, sddot from the Euler-Lagrange equation, all via autodiff."""
    s, sdot = state
    fp = jax.jacfwd(wire)(s)                        # f'(s)
    mass = fp @ fp                                  # M(s) = |f'|^2
    dmass = jax.grad(lambda s: jax.jacfwd(wire)(s) @ jax.jacfwd(wire)(s))(s)
    dV = jax.grad(lambda s: GRAV * wire(s)[2])(s)
    sddot = (-0.5 * dmass * sdot**2 - dV) / mass
    return jnp.array([sdot, sddot])


def s_of_x(x):
    """Inverse wire parameterization (the reference's f^-1): s = z / pitch."""
    return x[2] / PITCH


def constrained_dynamics(state, alpha=20.0):
    """Absolute coordinates with Baumgarte-stabilized wire constraint."""
    x, v = state[:3], state[3:]
    c_fn = lambda x: x - wire(s_of_x(x))           # c(x) = 0 on the wire
    c = c_fn(x)
    J = jax.jacfwd(c_fn)(x)
    # d/dt (J v) = (dJ/dx v) v + J a;   get (dJ/dx v) v via jvp of J @ v.
    Jdot_v = jax.jvp(lambda x: jax.jacfwd(c_fn)(x) @ v, (x,), (v,))[1]
    a_free = jnp.array([0.0, 0.0, -GRAV])
    # Solve (J J^T) lam = -(Jdot v + J a_free + 2a cdot + a^2 c), m = 1.
    rhs = -(Jdot_v + J @ a_free + 2 * alpha * (J @ v) + alpha**2 * c)
    lam = jnp.linalg.solve(J @ J.T + 1e-12 * jnp.eye(3), rhs)
    a = a_free + J.T @ lam
    return jnp.concatenate([v, a])


def rk4(f, x, h):
    k1 = f(x); k2 = f(x + 0.5 * h * k1)
    k3 = f(x + 0.5 * h * k2); k4 = f(x + h * k3)
    return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def energy(s, sdot):
    fp = jax.jacfwd(wire)(s)
    return 0.5 * (fp @ fp) * sdot**2 + GRAV * wire(s)[2]


def main():
    h, n = 1e-3, 4000
    s0, sdot0 = 0.3, 2.0

    @jax.jit
    def roll_min(state):
        return jax.lax.scan(
            lambda st, _: (rk4(minimal_dynamics, st, h), st), state, None,
            length=n)[1]

    @jax.jit
    def roll_abs(state):
        return jax.lax.scan(
            lambda st, _: (rk4(constrained_dynamics, st, h), st), state, None,
            length=n)[1]

    s_traj = roll_min(jnp.array([s0, sdot0]))
    fp0 = jax.jacfwd(wire)(jnp.asarray(s0))
    x0 = jnp.concatenate([wire(jnp.asarray(s0)), fp0 * sdot0])
    x_traj = roll_abs(x0)

    e0 = float(energy(s_traj[0, 0], s_traj[0, 1]))
    e1 = float(energy(s_traj[-1, 0], s_traj[-1, 1]))
    print(f"minimal:  s {float(s_traj[0,0]):.3f} -> {float(s_traj[-1,0]):.3f}, "
          f"energy drift {abs(e1 - e0):.2e} over {n*h:.1f}s")

    x_min = jax.vmap(wire)(s_traj[:, 0])
    gap = float(jnp.max(jnp.linalg.norm(x_traj[:, :3] - x_min, axis=1)))
    drift = float(jnp.max(jnp.linalg.norm(
        jax.vmap(lambda x: x - wire(s_of_x(x)))(x_traj[:, :3]), axis=1)))
    print(f"absolute: max gap to minimal-coordinate path {gap:.2e}, "
          f"max constraint drift {drift:.2e}")

    assert abs(e1 - e0) < 1e-5, "energy not conserved in minimal coordinates"
    assert gap < 1e-3, "DAE path diverged from minimal-coordinate path"
    assert drift < 1e-6, "Baumgarte failed to hold the bead on the wire"
    print("BEAD ON A WIRE OK")


if __name__ == "__main__":
    main()
