"""Mass-spring cloth — the examples/mass_spring_cloth analog.

A rectangular grid of point masses joined by structural + shear
spring-dampers, pinned at two corners, sagging under gravity.  The reference
implements this as a hand-written `System` with either continuous or
discrete dynamics (examples/mass_spring_cloth/cloth_spring_model.h); here it
is one pure `ContinuousSystem` whose force law is a vectorized
gather-over-edge-list, integrated both explicitly (RK4) and with the
implicit trapezoid rule — stiff springs are exactly why the implicit
integrators exist (systems/integrators.py).

Run: python examples/mass_spring_cloth.py [--cpu]
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
parser.add_argument("--n", type=int, default=8, help="masses per side")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
if not args.f32:
    jax.config.update("jax_enable_x64", True)

from drake_tpu.systems import base as sysbase
from drake_tpu.systems import simulator


def build_cloth(n, dtype, k=400.0, c=2.0, drag=0.1, mass=0.02,
                spacing=0.05):
    """Edges: structural (4-neighbor) + shear (diagonal) springs."""
    idx = lambda i, j: i * n + j
    edges, rest = [], []
    for i in range(n):
        for j in range(n):
            if i + 1 < n:
                edges.append((idx(i, j), idx(i + 1, j))); rest.append(spacing)
            if j + 1 < n:
                edges.append((idx(i, j), idx(i, j + 1))); rest.append(spacing)
            if i + 1 < n and j + 1 < n:
                edges.append((idx(i, j), idx(i + 1, j + 1)))
                rest.append(spacing * np.sqrt(2))
                edges.append((idx(i + 1, j), idx(i, j + 1)))
                rest.append(spacing * np.sqrt(2))
    edges = jnp.asarray(np.asarray(edges, np.int32))
    rest = jnp.asarray(np.asarray(rest), dtype)

    # Initial flat horizontal sheet; pin the two far corners of row 0.
    xs0 = np.stack(
        [
            np.repeat(np.arange(n), n) * spacing,
            np.tile(np.arange(n), n) * spacing,
            np.zeros(n * n),
        ],
        axis=1,
    )
    pinned = jnp.zeros(n * n, dtype).at[idx(0, 0)].set(1.0).at[
        idx(0, n - 1)].set(1.0)

    nm = n * n
    params = dict(k=k, c=c, drag=drag, mass=mass, edges=edges, rest=rest,
                  pinned=pinned)

    def f(p, x, u, t):
        pos = x[: 3 * nm].reshape(nm, 3)
        vel = x[3 * nm :].reshape(nm, 3)
        d = pos[p["edges"][:, 1]] - pos[p["edges"][:, 0]]  # (ne, 3)
        dv = vel[p["edges"][:, 1]] - vel[p["edges"][:, 0]]
        length = jnp.linalg.norm(d, axis=1)
        dirn = d / jnp.maximum(length, 1e-9)[:, None]
        # Spring + damping along the edge (cloth_spring_model force law).
        fmag = p["k"] * (length - p["rest"]) + p["c"] * jnp.sum(
            dv * dirn, axis=1
        )
        fe = fmag[:, None] * dirn
        force = jnp.zeros_like(pos)
        force = force.at[p["edges"][:, 0]].add(fe)
        force = force.at[p["edges"][:, 1]].add(-fe)
        # Air drag damps the whole-sheet pendulum swing that edge-wise
        # spring damping cannot reach (rigid-ish modes have no edge rate).
        force = force - p["drag"] * vel
        acc = force / p["mass"] + jnp.asarray([0.0, 0.0, -9.81], x.dtype)
        acc = acc * (1.0 - p["pinned"])[:, None]
        vel = vel * (1.0 - p["pinned"])[:, None]
        return jnp.concatenate([vel.ravel(), acc.ravel()])

    system = sysbase.ContinuousSystem(
        f=f, num_states=6 * nm, num_inputs=0, default_params=params,
        num_q=3 * nm, num_v=3 * nm,
    )
    x0 = jnp.concatenate(
        [jnp.asarray(xs0, dtype).ravel(), jnp.zeros(3 * nm, dtype)]
    )
    return system, params, x0


def main():
    dtype = jnp.float32 if args.f32 else jnp.float64
    n = args.n
    system, params, x0 = build_cloth(n, dtype)
    t_final, dt = 3.0, 5e-4
    steps = int(t_final / dt)
    us = jnp.zeros((steps, 0), dtype)

    xs, ts = jax.jit(
        lambda x: simulator.simulate(system, params, x, us, dt, method="rk4")
    )(x0)
    xf = xs[-1]
    nm = n * n
    pos = xf[: 3 * nm].reshape(nm, 3)
    vel = xf[3 * nm :].reshape(nm, 3)
    v_max = float(jnp.max(jnp.linalg.norm(vel, axis=1)))
    z_min = float(pos[:, 2].min())
    # Strain check: no spring stretched beyond 25%.
    d = pos[params["edges"][:, 1]] - pos[params["edges"][:, 0]]
    strain = jnp.abs(
        jnp.linalg.norm(d, axis=1) / params["rest"] - 1.0
    )
    s_max = float(strain.max())
    print(f"explicit RK4 ({steps} x {dt}s): settled v_max {v_max:.4f} m/s, "
          f"drape depth {-z_min:.3f} m, max strain {s_max * 100:.1f}%")
    ok_rk4 = v_max < 0.3 and z_min < -0.05 and s_max < 0.25

    # Implicit trapezoid at 20x the step — the stiff-integrator payoff.
    dt_imp = 1e-2
    us_imp = jnp.zeros((int(t_final / dt_imp), 0), dtype)
    xs_i, _ = jax.jit(
        lambda x: simulator.simulate(
            system, params, x, us_imp, dt_imp, method="implicit_trapezoid"
        )
    )(x0)
    pos_i = xs_i[-1][: 3 * nm].reshape(nm, 3)
    drift = float(jnp.max(jnp.linalg.norm(pos_i - pos, axis=1)))
    print(f"implicit trapezoid at dt={dt_imp}: stable, max node deviation "
          f"from RK4 drape {drift:.3f} m")
    ok_imp = bool(jnp.all(jnp.isfinite(pos_i))) and drift < 0.1

    ok = ok_rk4 and ok_imp
    print("MASS-SPRING-CLOTH", "SUCCESS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
