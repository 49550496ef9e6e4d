"""Monte-Carlo optimization of Spong controller gains — batched on device.

Reference: examples/acrobot/optimizer_demo.py + spong_sim.py + metrics.py —
sample stochastic scenarios (perturbed hanging starts), roll out the Spong
controller for each, score with the ensemble cost (mean final deviation
from upright, metrics.py:final_state_cost), and search over
(k_e, k_p, k_d).  The reference shells out one spong_sim process per seed
and runs Nelder-Mead over them; here the entire inner loop — every
scenario x every candidate gain — is ONE vmapped, scan-compiled rollout,
and a cross-entropy iteration replaces fmin.

Run:  python examples/acrobot_spong_optimize.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scenarios", type=int, default=32)
    ap.add_argument("--candidates", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from drake_tpu.control.energy_shaping import acrobot_spong_controller
    from drake_tpu.models import acrobot
    from drake_tpu.systems import integrators

    dtype = jnp.float64 if args.cpu else jnp.float32
    p = acrobot.default_params(dtype)
    system = acrobot.make_system(p)
    rk4 = integrators.get("rk4")
    dt, n_steps = 2e-3, 6000

    def wrap(a, lo, hi):
        return (a - lo) % (hi - lo) + lo

    def final_cost(xf):
        # metrics.py:deviation_from_upright_equilibrium
        dev = jnp.stack([
            wrap(xf[0], 0.0, 2 * jnp.pi) - jnp.pi,
            wrap(xf[1], -jnp.pi, jnp.pi),
            xf[2],
            xf[3],
        ])
        return jnp.linalg.norm(dev)

    def rollout_cost(gains, x0):
        k_e, k_p, k_d = gains
        pol = acrobot_spong_controller(p, k_e=k_e, k_p=k_p, k_d=k_d)

        def body(x, _):
            u = pol(x)
            return rk4(system.f, p, x, u, 0.0, dt), None

        xf, _ = jax.lax.scan(body, x0, None, length=n_steps)
        return final_cost(xf)

    # Stochastic scenarios (spong_sim.py's --random_seed draws): hanging
    # start perturbed in angles and velocities.
    key = jax.random.PRNGKey(7)
    x0s = 0.2 * jax.random.normal(key, (args.scenarios, 4), dtype)

    # ensemble_cost over scenarios, vmapped over candidate gain triples.
    ensemble = jax.jit(
        jax.vmap(
            lambda g: jnp.mean(jax.vmap(lambda x0: rollout_cost(g, x0))(x0s))
        )
    )

    mean = jnp.log(jnp.array([5.0, 50.0, 5.0], dtype))  # reference defaults
    std = jnp.full(3, 0.4, dtype)
    n_elite = max(2, args.candidates // 4)
    base_cost = float(ensemble(jnp.exp(mean)[None])[0])
    print(f"reference gains (5, 50, 5): ensemble cost {base_cost:.4f}")

    best_gains, best_cost = jnp.exp(mean), base_cost
    for it in range(args.iters):
        key, sub = jax.random.split(key)
        draws = mean + std * jax.random.normal(
            sub, (args.candidates, 3), dtype
        )
        costs = ensemble(jnp.exp(draws))
        i_best = int(jnp.argmin(costs))
        if float(costs[i_best]) < best_cost:
            best_cost = float(costs[i_best])
            best_gains = jnp.exp(draws[i_best])
        elite = draws[jnp.argsort(costs)[:n_elite]]
        mean = jnp.mean(elite, axis=0)
        std = jnp.std(elite, axis=0) + 0.02
        print(
            f"iter {it}: round best {float(jnp.min(costs)):.4f}, "
            f"incumbent {best_cost:.4f}"
        )
    print(
        f"optimized gains {np.round(np.asarray(best_gains), 2)}: "
        f"ensemble cost {best_cost:.4f} (reference-default {base_cost:.4f})"
    )

    ok = best_cost <= base_cost + 1e-6 and best_cost < 1.0
    print("SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
