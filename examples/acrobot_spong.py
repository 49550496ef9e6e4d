"""Acrobot Spong swing-up (reference examples/acrobot/run_swing_up.cc).

The classic two-stage controller from spong_controller.h: collocated partial
feedback linearization + energy shaping pumps the acrobot up from hanging
rest; once the wrapped state enters the LQR cost ellipse the balancing law
takes over and holds [pi, 0, 0, 0].  The whole closed loop — including the
branch-free controller switch — compiles into one lax.scan, and a batched
variant swings up 64 perturbed acrobots in a single vmapped rollout.

Run:  python examples/acrobot_spong.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from drake_tpu.control.energy_shaping import acrobot_spong_controller
    from drake_tpu.models import acrobot
    from drake_tpu.systems.simulator import simulate_controlled

    dtype = jnp.float64 if args.cpu else jnp.float32
    p = acrobot.default_params(dtype)
    pol = acrobot_spong_controller(p)
    policy = lambda ps, x, t: pol(x, t)
    system = acrobot.make_system(p)

    # Single swing-up from the reference's perturbed hanging start.
    x0 = jnp.array([0.1, 0.0, 0.0, 0.0], dtype)
    xs, us, ts = simulate_controlled(
        system, p, x0, policy, num_steps=12000, dt=0.002
    )
    xf = np.asarray(xs[-1])
    wrap = lambda a: (a + np.pi) % (2 * np.pi) - np.pi
    err = max(abs(wrap(xf[0] - np.pi)), abs(wrap(xf[1])), *np.abs(xf[2:]))
    print(f"single swing-up: final state {xf}, upright err {err:.2e}")

    # Batched: vmap the whole closed loop over perturbed starts.
    key = jax.random.PRNGKey(0)
    x0b = x0 + 0.05 * jax.random.normal(key, (args.batch, 4), dtype)
    rollout = jax.vmap(
        lambda x: simulate_controlled(
            system, p, x, policy, num_steps=12000, dt=0.002
        )[0]
    )
    xsb = np.asarray(jax.jit(rollout)(x0b))
    errs = np.maximum(
        np.abs(wrap(xsb[:, -1, 0] - np.pi)), np.abs(wrap(xsb[:, -1, 1]))
    )
    n_up = int(np.sum(errs < 1e-2))
    print(f"batched: {n_up}/{args.batch} balanced upright (max err {errs.max():.2e})")

    ok = err < 1e-2 and n_up >= int(0.9 * args.batch)
    print("SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
