"""Rimless wheel: passive dynamic walking via hybrid witness simulation.

The reference ships examples/rimless_wheel (rimless_wheel.h — a
hybrid-dynamics LeafSystem with a witnessed foot-collision event and an
analytic limit cycle).  Here the same model runs on drake_tpu's hybrid
simulator (systems/simulator.py simulate_hybrid: witness isolation by
fixed-count bisection + state reset), and the simulated rolling speed is
checked against the closed-form limit cycle.

Model (Tedrake-convention): a wheel of k massless spokes of length l with a
point mass at the hub, rolling down a slope gamma.  Between impacts it is
an inverted pendulum th'' = (g/l) sin(th), th measured from the slope
normal of the current stance spoke.  When th reaches alpha + gamma (next
spoke strikes), angular momentum about the new contact gives
th' -> cos(2 alpha) th', th -> gamma - alpha, with alpha = pi/k.

Energy balance fixed point (steady rolling speed at the post-impact angle):
    w*^2 = cot... : w_plus^2 = cos^2(2a) * (w_minus^2)
    w_minus^2 = w_plus^2 + (2g/l)(cos(g - a) - cos(g + a))
 => w_plus*^2 = cos^2(2a) (2g/l)(cos(g-a) - cos(g+a)) / (1 - cos^2(2a))

Run:  python examples/rimless_wheel.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
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

    # Reference defaults (rimless_wheel_params.named_vector: mass 1, length 1,
    # gravity 9.81, number_of_spokes 8, slope 0.08).
    g, l, k, slope = 9.81, 1.0, 8, 0.08
    alpha = np.pi / k

    def f(params, x, u, t):
        th, w = x[0], x[1]
        return jnp.stack([w, (g / l) * jnp.sin(th)])

    system = ContinuousSystem(f=f, num_states=2, num_inputs=0)

    # Witness: next spoke touches down at th = slope + alpha (rolling
    # downhill, th increasing).
    touchdown = WitnessFunction(
        g=lambda p, x, t: (slope + alpha) - x[0],
        reset=lambda p, x, t: jnp.stack(
            [jnp.asarray(slope - alpha, x.dtype),
             jnp.cos(2 * jnp.asarray(alpha, x.dtype)) * x[1]]
        ),
        direction="positive_then_negative",
    )

    # Initial push: enough to carry over the first apex (w0^2/2 must exceed
    # (g/l)(1 - cos(alpha - slope)) ~ 0.48).
    x0 = jnp.asarray([slope - alpha, 1.2], dtype)
    t_final, dt = 20.0, 1e-3
    xs, ts, counts = simulate_hybrid(
        system, None, x0, t_final, dt, witnesses=(touchdown,)
    )
    xs = np.asarray(xs)
    steps = int(counts[0])

    # Analytic steady rolling speed (post-impact angular velocity).
    c2 = np.cos(2 * alpha) ** 2
    w_star = np.sqrt(
        c2 * (2 * g / l) * (np.cos(slope - alpha) - np.cos(slope + alpha))
        / (1.0 - c2)
    )
    # Measured: post-impact velocity late in the rollout (after transients).
    th = xs[:, 0]
    w = xs[:, 1]
    # Find the last reset (th jumps back below slope - alpha + eps).
    resets = np.where(np.diff(th) < -alpha)[0]
    w_meas = w[resets[-1] + 1] if len(resets) else float("nan")
    err = abs(w_meas - w_star) / w_star
    print(f"spokes struck: {steps} over {t_final}s")
    print(f"steady post-impact speed: measured {w_meas:.4f}, "
          f"analytic {w_star:.4f} rad/s (rel err {err:.1e})")
    ok = steps > 10 and err < 2e-2
    print("RIMLESS_WHEEL", "OK" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
