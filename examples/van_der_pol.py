"""Van der Pol oscillator: limit-cycle simulation (reference
examples/van_der_pol/van_der_pol.h — the plant used for limit-cycle and
stochastic analysis demos).

    x'' = -x + mu (1 - x^2) x'

For mu = 1 the limit-cycle period is T = 6.663287 (classical value); this
demo integrates from inside the cycle, detects the period from upward zero
crossings of x, and checks against it.

Run:  python examples/van_der_pol.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mu", type=float, default=1.0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from drake_tpu.systems.base import ContinuousSystem
    from drake_tpu.systems import simulator

    dtype = jnp.float64 if args.cpu else jnp.float32
    mu = args.mu

    def f(params, x, u, t):
        return jnp.stack([x[1], -x[0] + mu * (1.0 - x[0] ** 2) * x[1]])

    system = ContinuousSystem(f=f, num_states=2, num_inputs=0)
    x0 = jnp.asarray([0.1, 0.0], dtype)
    dt, t_final = 1e-3, 60.0
    n = int(t_final / dt)
    us = jnp.zeros((n, 0), dtype)
    xs, ts = simulator.simulate(system, None, x0, us, dt, method="rk4")
    xs = np.asarray(xs)
    ts = np.asarray(ts)

    # Period from the last few upward zero crossings of x (post-transient).
    x = xs[:, 0]
    up = np.where((x[:-1] < 0) & (x[1:] >= 0))[0]
    crossings = ts[up[-5:]]
    period = float(np.mean(np.diff(crossings)))
    T_ref = 6.663287  # mu = 1 classical value
    amp = float(np.abs(x[n // 2 :]).max())
    print(f"limit-cycle period: {period:.5f} (classical {T_ref:.5f}), "
          f"amplitude {amp:.4f} (~2.0)")
    ok = abs(period - T_ref) < 5e-3 and abs(amp - 2.0) < 0.05
    print("VAN_DER_POL", "OK" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
