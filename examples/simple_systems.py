"""The reference's four "hello world" systems, TPU-native.

Reference parity (SURVEY §2.7 examples):
  - examples/simple_continuous_time_system.cc   xdot = -x + x^3
  - examples/simple_discrete_time_system.cc     x[n+1] = x[n]^3
  - examples/simple_mixed_continuous_and_discrete_time_system.cc
  - examples/fibonacci/fibonacci_difference_equation.h  (pure difference eq)

Each reference file exists to demo LeafSystem subclassing + Simulator::
AdvanceTo; here the same systems are four pure functions driven by the scan
simulator — the point of the demo is the framework mapping, so this file IS
the tutorial: no classes, no contexts, no ports.

Run: python examples/simple_systems.py --cpu
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

from drake_tpu.systems.base import ContinuousSystem, DiscreteSystem
from drake_tpu.systems.simulator import simulate, simulate_discrete


def main():
    # 1. Simple continuous-time system: xdot = -x + x^3 (stable for |x|<1).
    cts = ContinuousSystem(
        f=lambda p, x, u, t: -x + x**3, num_states=1, num_inputs=0
    )
    x0 = jnp.array([0.9])
    dt, n = 0.01, 1000
    u_seq = jnp.zeros((n, 0))
    xs, ts = simulate(cts, None, x0, u_seq, dt)
    print(f"continuous: x(0)={float(x0[0]):.2f} -> x(10)={float(xs[-1, 0]):.6f}"
          " (decays to 0 inside the RoA)")
    assert abs(float(xs[-1, 0])) < 1e-3

    # 2. Simple discrete-time system: x[n+1] = x[n]^3.
    dts = DiscreteSystem(
        g=lambda p, x, u, t: x**3, num_states=1, num_inputs=0, time_step=1.0
    )
    xs_d = simulate_discrete(dts, None, jnp.array([0.99]), jnp.zeros((50, 0)))
    print(f"discrete:   x[0]=0.99 -> x[50]={float(xs_d[-1, 0]):.6f}")
    assert abs(float(xs_d[-1, 0])) < 1e-3

    # 3. Mixed system: continuous xdot = -x + x^3 with a periodic discrete
    #    state that samples x every 0.1 s (the reference's hybrid demo).
    #    One scan: inner RK4 micro-steps, outer discrete sample.
    def sampled_step(carry, _):
        x, latch = carry

        def rk4(x, h):
            f = lambda x: -x + x**3
            k1 = f(x); k2 = f(x + 0.5 * h * k1)
            k3 = f(x + 0.5 * h * k2); k4 = f(x + h * k3)
            return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

        x = jax.lax.fori_loop(0, 10, lambda i, x: rk4(x, 0.01), x)
        return (x, x), (x, x)  # discrete latch updates at the sample instant

    (_, latch), (xs_c, latches) = jax.lax.scan(
        sampled_step, (jnp.array(0.9), jnp.array(0.9)), None, length=100
    )
    print(f"mixed:      x(10)={float(xs_c[-1]):.6f}, last sample latch="
          f"{float(latch):.6f} (equal at sample instants)")
    assert abs(float(xs_c[-1]) - float(latch)) < 1e-12

    # 4. Fibonacci difference equation: x1[n+1]=x1[n]+x2[n], x2[n+1]=x1[n].
    fib = DiscreteSystem(
        g=lambda p, x, u, t: jnp.array([x[0] + x[1], x[0]]),
        num_states=2, num_inputs=0, time_step=1.0,
    )
    xs_f = simulate_discrete(fib, None, jnp.array([1.0, 0.0]),
                             jnp.zeros((9, 0)))
    seq = [int(x[0]) for x in xs_f]
    print(f"fibonacci:  F_0..F_9 = {seq}")
    assert seq == [1, 1, 2, 3, 5, 8, 13, 21, 34, 55]

    print("SIMPLE SYSTEMS OK")


if __name__ == "__main__":
    main()
