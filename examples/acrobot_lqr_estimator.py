"""Acrobot output-feedback balancing: LQR + steady-state Kalman filter.

Reference: examples/acrobot/run_lqr_w_estimator.cc — only the two joint
ANGLES are measured (a C = [I 0] output map); a SteadyStateKalmanFilter
(W = I, V = 0.1 I, ibid:70-72) reconstructs the velocities and the upright
LQR acts on the ESTIMATE.  Here the plant, observer, and controller all
roll forward inside one lax.scan: state = (x, xhat), u = -K(xhat - x_up),
xhat' = f(xhat, u) + L (y - C xhat).

Run:  python examples/acrobot_lqr_estimator.py --cpu
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

    from drake_tpu.control.estimators import (
        luenberger_observer,
        steady_state_kalman_filter,
    )
    from drake_tpu.control.lqr import lqr
    from drake_tpu.models import acrobot
    from drake_tpu.systems import integrators

    dtype = jnp.float64 if args.cpu else jnp.float32
    p = acrobot.default_params(dtype)
    system = acrobot.make_system(p)
    x_up = jnp.array([jnp.pi, 0.0, 0.0, 0.0], dtype)
    u0 = jnp.zeros((1,), dtype)

    A, B = system.linearize(p, x_up, u0)
    Q = jnp.diag(jnp.array([10.0, 10.0, 1.0, 1.0], dtype))
    R = jnp.eye(1, dtype=dtype)
    K = lqr(A, B, Q, R).K

    # Measure joint angles only; KF weights per run_lqr_w_estimator.cc:70-72.
    C = jnp.concatenate([jnp.eye(2, dtype=dtype), jnp.zeros((2, 2), dtype)], 1)
    W = jnp.eye(4, dtype=dtype)
    V = 0.1 * jnp.eye(2, dtype=dtype)
    L = steady_state_kalman_filter(A, C, W, V).L

    dt = 1e-3
    n_steps = 5000
    observe = luenberger_observer(system, p, L, C, dt)
    rk4 = integrators.get("rk4")

    def step(carry, key):
        x, xhat = carry
        u = -K @ (xhat - x_up)
        y = C @ x + 0.002 * jax.random.normal(key, (2,), dtype)
        x_next = rk4(system.f, p, x, u, 0.0, dt)
        xhat_next = observe(xhat, u, y)
        return (x_next, xhat_next), (x, xhat, u)

    # Perturbed start; the observer starts WRONG (zero velocity estimate at
    # a different angle) and must converge from angle measurements alone.
    x0 = x_up + jnp.array([0.02, -0.01, 0.05, -0.05], dtype)
    xhat0 = x_up
    keys = jax.random.split(jax.random.PRNGKey(0), n_steps)
    (_, _), (xs, xhats, us) = jax.lax.scan(step, (x0, xhat0), keys)

    err_final = float(jnp.linalg.norm(xs[-1] - x_up))
    est_err = float(jnp.linalg.norm(xhats[-1] - xs[-1]))
    print(f"final state error  |x - x_up|   = {err_final:.2e}")
    print(f"final estimate err |xhat - x|   = {est_err:.2e}")

    ok = err_final < 5e-2 and est_err < 5e-2
    print("SUCCESS" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
