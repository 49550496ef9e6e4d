"""Cart-pole: LQR balance about the upright (reference
examples/multibody/cart_pole — the canonical underactuated LQR demo).

Linearize the cart-pole about the unstable upright fixed point, build the
continuous LQR controller, and verify the closed loop recovers from a
perturbation while the open loop falls over.  The whole closed-loop
rollout is one jitted scan; a batch of 256 perturbed scenarios runs as one
vmap to show the basin of attraction.

Run:  python examples/cart_pole_lqr.py [--cpu]
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

    from drake_tpu.control import lqr
    from drake_tpu.models import cart_pole
    from drake_tpu.systems import simulator

    dtype = jnp.float64 if args.cpu else jnp.float32
    params = cart_pole.default_params(dtype)
    system = cart_pole.make_system(params)
    x_star = cart_pole.upright_state(dtype)
    u_star = jnp.zeros(1, dtype)

    A, B = system.linearize(params, x_star, u_star)
    Q = jnp.diag(jnp.asarray([100.0, 50.0, 5.0, 5.0], dtype))
    R = jnp.eye(1, dtype=dtype)
    res = lqr.lqr(A, B, Q, R)
    K = res.K
    print(f"LQR gain K = {np.asarray(K).round(2)}")

    def policy(p, x, t):
        return -K @ (x - x_star)

    dt, T = 0.01, 800
    x0 = x_star + jnp.asarray([0.1, 0.15, 0.0, 0.0], dtype)
    xs, _, _ = simulator.simulate_controlled(
        system, params, x0, policy, T, dt, method="rk4")
    err_cl = float(jnp.linalg.norm(xs[-1] - x_star))

    xs_ol, _ = simulator.simulate(
        system, params, x0, jnp.zeros((T, 1), dtype), dt, method="rk4")
    err_ol = float(jnp.linalg.norm(xs_ol[-1] - x_star))
    print(f"closed-loop final error {err_cl:.2e} vs open-loop {err_ol:.2f}")
    assert err_cl < 1e-2 and err_ol > 0.5

    # batched basin-of-attraction sweep: one vmap, 256 scenarios
    key = jax.random.PRNGKey(0)
    perturb = 0.2 * jax.random.normal(key, (256, 4), dtype)
    x0s = x_star[None] + perturb

    def scenario(x0):
        xs, _, _ = simulator.simulate_controlled(
            system, params, x0, policy, T, dt, method="rk4")
        return jnp.linalg.norm(xs[-1] - x_star)

    errs = jax.jit(jax.vmap(scenario))(x0s)
    n_stable = int(jnp.sum(errs < 5e-2))
    print(f"basin sweep: {n_stable}/256 perturbed starts recovered")
    assert n_stable > 200
    print("CART-POLE LQR OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
