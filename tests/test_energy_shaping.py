"""Energy-shaping swing-up controllers (reference examples parity).

Reference behaviors under test:
* examples/pendulum/energy_shaping_simulation.cc — the pendulum pumps up to
  the desired energy 1.1·m·g·l and passes through the upright.
* examples/acrobot/spong_controller.h + run_swing_up.cc — from a small
  perturbation of hanging rest the Spong controller swings the acrobot up
  and the LQR branch balances it at [pi, 0, 0, 0].
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.control.energy_shaping import (
    acrobot_spong_controller,
    pendulum_energy_shaping,
)
from drake_tpu.models import acrobot, pendulum
from drake_tpu.systems.simulator import simulate_controlled


def _wrap_pi(x):
    return (x + np.pi) % (2 * np.pi) - np.pi


def test_pendulum_energy_shaping_reaches_upright():
    p = pendulum.default_params(jnp.float64)
    pol = pendulum_energy_shaping(p)
    policy = lambda ps, x, t: pol(x, t)
    x0 = jnp.array([0.1, 0.0], dtype=jnp.float64)
    xs, us, ts = simulate_controlled(
        pendulum.make_system(p), p, x0, policy, num_steps=4000, dt=0.005
    )
    # Energy converges to 1.1 m g l (the desired swing-through energy).
    E = jax.vmap(lambda x: pendulum.total_energy(p, x))(xs)
    E_d = 1.1 * p.mass * p.gravity * p.length
    assert abs(float(E[-1]) - float(E_d)) < 0.05 * float(E_d)
    # The pendulum actually passes through the upright.
    theta = np.asarray(xs[:, 0])
    assert np.min(np.abs(_wrap_pi(theta - np.pi))) < 0.1


def test_acrobot_spong_swingup_balances():
    p = acrobot.default_params(jnp.float64)
    pol = acrobot_spong_controller(p)
    policy = lambda ps, x, t: pol(x, t)
    # run_swing_up.cc starts near the stable fixed point (1e-1 perturbation).
    x0 = jnp.array([0.1, 0.0, 0.0, 0.0], dtype=jnp.float64)
    xs, us, ts = simulate_controlled(
        acrobot.make_system(p), p, x0, policy, num_steps=12000, dt=0.002
    )
    xf = np.asarray(xs[-1])
    assert abs(_wrap_pi(xf[0] - np.pi)) < 1e-2
    assert abs(_wrap_pi(xf[1])) < 1e-2
    assert np.all(np.abs(xf[2:]) < 1e-2)
    # Torque respects the reference's +-20 Nm saturation.
    assert float(jnp.max(jnp.abs(us))) <= 20.0 + 1e-9


def test_spong_controller_is_batchable():
    p = acrobot.default_params(jnp.float64)
    pol = acrobot_spong_controller(p)
    xb = jnp.stack(
        [
            jnp.array([0.1, 0.0, 0.0, 0.0]),
            jnp.array([jnp.pi - 0.01, 0.005, 0.0, 0.0]),
        ]
    ).astype(jnp.float64)
    ub = jax.vmap(lambda x: pol(x))(xb)
    assert ub.shape == (2, 1)
    # The second state is inside the LQR basin: torque is the balancing law,
    # far below saturation.
    assert abs(float(ub[1, 0])) < 5.0
