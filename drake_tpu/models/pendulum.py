"""Simple pendulum — re-derivation of Drake's PendulumPlant.

Reference: examples/pendulum/pendulum_plant.cc (DoCalcTimeDerivatives:40-55)
and examples/pendulum/pendulum_params.h (defaults: mass 1.0 kg, length 0.5 m,
damping 0.1, gravity 9.81).  State x = [theta, thetadot], input u = [tau].

Dynamics:  ml^2 thetaddot = tau - mgl sin(theta) - b thetadot.
"""

from __future__ import annotations

import jax.numpy as jnp

from drake_tpu.systems.base import ContinuousSystem
from drake_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class PendulumParams:
    mass: jnp.ndarray = 1.0
    length: jnp.ndarray = 0.5
    damping: jnp.ndarray = 0.1
    gravity: jnp.ndarray = 9.81


def default_params(dtype=jnp.float32) -> PendulumParams:
    return PendulumParams(
        mass=jnp.asarray(1.0, dtype),
        length=jnp.asarray(0.5, dtype),
        damping=jnp.asarray(0.1, dtype),
        gravity=jnp.asarray(9.81, dtype),
    )


def dynamics(params: PendulumParams, x, u, t=0.0):
    theta, thetadot = x[..., 0], x[..., 1]
    tau = u[..., 0]
    ml2 = params.mass * params.length**2
    thetaddot = (
        tau
        - params.mass * params.gravity * params.length * jnp.sin(theta)
        - params.damping * thetadot
    ) / ml2
    return jnp.stack([thetadot, thetaddot], axis=-1)


def total_energy(params: PendulumParams, x):
    """KE + PE, matching PendulumPlant::CalcTotalEnergy (PE = -mgl cos theta)."""
    theta, thetadot = x[..., 0], x[..., 1]
    ke = 0.5 * params.mass * (params.length * thetadot) ** 2
    pe = -params.mass * params.gravity * params.length * jnp.cos(theta)
    return ke + pe


def make_system(params: PendulumParams | None = None) -> ContinuousSystem:
    return ContinuousSystem(
        f=dynamics,
        num_states=2,
        num_inputs=1,
        num_q=1,
        num_v=1,
        default_params=params if params is not None else default_params(),
    )
