"""Cart-pole — analytic counterpart of Drake's cart_pole example.

Reference: examples/multibody/cart_pole/cart_pole.sdf (cart mass 10 kg, point
mass 1 kg hanging 0.5 m below the pivot) simulated through MultibodyPlant.
Here the classic underactuated cart-pole equations are written directly
(point-mass pole, theta measured from straight-down, hanging stable at 0,
upright at pi).

State x = [pos, theta, posdot, thetadot]; input u = [force on cart].
"""

from __future__ import annotations

import jax.numpy as jnp

from drake_tpu.systems.base import ContinuousSystem
from drake_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class CartPoleParams:
    mc: jnp.ndarray = 10.0  # cart mass
    mp: jnp.ndarray = 1.0  # pole point mass
    l: jnp.ndarray = 0.5  # pole length
    gravity: jnp.ndarray = 9.81


def default_params(dtype=jnp.float32) -> CartPoleParams:
    return CartPoleParams(
        mc=jnp.asarray(10.0, dtype),
        mp=jnp.asarray(1.0, dtype),
        l=jnp.asarray(0.5, dtype),
        gravity=jnp.asarray(9.81, dtype),
    )


def mass_matrix(p: CartPoleParams, q):
    theta = q[..., 1]
    c = jnp.cos(theta)
    m11 = jnp.broadcast_to(p.mc + p.mp, theta.shape)
    m12 = p.mp * p.l * c
    m22 = jnp.broadcast_to(p.mp * p.l**2, theta.shape)
    row0 = jnp.stack([m11, m12], axis=-1)
    row1 = jnp.stack([m12, m22], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def dynamics(p: CartPoleParams, x, u, t=0.0):
    theta = x[..., 1]
    thetadot = x[..., 3]
    s, c = jnp.sin(theta), jnp.cos(theta)
    M = mass_matrix(p, x[..., :2])
    # bias = C(q,v)v - tau_g; generalized forces [u, 0].
    b0 = -p.mp * p.l * s * thetadot**2 - u[..., 0]
    b1 = p.mp * p.gravity * p.l * s
    rhs = -jnp.stack([b0, b1], axis=-1)
    vdot = jnp.linalg.solve(M, rhs[..., None])[..., 0]
    return jnp.concatenate([x[..., 2:], vdot], axis=-1)


def upright_state(dtype=jnp.float32):
    return jnp.array([0.0, jnp.pi, 0.0, 0.0], dtype=dtype)


def make_system(params: CartPoleParams | None = None) -> ContinuousSystem:
    return ContinuousSystem(
        f=dynamics,
        num_states=4,
        num_inputs=1,
        num_q=2,
        num_v=2,
        default_params=params if params is not None else default_params(),
    )
