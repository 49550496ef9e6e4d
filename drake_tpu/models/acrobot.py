"""Acrobot — re-derivation of Drake's AcrobotPlant.

Reference: examples/acrobot/acrobot_plant.cc (MassMatrix:57-72,
DynamicsBiasTerm:75-99, DoCalcTimeDerivatives:102-117) and
examples/acrobot/gen/acrobot_params.h (defaults m1=m2=1, l1=1, l2=2, lc1=0.5,
lc2=1, Ic1=0.083, Ic2=0.33, b1=b2=0.1, g=9.81).

State x = [theta1, theta2, theta1dot, theta2dot]; input u = [tau] at elbow.
theta1 measured from straight-down; upright is theta1=pi, theta2=0.

Manipulator form:  M(q) vdot + bias(q, v) = B u,  B = [0, 1]^T.
"""

from __future__ import annotations

import jax.numpy as jnp

from drake_tpu.systems.base import ContinuousSystem
from drake_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class AcrobotParams:
    m1: jnp.ndarray = 1.0
    m2: jnp.ndarray = 1.0
    l1: jnp.ndarray = 1.0
    l2: jnp.ndarray = 2.0
    lc1: jnp.ndarray = 0.5
    lc2: jnp.ndarray = 1.0
    Ic1: jnp.ndarray = 0.083
    Ic2: jnp.ndarray = 0.33
    b1: jnp.ndarray = 0.1
    b2: jnp.ndarray = 0.1
    gravity: jnp.ndarray = 9.81


def default_params(dtype=jnp.float32) -> AcrobotParams:
    vals = dict(
        m1=1.0, m2=1.0, l1=1.0, l2=2.0, lc1=0.5, lc2=1.0,
        Ic1=0.083, Ic2=0.33, b1=0.1, b2=0.1, gravity=9.81,
    )
    return AcrobotParams(**{k: jnp.asarray(v, dtype) for k, v in vals.items()})


def mass_matrix(p: AcrobotParams, q):
    """M(q), 2x2 — matches AcrobotPlant::MassMatrix."""
    c2 = jnp.cos(q[..., 1])
    I1 = p.Ic1 + p.m1 * p.lc1**2
    I2 = p.Ic2 + p.m2 * p.lc2**2
    m2l1lc2 = p.m2 * p.l1 * p.lc2
    m11 = I1 + I2 + p.m2 * p.l1**2 + 2 * m2l1lc2 * c2
    m12 = I2 + m2l1lc2 * c2
    row0 = jnp.stack([m11, m12], axis=-1)
    row1 = jnp.stack([m12, jnp.broadcast_to(I2, m12.shape)], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def bias_term(p: AcrobotParams, q, v):
    """C(q,v)v - tau_g(q) + damping — matches AcrobotPlant::DynamicsBiasTerm."""
    s1 = jnp.sin(q[..., 0])
    s2 = jnp.sin(q[..., 1])
    s12 = jnp.sin(q[..., 0] + q[..., 1])
    v1, v2 = v[..., 0], v[..., 1]
    m2l1lc2 = p.m2 * p.l1 * p.lc2
    b0 = -2 * m2l1lc2 * s2 * v2 * v1 - m2l1lc2 * s2 * v2**2
    b1 = m2l1lc2 * s2 * v1**2
    # gravity torques (note Drake measures theta1 from straight-down)
    b0 = b0 + p.gravity * p.m1 * p.lc1 * s1 + p.gravity * p.m2 * (
        p.l1 * s1 + p.lc2 * s12
    )
    b1 = b1 + p.gravity * p.m2 * p.lc2 * s12
    # damping
    b0 = b0 + p.b1 * v1
    b1 = b1 + p.b2 * v2
    return jnp.stack([b0, b1], axis=-1)


def dynamics(p: AcrobotParams, x, u, t=0.0):
    q, v = x[..., :2], x[..., 2:]
    M = mass_matrix(p, q)
    bias = bias_term(p, q, v)
    Bu = jnp.stack([jnp.zeros_like(u[..., 0]), u[..., 0]], axis=-1)
    vdot = jnp.linalg.solve(M, (Bu - bias)[..., None])[..., 0]
    return jnp.concatenate([v, vdot], axis=-1)


def total_energy(p: AcrobotParams, x):
    """KE + PE (AcrobotPlant::DoCalcKineticEnergy / DoCalcPotentialEnergy)."""
    q, v = x[..., :2], x[..., 2:]
    M = mass_matrix(p, q)
    ke = 0.5 * jnp.einsum("...i,...ij,...j->...", v, M, v)
    c1 = jnp.cos(q[..., 0])
    c12 = jnp.cos(q[..., 0] + q[..., 1])
    pe = -p.m1 * p.gravity * p.lc1 * c1 - p.m2 * p.gravity * (
        p.l1 * c1 + p.lc2 * c12
    )
    return ke + pe


def upright_state(dtype=jnp.float32):
    return jnp.array([jnp.pi, 0.0, 0.0, 0.0], dtype=dtype)


def make_system(params: AcrobotParams | None = None) -> ContinuousSystem:
    return ContinuousSystem(
        f=dynamics,
        num_states=4,
        num_inputs=1,
        num_q=2,
        num_v=2,
        default_params=params if params is not None else default_params(),
    )
