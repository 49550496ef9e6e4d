"""Inertial sensors: gyroscope + accelerometer measurements from plant
state.

Re-derivation of the reference's sensor systems
(systems/sensors/gyroscope.h, accelerometer.h): instead of LeafSystems
wired to plant ports, these are pure functions of (model, params, q, v
[, vdot]) — composable into any pipeline, batched by vmap, and exactly
differentiable.  The point-acceleration chain rule is delegated to
jax.jvp through the velocity kinematics rather than hand-coded
alpha x p + w x (w x p) terms.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from drake_tpu.multibody import kinematics as kin


def _sensor_point_velocity(model, params, body: int, p_BS, q, v):
    """World velocity of the sensor point S fixed on ``body``."""
    R_WB, p_WB = kin.forward_kinematics(model, params, q)
    V_W = kin.world_velocities(model, params, q, v)  # (nb, 6) [w; v@Bo]
    p_WS = p_WB[body] + R_WB[body] @ jnp.asarray(p_BS, q.dtype)
    w = V_W[body, :3]
    v_S = V_W[body, 3:] + jnp.cross(w, p_WS - p_WB[body])
    return v_S, w, R_WB[body]


def gyroscope_measurement(model, params, body: int, q, v, R_BS=None):
    """Angular velocity of the body in the sensor frame S (gyroscope.h)."""
    _, w_W, R_WB = _sensor_point_velocity(
        model, params, body, jnp.zeros(3, q.dtype), q, v
    )
    R_WS = R_WB if R_BS is None else R_WB @ jnp.asarray(R_BS, q.dtype)
    return R_WS.T @ w_W


def accelerometer_measurement(
    model, params, body: int, q, v, vdot, p_BS=None, R_BS=None,
):
    """Specific force at sensor point S in frame S (accelerometer.h):
    f = R_WS^T (a_WS - g).

    The world acceleration of S is the total time derivative of its
    velocity: a_WS = d v_S/dq qdot + d v_S/dv vdot, computed by one jvp
    (exact — includes centripetal and Euler terms automatically).
    """
    from drake_tpu.multibody.plant import qdot_from_v

    p_BS = jnp.zeros(3, q.dtype) if p_BS is None else jnp.asarray(p_BS, q.dtype)
    qdot = qdot_from_v(model, params, q, v)

    def vel(qq, vv):
        return _sensor_point_velocity(model, params, body, p_BS, qq, vv)[0]

    _, a_WS = jax.jvp(vel, (q, v), (qdot, vdot))
    _, _, R_WB = _sensor_point_velocity(model, params, body, p_BS, q, v)
    R_WS = R_WB if R_BS is None else R_WB @ jnp.asarray(R_BS, q.dtype)
    return R_WS.T @ (a_WS - params.gravity)
