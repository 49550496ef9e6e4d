"""Classical controllers: PID, inverse dynamics, joint stiffness.

Re-derivation of systems/controllers/ (reference: pid_controller.h,
pid_controlled_system.h, inverse_dynamics_controller.h,
joint_stiffness_controller.h) as policy factories compatible with
``simulator.simulate_controlled`` (policies are ``(state, x, t) -> u`` or
``(state, x, t) -> (u, state)`` for stateful integral action).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from drake_tpu.multibody import dynamics as dyn


def pid_controller(Kp, Ki, Kd, desired_state_fn: Callable, dt: float):
    """PID on (q_d - q, v_d - v); integral state carried through the rollout.

    desired_state_fn(t) -> (q_d, v_d).  Use policy_state=zeros(nq) with
    simulate_controlled.  Mirrors PidController (pid_controller.h).
    """
    Kp = jnp.asarray(Kp)
    Ki = jnp.asarray(Ki)
    Kd = jnp.asarray(Kd)
    nq = Kp.shape[0]

    def policy(integral, x, t):
        q, v = x[:nq], x[nq : 2 * nq]
        q_d, v_d = desired_state_fn(t)
        e = q_d - q
        u = Kp * e + Kd * (v_d - v) + Ki * integral
        return u, integral + dt * e

    return policy


def inverse_dynamics_controller(
    model, params, Kp, Ki, Kd, desired_fn: Callable, dt: float
):
    """Computed-torque control (InverseDynamicsController):

        tau = ID(q, v, vdot_des),
        vdot_des = vdot_d + Kp e + Kd edot + Ki int(e).

    desired_fn(t) -> (q_d, v_d, vdot_d).
    """
    Kp = jnp.asarray(Kp)
    Ki = jnp.asarray(Ki)
    Kd = jnp.asarray(Kd)
    nq = Kp.shape[0]

    def policy(integral, x, t):
        q, v = x[:nq], x[nq : 2 * nq]
        q_d, v_d, vd_d = desired_fn(t)
        e = q_d - q
        vdot_des = vd_d + Kp * e + Kd * (v_d - v) + Ki * integral
        tau = dyn.inverse_dynamics(model, params, q, v, vdot_des)
        return tau, integral + dt * e

    return policy


def joint_stiffness_controller(model, params, Kp, Kd, q_desired):
    """Gravity-compensated joint stiffness (JointStiffnessController):

        tau = g(q) + Kp (q_d - q) - Kd v.
    """
    Kp = jnp.asarray(Kp)
    Kd = jnp.asarray(Kd)
    nq = Kp.shape[0]
    nv = model.num_velocities

    def policy(_, x, t):
        q, v = x[:nq], x[nq:]
        tau_g = dyn.bias_forces(model, params, q, jnp.zeros(nv, x.dtype))
        return tau_g + Kp * (q_desired - q) - Kd * v

    return policy
