"""Quadrotor — re-derivation of Drake's QuadrotorPlant.

Reference: examples/quadrotor/quadrotor_plant.cc (DoCalcTimeDerivatives:55-125;
defaults m=0.775 kg, arm L=0.15 m, I=diag(0.0015, 0.0025, 0.0035), kF=1.0,
kM=0.0245, g=9.81).

State x = [xyz(3), rpy(3), xyz_dot(3), rpy_dot(3)]; input u = per-rotor
forces (4,).  Rotors 0..3 sit on the +x, +y, -x, -y arms; 0 and 2 spin
opposite to 1 and 3.
"""

from __future__ import annotations

import jax.numpy as jnp

from drake_tpu.math import rotations as rot
from drake_tpu.systems.base import ContinuousSystem
from drake_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class QuadrotorParams:
    mass: jnp.ndarray = 0.775
    arm_length: jnp.ndarray = 0.15
    inertia: jnp.ndarray = None  # (3, 3)
    kF: jnp.ndarray = 1.0
    kM: jnp.ndarray = 0.0245
    gravity: jnp.ndarray = 9.81


def default_params(dtype=jnp.float32) -> QuadrotorParams:
    return QuadrotorParams(
        mass=jnp.asarray(0.775, dtype),
        arm_length=jnp.asarray(0.15, dtype),
        inertia=jnp.diag(jnp.asarray([0.0015, 0.0025, 0.0035], dtype)),
        kF=jnp.asarray(1.0, dtype),
        kM=jnp.asarray(0.0245, dtype),
        gravity=jnp.asarray(9.81, dtype),
    )


def dynamics(p: QuadrotorParams, x, u, t=0.0):
    rpy = x[..., 3:6]
    rpy_dot = x[..., 9:12]

    uF = p.kF * u  # per-rotor thrusts along body z
    Faero_B = jnp.stack(
        [jnp.zeros_like(uF[..., 0]), jnp.zeros_like(uF[..., 0]), jnp.sum(uF, axis=-1)],
        axis=-1,
    )
    Mx = p.arm_length * (uF[..., 1] - uF[..., 3])
    My = p.arm_length * (uF[..., 2] - uF[..., 0])
    uTau = p.kM * u
    Mz = uTau[..., 0] - uTau[..., 1] + uTau[..., 2] - uTau[..., 3]
    Tau_B = jnp.stack([Mx, My, Mz], axis=-1)

    R_NB = rot.rpy_to_rotation(rpy)
    Fgravity_N = jnp.stack(
        [
            jnp.zeros_like(p.mass),
            jnp.zeros_like(p.mass),
            -p.mass * p.gravity,
        ],
        axis=-1,
    )
    Fnet_N = Fgravity_N + jnp.einsum("...ij,...j->...i", R_NB, Faero_B)
    xyz_ddot = Fnet_N / p.mass[..., None]

    w_NB_B = rot.rpy_rates_to_angular_velocity_in_child(rpy, rpy_dot)
    Iw = jnp.einsum("...ij,...j->...i", p.inertia, w_NB_B)
    wIw = jnp.cross(w_NB_B, Iw)
    alpha_NB_B = jnp.linalg.solve(p.inertia, (Tau_B - wIw)[..., None])[..., 0]
    alpha_NB_N = jnp.einsum("...ij,...j->...i", R_NB, alpha_NB_B)
    rpy_ddot = rot.rpy_ddt_from_angular_accel_in_parent(rpy, rpy_dot, alpha_NB_N)

    return jnp.concatenate([x[..., 6:12], xyz_ddot, rpy_ddot], axis=-1)


def hover_input(p: QuadrotorParams):
    """Per-rotor force balancing gravity (QuadrotorPlant StabilizingLQRController
    nominal input, quadrotor_plant.cc:~140)."""
    u0 = p.mass * p.gravity / (4 * p.kF)
    return jnp.stack([u0, u0, u0, u0], axis=-1)


def make_system(params: QuadrotorParams | None = None) -> ContinuousSystem:
    return ContinuousSystem(
        f=dynamics,
        num_states=12,
        num_inputs=4,
        num_q=6,
        num_v=6,
        default_params=params if params is not None else default_params(),
    )
