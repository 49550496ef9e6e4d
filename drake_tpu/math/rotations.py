"""Rotation math: rotation matrices, roll-pitch-yaw, quaternions.

Functional re-derivation of Drake's math/rotation_matrix.h and
math/roll_pitch_yaw.h for JAX: rotations are plain ``(..., 3, 3)`` arrays and
every function is vmappable/jittable.  Conventions follow Drake: ``R_AB`` maps
vectors expressed in frame B to frame A; rpy is extrinsic X-Y-Z
(roll about x, then pitch about y, then yaw about z), i.e.
``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)`` (reference math/roll_pitch_yaw.h:30-55).
"""

from __future__ import annotations

import jax.numpy as jnp


def rot_x(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, -s], axis=-1),
            jnp.stack([z, s, c], axis=-1),
        ],
        axis=-2,
    )


def rot_y(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )


def rot_z(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def rpy_to_rotation(rpy):
    """Roll-pitch-yaw (extrinsic XYZ) -> rotation matrix R_AB.

    rpy: (..., 3) array [roll, pitch, yaw].
    Matches drake::math::RotationMatrix(RollPitchYaw) (rotation_matrix.h).
    """
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    return rot_z(y) @ rot_y(p) @ rot_x(r)


def rotation_to_rpy(R):
    """Rotation matrix -> roll-pitch-yaw, matching Drake's RollPitchYaw(R).

    Uses the same atan2-based extraction as Drake (roll_pitch_yaw.cc,
    SetFromRotationMatrix): pitch = atan2(-R20, sqrt(R00^2+R10^2)).
    """
    R20 = R[..., 2, 0]
    pitch = jnp.arctan2(-R20, jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rpy_rates_to_angular_velocity_in_child(rpy, rpy_dot):
    """w_AB_B (angular velocity expressed in the child/body frame) from rpy rates.

    Re-derivation of RollPitchYaw::CalcAngularVelocityInChildFromRpyDt
    (reference math/roll_pitch_yaw.h:~500): w_B = N_B(rpy) @ rpy_dot with
        N_B = [[cos p cos y_?,...]] -- body-frame mapping:
        wx = rDot - sin(p) * yDot... expressed in child:
        w_B = [ rDot - sp*yDot? ]  Using R = Rz Ry Rx:
        w_B = [rDot, 0, 0] + Rx^T [0, pDot, 0] + (Ry Rx)^T... actually
        w_AB_B = Rx(r)^T Ry(p)^T [0,0,yDot] + Rx(r)^T [0,pDot,0] + [rDot,0,0].
    """
    r, p = rpy[..., 0], rpy[..., 1]
    sr, cr = jnp.sin(r), jnp.cos(r)
    sp, cp = jnp.sin(p), jnp.cos(p)
    rd, pd, yd = rpy_dot[..., 0], rpy_dot[..., 1], rpy_dot[..., 2]
    wx = rd - sp * yd
    wy = cr * pd + sr * cp * yd
    wz = -sr * pd + cr * cp * yd
    return jnp.stack([wx, wy, wz], axis=-1)


def rpy_rates_to_angular_velocity_in_parent(rpy, rpy_dot):
    """w_AB_A (angular velocity expressed in the parent frame) from rpy rates.

    w_A = [rDot,0,0] rotated by Rz(y)Ry(p) for the roll axis etc.:
        w_A = Rz(y) Ry(p) [rd,0,0] + Rz(y) [0,pd,0] + [0,0,yd].
    """
    p, y = rpy[..., 1], rpy[..., 2]
    sp, cp = jnp.sin(p), jnp.cos(p)
    sy, cy = jnp.sin(y), jnp.cos(y)
    rd, pd, yd = rpy_dot[..., 0], rpy_dot[..., 1], rpy_dot[..., 2]
    wx = cy * cp * rd - sy * pd
    wy = sy * cp * rd + cy * pd
    wz = -sp * rd + yd
    return jnp.stack([wx, wy, wz], axis=-1)


def rpy_ddt_from_angular_accel_in_parent(rpy, rpy_dot, alpha_A):
    """Second time-derivative of rpy given angular acceleration in parent frame.

    Re-derivation of RollPitchYaw::CalcRpyDDtFromRpyDtAndAngularAccelInParent:
    w_A = M(rpy) @ rpy_dot  =>  alpha_A = M @ rpy_ddot + Mdot @ rpy_dot
      =>  rpy_ddot = M^{-1} (alpha_A - Mdot @ rpy_dot).
    """
    p, y = rpy[..., 1], rpy[..., 2]
    sp, cp = jnp.sin(p), jnp.cos(p)
    sy, cy = jnp.sin(y), jnp.cos(y)
    rd, pd, yd = rpy_dot[..., 0], rpy_dot[..., 1], rpy_dot[..., 2]
    zero = jnp.zeros_like(p)
    one = jnp.ones_like(p)
    # M such that w_A = M @ rpy_dot  (see rpy_rates_to_angular_velocity_in_parent).
    M = jnp.stack(
        [
            jnp.stack([cy * cp, -sy, zero], axis=-1),
            jnp.stack([sy * cp, cy, zero], axis=-1),
            jnp.stack([-sp, zero, one], axis=-1),
        ],
        axis=-2,
    )
    # Mdot @ rpy_dot, with Mdot = dM/dt via chain rule in (p, y).
    Mdot_rpyd = jnp.stack(
        [
            (-sy * yd * cp - cy * sp * pd) * rd - cy * yd * pd,
            (cy * yd * cp - sy * sp * pd) * rd - sy * yd * pd,
            -cp * pd * rd,
        ],
        axis=-1,
    )
    rhs = alpha_A - Mdot_rpyd
    return jnp.linalg.solve(M, rhs[..., None])[..., 0]


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z), matching Drake's Eigen::Quaternion conventions.
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_multiply(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotation(q):
    """Unit quaternion (w,x,y,z) -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1),
        ],
        axis=-2,
    )


def rotation_to_quat(R):
    """Rotation matrix -> unit quaternion (w,x,y,z), branch-free.

    Shepperd's method computed via all four candidates and a max-select, so it
    is safe under vmap/jit (no data-dependent branching).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate (unnormalized) quaternions, one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = quat_normalize(q)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_rotate(q, v):
    """Rotate vector v by unit quaternion q (same as quat_to_rotation(q) @ v)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_derivative(q, w_B):
    """dq/dt from body-frame angular velocity: qdot = 0.5 * q ⊗ [0, w_B]."""
    zero = jnp.zeros_like(w_B[..., :1])
    wq = jnp.concatenate([zero, w_B], axis=-1)
    return 0.5 * quat_multiply(q, wq)


def quat_integrate(q, w_B, dt):
    """Exact exponential-map integration of a constant body-frame rate.

    Gradient-safe at w = 0: norm(w) is non-differentiable there and a naive
    where() still propagates the NaN through the shared sqrt — so the
    squared angle is computed smoothly and each branch sees a SAFE argument
    (Taylor series below the threshold)."""
    a2 = jnp.sum(w_B * w_B, axis=-1, keepdims=True) * dt * dt  # (angle)^2
    small = a2 < 1e-12
    a2_safe = jnp.where(small, 1.0, a2)
    angle = jnp.sqrt(a2_safe)
    half = 0.5 * angle
    # sin(half)/angle * dt and cos(half), with Taylor fallbacks near zero.
    k = jnp.where(small, 0.5 * dt * (1.0 - a2 / 24.0), jnp.sin(half) * dt / angle)
    c = jnp.where(small, 1.0 - a2 / 8.0, jnp.cos(half))
    dq = jnp.concatenate([c, k * w_B], axis=-1)
    return quat_normalize(quat_multiply(q, dq))


def hat(v):
    """Skew-symmetric cross-product matrix: hat(v) @ u == v x u."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(S):
    """Inverse of hat: extract v from skew-symmetric S."""
    return jnp.stack([S[..., 2, 1], S[..., 0, 2], S[..., 1, 0]], axis=-1)


def axis_angle_to_rotation(axis, angle):
    """Rodrigues' formula; axis must be unit length."""
    K = hat(axis)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=K.dtype), K.shape)
    return eye + s * K + (1.0 - c) * (K @ K)


def rotation_log(R):
    """Rotation vector (axis * angle) of R: the SO(3) matrix log, vee'd.

    Smooth near the identity (Taylor in theta^2); not valid at theta = pi
    (where the axis is ambiguous) — fine for constraint stabilization where
    errors are small.  (RotationMatrix::ToAngleAxis role.)
    """
    tr = jnp.trace(R)
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    w = vee(R - jnp.swapaxes(R, -1, -2)) / 2.0  # axis * sin(theta)
    # Smooth-gradient construction (same trap as quat_integrate: arccos'
    # gradient blows up at theta=0 and pollutes both where-branches).  The
    # small branch is polynomial in s2 = sin^2(theta) — no sqrt at zero —
    # and the large branch uses atan2, smooth for sin(theta) > 0.
    s2 = jnp.sum(w * w, axis=-1)
    small = s2 < 1e-12
    s2_safe = jnp.where(small, 1.0, s2)
    sin_t = jnp.sqrt(s2_safe)
    theta = jnp.arctan2(sin_t, cos_t)
    scale = jnp.where(small, 1.0 + s2 / 6.0, theta / sin_t)
    return w * scale
