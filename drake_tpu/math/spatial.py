"""Spatial (6-D) vector algebra — Plücker coordinates, rotational-first.

Functional re-derivation of Drake's multibody/math/spatial_velocity.h,
spatial_force.h, and multibody/tree/spatial_inertia.h.  A spatial vector is a
``(..., 6)`` array ``[w; v]`` (angular on top, matching Drake).  Spatial
inertias use the (mass, center-of-mass, unit rotational inertia) form
internally but expose the 6x6 matrix for batched matmuls on the MXU.

Conventions (Featherstone / Drake):
  - Spatial velocity  V = [w; v]
  - Spatial force     F = [tau; f]
  - Shift of a velocity from P to Q (same body): V_Q = [w; v + w x p_PQ]
  - Shift of a force from P to Q: F_Q = [tau + f x p_QP...] — see shift_force.
"""

from __future__ import annotations

import jax.numpy as jnp

from drake_tpu.math.rotations import hat


def spatial(w, v):
    return jnp.concatenate([w, v], axis=-1)


def angular(V):
    return V[..., :3]


def linear(V):
    return V[..., 3:]


def shift_velocity(V_P, p_PQ):
    """Spatial velocity of the same rigid body measured at point Q given at P.

    V_Q = [w; v_P + w x p_PQ]  (spatial_velocity.h Shift()).
    """
    w = V_P[..., :3]
    v = V_P[..., 3:] + jnp.cross(w, p_PQ)
    return spatial(w, v)


def shift_force(F_P, p_PQ):
    """Spatial force applied at P re-expressed about point Q.

    F_Q = [tau_P - p_PQ x f; f]  (spatial_force.h Shift(): tau_Q = tau_P
    + p_QP x f = tau_P - p_PQ x f).
    """
    tau = F_P[..., :3] - jnp.cross(p_PQ, F_P[..., 3:])
    return spatial(tau, F_P[..., 3:])


def rotate_spatial(R, V):
    """Re-express a spatial vector in another frame: both halves rotate."""
    w = jnp.einsum("...ij,...j->...i", R, V[..., :3])
    v = jnp.einsum("...ij,...j->...i", R, V[..., 3:])
    return spatial(w, v)


def transform_velocity(R_AB, p_AB, V_B):
    """V_A for a spatial *motion* vector: rotate then shift by -p.

    X[AB] motion transform: w_A = R w_B ; v_A = R v_B + p_AB x (R w_B)...
    For velocity of a frame B measured in A-fixed point: standard Plücker
    transform: [w_A; v_A] = [[R, 0], [hat(p) R, R]] [w_B; v_B].
    """
    w = jnp.einsum("...ij,...j->...i", R_AB, V_B[..., :3])
    v = jnp.einsum("...ij,...j->...i", R_AB, V_B[..., 3:]) + jnp.cross(p_AB, w)
    return spatial(w, v)


def transform_force(R_AB, p_AB, F_B):
    """Plücker force transform: [tau_A; f_A] = [[R, hat(p) R], [0, R]] F_B."""
    f = jnp.einsum("...ij,...j->...i", R_AB, F_B[..., 3:])
    tau = jnp.einsum("...ij,...j->...i", R_AB, F_B[..., :3]) + jnp.cross(p_AB, f)
    return spatial(tau, f)


def cross_motion(V, M):
    """Spatial motion cross product  V x M  (for acceleration bias terms).

    [w; v] x [m_w; m_v] = [w x m_w ; w x m_v + v x m_w].
    """
    w, v = V[..., :3], V[..., 3:]
    mw, mv = M[..., :3], M[..., 3:]
    return spatial(jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(v, mw))


def cross_force(V, F):
    """Spatial force cross product  V x* F.

    [w; v] x* [tau; f] = [w x tau + v x f ; w x f].
    """
    w, v = V[..., :3], V[..., 3:]
    tau, f = F[..., :3], F[..., 3:]
    return spatial(jnp.cross(w, tau) + jnp.cross(v, f), jnp.cross(w, f))


# ---------------------------------------------------------------------------
# Spatial inertia.
# ---------------------------------------------------------------------------


def spatial_inertia_matrix(mass, p_com, G_rot):
    """6x6 spatial inertia about a point P, expressed in a frame E.

    Args:
      mass: (...,) scalar mass.
      p_com: (..., 3) vector from P to the center of mass, in E.
      G_rot: (..., 3, 3) *unit* rotational inertia about P in E (I_P / mass).

    Returns (..., 6, 6):
        M = [[ m*G,       m*hat(c) ],
             [ m*hat(c)^T, m*I3    ]]
    matching SpatialInertia::CopyToFullMatrix6 (spatial_inertia.h).
    """
    m = mass[..., None, None]
    C = hat(p_com)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=C.dtype), C.shape)
    top = jnp.concatenate([m * G_rot, m * C], axis=-1)
    bot = jnp.concatenate([m * jnp.swapaxes(C, -1, -2), m * I3], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spatial_inertia_point_mass(mass, p):
    """Spatial inertia of a point mass at offset p from the reference point."""
    C = hat(p)
    G = C @ jnp.swapaxes(C, -1, -2)  # unit inertia of a point: hat(p) hat(p)^T
    return spatial_inertia_matrix(mass, p, G)


def shift_spatial_inertia(M, p_PQ):
    """Shift a 6x6 spatial inertia from about-P to about-Q (same body, frame).

    Velocities at the two points relate by V_Q = T V_P with
    T = [[I,0],[-hat(p_PQ),I]]; kinetic-energy invariance gives
    M_Q = T^{-T} M_P T^{-1} with T^{-1} = [[I,0],[hat(p_PQ),I]].
    """
    batch = M.shape[:-2]
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), batch + (3, 3))
    Z = jnp.zeros_like(I3)
    P = hat(p_PQ)
    Y = jnp.concatenate(
        [jnp.concatenate([I3, Z], axis=-1), jnp.concatenate([P, I3], axis=-1)],
        axis=-2,
    )
    return jnp.swapaxes(Y, -1, -2) @ M @ Y
