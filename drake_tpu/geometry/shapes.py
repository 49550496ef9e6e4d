"""Collision shapes with analytic on-device signed-distance functions.

The reference's proximity engine is FCL-based narrow/broad phase on the CPU
(reference: geometry/proximity/, geometry/query_object.h:303
ComputePointPairPenetration, :424 ComputeSignedDistancePairwiseClosestPoints).
The fork's MPM even round-trips particles to the host to query SceneGraph
(deformable_driver.h:120-196) — a device boundary the TPU design eliminates:
every shape here has a closed-form SDF/witness computation that runs inside
jit, so contact queries fuse into the physics step.

All functions operate in world frame given the shape pose (R_WG, p_WG) and
return (phi, normal_W, witness point).  Conventions: phi < 0 means
penetration; the normal points FROM the other object INTO this one as
appropriate per pair function in scene.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Sphere:
    radius: float


@dataclasses.dataclass(frozen=True)
class Box:
    size: Tuple[float, float, float]  # full extents (lx, ly, lz)


@dataclasses.dataclass(frozen=True)
class Capsule:
    radius: float
    length: float  # cylinder segment length (along local z)


@dataclasses.dataclass(frozen=True)
class Cylinder:
    radius: float
    length: float


@dataclasses.dataclass(frozen=True)
class HalfSpace:
    """The region z <= 0 in the geometry frame (normal = +z)."""


def halfspace_sdf_point(R_WG, p_WG, p_W):
    """Signed distance of point(s) p_W to the halfspace surface; normal +z_G."""
    n_W = R_WG[..., :, 2]
    phi = jnp.einsum("...i,...i->...", p_W - p_WG, n_W)
    return phi, n_W


def box_sdf_point(R_WG, p_WG, size, p_W):
    """Signed distance of point p_W to a box; returns (phi, normal_W).

    Exact outside; inside uses the nearest-face distance (negative).
    """
    half = jnp.asarray(size, p_W.dtype) / 2.0
    p_G = jnp.einsum("...ji,...j->...i", R_WG, p_W - p_WG)  # R^T (p - c)
    d = jnp.abs(p_G) - half
    # Outside distance.
    outside = jnp.maximum(d, 0.0)
    dist_out = jnp.linalg.norm(outside, axis=-1)
    # Inside: largest (closest to zero) component of d.
    dist_in = jnp.max(d, axis=-1)
    phi = jnp.where(dist_in > 0, dist_out, dist_in)
    # Normal: outside -> gradient of outside distance; inside -> nearest face.
    eps = 1e-12
    n_out = outside * jnp.sign(p_G) / jnp.maximum(dist_out[..., None], eps)
    face = jnp.argmax(d, axis=-1)
    n_in = jnp.sign(p_G) * (
        jnp.arange(3) == face[..., None]
    ).astype(p_W.dtype)
    n_G = jnp.where((dist_in > 0)[..., None], n_out, n_in)
    n_W = jnp.einsum("...ij,...j->...i", R_WG, n_G)
    return phi, n_W


def capsule_segment_points(R_WG, p_WG, length):
    """Endpoints of the capsule's core segment in world frame."""
    z = R_WG[..., :, 2]
    a = p_WG - 0.5 * length * z
    b = p_WG + 0.5 * length * z
    return a, b


def closest_point_on_segment(a, b, p):
    ab = b - a
    t = jnp.einsum("...i,...i->...", p - a, ab) / jnp.maximum(
        jnp.einsum("...i,...i->...", ab, ab), 1e-12
    )
    t = jnp.clip(t, 0.0, 1.0)
    return a + t[..., None] * ab


def box_corners(R_WG, p_WG, size):
    """All 8 corners of a box in world frame: (8, 3)."""
    half = np.asarray(size) / 2.0
    signs = np.array(
        [
            [sx, sy, sz]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ],
        dtype=np.float64,
    )
    corners_G = jnp.asarray(signs * half, R_WG.dtype)
    return p_WG + jnp.einsum("ij,kj->ki", R_WG, corners_G)
