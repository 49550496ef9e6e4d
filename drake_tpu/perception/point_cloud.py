"""Point clouds: depth-image back projection and basic cloud ops.

Re-derivation of the reference's perception stack (perception/
point_cloud.h, depth_image_to_point_cloud.h): a point cloud is just an
(N, 3) array (+ optional per-point attributes) — no flags/field plumbing
needed when everything is a pytree.  All ops are jit/vmap-able.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class PointCloud(NamedTuple):
    xyz: jnp.ndarray  # (N, 3)
    valid: jnp.ndarray  # (N,) bool — fixed-size masked cloud (XLA static)
    rgb: Optional[jnp.ndarray] = None  # (N, 3) optional colors


def depth_image_to_point_cloud(
    depth,  # (H, W) metric depth along +z_C; inf/nan/0 = invalid
    camera_info,
    X_WC=None,  # optional (R_WC, p_WC) to express in world
    rgb=None,  # optional (H, W) or (H, W, 3) intensities
) -> PointCloud:
    """Back-project a depth image through the pinhole model
    (depth_image_to_point_cloud.h semantics, fixed-size masked output)."""
    H, W = depth.shape
    fx, fy = camera_info.focal
    cx, cy = camera_info.center
    us = jnp.arange(W, dtype=depth.dtype)
    vs = jnp.arange(H, dtype=depth.dtype)
    U, V = jnp.meshgrid(us, vs)
    valid = jnp.isfinite(depth) & (depth > 0)
    z = jnp.where(valid, depth, 1.0)
    x = (U - cx) / fx * z
    y = (V - cy) / fy * z
    p_C = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    if X_WC is not None:
        R_WC, p_WC = X_WC
        p = p_C @ R_WC.T + p_WC
    else:
        p = p_C
    colors = None
    if rgb is not None:
        colors = rgb.reshape(H * W, -1)
        if colors.shape[1] == 1:
            colors = jnp.tile(colors, (1, 3))
    return PointCloud(xyz=p, valid=valid.reshape(-1), rgb=colors)


def transform(cloud: PointCloud, R, p) -> PointCloud:
    return cloud._replace(xyz=cloud.xyz @ jnp.asarray(R).T + jnp.asarray(p))


def crop(cloud: PointCloud, lower, upper) -> PointCloud:
    """Axis-aligned box crop — invalidates points outside (static shape)."""
    inside = jnp.all(
        (cloud.xyz >= jnp.asarray(lower)) & (cloud.xyz <= jnp.asarray(upper)),
        axis=1,
    )
    return cloud._replace(valid=cloud.valid & inside)


def centroid(cloud: PointCloud):
    w = cloud.valid.astype(cloud.xyz.dtype)
    return (w @ cloud.xyz) / jnp.maximum(jnp.sum(w), 1e-9)


def voxel_downsample(cloud: PointCloud, voxel_size: float, max_points: int):
    """Keep at most one point per voxel (first occupant wins); returns a
    fixed-size cloud of max_points (XLA-static masked output)."""
    key = jnp.floor(cloud.xyz / voxel_size).astype(jnp.int32)
    # Hash voxels; same-voxel points collide.
    h = (
        key[:, 0] * 73856093 ^ key[:, 1] * 19349663 ^ key[:, 2] * 83492791
    )
    h = jnp.where(cloud.valid, h, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(h)
    hs = h[order]
    first = jnp.concatenate(
        [jnp.ones(1, bool), hs[1:] != hs[:-1]]
    ) & (hs != jnp.iinfo(jnp.int32).max)
    # Compact the first-occupants to the front (stable).
    rank = jnp.cumsum(first) - 1
    idx = jnp.where(first, rank, max_points)
    out = jnp.zeros((max_points + 1, 3), cloud.xyz.dtype)
    out = out.at[jnp.minimum(idx, max_points)].set(cloud.xyz[order])
    n = jnp.sum(first)
    valid = jnp.arange(max_points) < jnp.minimum(n, max_points)
    return PointCloud(xyz=out[:max_points], valid=valid, rgb=None)
