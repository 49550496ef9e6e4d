"""Visualization wiring: plant scenes -> Meshcat in one call.

Re-derivation of the reference's convenience tier (visualization/
visualization_config_functions.h AddDefaultVisualization +
geometry/meshcat_visualizer.h MeshcatVisualizer): publish every collision
geometry of a scene once, then stream body poses per step or record a
whole rollout as an animation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from drake_tpu.geometry import scene_graph
from drake_tpu.geometry import shapes as sh
from drake_tpu.multibody import kinematics as kin
from drake_tpu.viz.meshcat import Meshcat, MeshcatAnimation

_PALETTE = [0x3366CC, 0xDC3912, 0xFF9900, 0x109618, 0x990099, 0x0099C6,
            0xDD4477, 0x66AA00]


def add_scene_visualization(
    viz: Meshcat,
    geoms: Sequence,
    prefix: str = "plant",
) -> None:
    """Publish all geometries under ``prefix``; body-attached geoms live at
    'prefix/<body>/<name>' so one set_transform per body moves them.
    Only ILLUSTRATION-role geometries are published (geometry_roles.h:
    visualizers consume the illustration role)."""
    geoms = [g for g in geoms
             if scene_graph.has_role(g, scene_graph.ILLUSTRATION)]
    for k, g in enumerate(geoms):
        color = _PALETTE[k % len(_PALETTE)]
        path = f"{prefix}/body{g.body}/{g.name}"
        if isinstance(g.shape, sh.HalfSpace):
            viz.set_object(
                path, sh.Box((4.0, 4.0, 0.01)), color=0xAAAAAA,
                R=np.asarray(g.R_BG), p=np.asarray(g.p_BG) - [0, 0, 0.005],
            )
        elif isinstance(g.shape, sh.Mesh):
            viz.set_points(
                path,
                np.asarray(g.shape.vertices).T.astype(np.float32),
                size=0.01,
            )
            viz.set_transform(path, R=np.asarray(g.R_BG), p=np.asarray(g.p_BG))
        else:
            viz.set_object(
                path, g.shape, color=color,
                R=np.asarray(g.R_BG), p=np.asarray(g.p_BG),
            )


def publish_state(viz, model, params, q, geoms, prefix: str = "plant"):
    """Push the current body poses (live visualization step)."""
    R_WB, p_WB = kin.forward_kinematics(model, params, q)
    R_WB = np.asarray(R_WB)
    p_WB = np.asarray(p_WB)
    for body in sorted({g.body for g in geoms if g.body >= 0}):
        viz.set_transform(
            f"{prefix}/body{body}", R=R_WB[body], p=p_WB[body]
        )


def record_rollout(
    viz: Meshcat,
    model,
    params,
    qs: np.ndarray,  # (N, nq) configuration trajectory
    geoms,
    time_step: float,
    prefix: str = "plant",
    max_frames: int = 120,
) -> MeshcatAnimation:
    """Record a whole rollout as a meshcat animation (the
    MeshcatVisualizer::StartRecording/PublishRecording role)."""
    add_scene_visualization(viz, geoms, prefix)
    qs = np.asarray(qs)
    n = qs.shape[0]
    stride = max(1, n // max_frames)
    frames = list(range(0, n, stride))
    fps = min(30.0, 1.0 / (time_step * stride))
    anim = MeshcatAnimation(frames_per_second=fps)
    bodies = sorted({g.body for g in geoms if g.body >= 0})
    import jax.numpy as jnp

    for f_idx, k in enumerate(frames):
        R_WB, p_WB = kin.forward_kinematics(
            model, params, jnp.asarray(qs[k])
        )
        R_WB = np.asarray(R_WB)
        p_WB = np.asarray(p_WB)
        for body in bodies:
            anim.set_transform(
                f_idx, f"{prefix}/body{body}", R=R_WB[body], p=p_WB[body]
            )
    viz.set_animation(anim)
    return anim


def inertia_ellipsoid(mass: float, inertia_com: np.ndarray):
    """Equivalent solid ellipsoid of a rotational inertia about the com.

    The reference's InertiaVisualizer (visualization/inertia_visualizer.h
    CalcInertiaGeometry): find the uniform-density solid ellipsoid with the
    same mass and principal moments.  For a solid ellipsoid with semi-axes
    (a, b, c): Ixx = m (b^2 + c^2)/5 etc., so
        a = sqrt(2.5 (Iyy + Izz - Ixx) / m)   (and cyclic).

    Returns (semi_axes (3,), R (3,3) principal-axes rotation).
    """
    I = 0.5 * (np.asarray(inertia_com, float)
               + np.asarray(inertia_com, float).T)
    evals, evecs = np.linalg.eigh(I)
    if np.linalg.det(evecs) < 0:
        evecs[:, 2] = -evecs[:, 2]
    Ixx, Iyy, Izz = evals
    m = max(float(mass), 1e-12)
    a2 = max(2.5 * (Iyy + Izz - Ixx) / m, 1e-12)
    b2 = max(2.5 * (Izz + Ixx - Iyy) / m, 1e-12)
    c2 = max(2.5 * (Ixx + Iyy - Izz) / m, 1e-12)
    return np.sqrt([a2, b2, c2]), evecs


def add_inertia_visualization(
    viz: Meshcat, model, params, prefix: str = "inertia",
    color: int = 0x00FF00,
) -> None:
    """Publish each body's equivalent inertia ellipsoid (AddDefaultVisualization's
    inertia layer).  Ellipsoids are drawn as scaled spheres at the body com
    in the body frame; drive them with the same per-body transforms as the
    plant geometry (publish_state with this prefix)."""
    mass = np.asarray(params.mass)
    com = np.asarray(params.com)
    inertia = np.asarray(params.inertia_com)
    for body in range(model.num_bodies):
        if mass[body] <= 0:
            continue
        semi, R_BE = inertia_ellipsoid(mass[body], inertia[body])
        path = f"{prefix}/body{body}/ellipsoid"
        viz.set_object(
            path, sh.Sphere(1.0), color=color, opacity=0.35,
            R=R_BE @ np.diag(semi), p=com[body],
        )
