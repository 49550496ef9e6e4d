"""MPM deformable visualization over the Meshcat bridge.

The reference fork grew deformable visualization in two places: its
MeshcatVisualizer consumes MPM cloth state through `MpmPortData`
(`geometry/meshcat_visualizer.h`), and its DrakeVisualizer publishes MPM
meshes (`geometry/drake_visualizer.h` includes `gpu_mpm/cpu_mpm_model.h`).
This module plays the same role for drake_tpu's MPM/FEM states:

- ``publish_mpm_particles`` / ``publish_mpm_cloth``: live per-frame
  publishing (the interactive-viewer path);
- ``record_mpm_rollout``: bakes a vertex-animated rollout into a
  MeshcatAnimation.  three.js AnimationClips key object *properties*, not
  vertex buffers, so each frame is published as its own object and the
  clip keys per-frame ``visible`` booleans — the deformable analog of the
  rigid ``set_transform`` keyframes; it survives ``static_html`` export
  and composes with a rigid-body animation recorded at the same fps.
"""

from typing import Optional, Sequence

import numpy as np

from drake_tpu.viz.meshcat import Meshcat, MeshcatAnimation


def _positions_3n(x) -> np.ndarray:
    """(n, 3) or (3, n) array-like (device or host) -> (3, n) float32."""
    x = np.asarray(x, np.float32)
    if x.ndim != 2 or 3 not in x.shape:
        raise ValueError(f"expected (n, 3) positions, got {x.shape}")
    return x if x.shape[0] == 3 else x.T


def height_colors(positions_3n: np.ndarray) -> np.ndarray:
    """(3, n) height-ramp colors in [0, 1] — the quick way to read depth
    structure in a raw particle cloud."""
    z = positions_3n[2]
    lo, hi = float(z.min()), float(z.max())
    t = (z - lo) / (hi - lo + 1e-12)
    return np.stack([t, 0.35 + 0.3 * t, 1.0 - t]).astype(np.float32)


def publish_mpm_particles(
    viz: Meshcat,
    path: str,
    positions,
    color: Optional[int] = None,
    size: float = 0.008,
) -> None:
    """Live MPM particle-cloud publish (one frame).

    positions: (n, 3) particle positions (a ``MpmState.x`` slice works
    directly).  With ``color=None`` a height colormap is applied.
    """
    pos = _positions_3n(positions)
    if color is not None:
        viz.set_points(path, pos, size=size, color=int(color))
    else:
        viz.set_points(path, pos, colors=height_colors(pos), size=size)


def publish_mpm_cloth(
    viz: Meshcat,
    path: str,
    vertices,
    faces,
    color: int = 0x4FA3D1,
    opacity: float = 1.0,
) -> None:
    """Live cloth/FEM-surface publish (one frame).

    vertices: (n, 3); faces: (m, 3) int triangles (``cloth.ClothMesh.tri``
    or a FEM surface extraction).
    """
    verts = _positions_3n(vertices)
    tris = np.asarray(faces, np.uint32)
    tris = tris if tris.shape[0] == 3 else tris.T
    viz.set_triangle_mesh(path, verts, tris, color=color, opacity=opacity)


def record_mpm_rollout(
    viz: Meshcat,
    path: str,
    frames: Sequence,
    faces=None,
    frames_per_second: float = 16.0,
    color: int = 0x4FA3D1,
    size: float = 0.008,
    opacity: float = 1.0,
    max_frames: int = 60,
    animation: Optional[MeshcatAnimation] = None,
    publish: bool = True,
) -> MeshcatAnimation:
    """Record a deformable rollout as a visibility-keyed animation.

    frames: sequence of (n, 3) vertex/particle arrays (one per frame).
    faces: (m, 3) triangles shared by every frame (cloth/FEM), or None for
    a particle cloud.  Pass an existing ``animation`` (e.g. from
    ``visualization.record_rollout`` at the same fps) to compose rigid and
    deformable tracks into one clip; set ``publish=False`` to defer the
    ``set_animation`` send until all tracks are recorded.
    """
    n = len(frames)
    stride = max(1, -(-n // max_frames))  # ceil-div: at most max_frames
    kept = list(range(0, n, stride))
    anim = animation or MeshcatAnimation(frames_per_second=frames_per_second)
    for f_idx, k in enumerate(kept):
        sub = f"{path}/frame{f_idx}"
        if faces is None:
            publish_mpm_particles(viz, sub, frames[k], size=size)
        else:
            publish_mpm_cloth(
                viz, sub, frames[k], faces, color=color, opacity=opacity
            )
        # Only frame 0 is visible before the clip plays.
        if f_idx > 0:
            viz.set_property(sub, "visible", False)
        # Visibility window [kept[i], kept[i+1]) keyed at ORIGINAL frame
        # indices, so the clip spans the source timeline (n frames at the
        # recording fps) regardless of stride and stays in sync with rigid
        # tracks recorded at the same fps.  Boolean tracks hold their value
        # until the next key, so one on-key and one off-key suffice.
        if f_idx > 0:
            anim.set_property(0, sub, "visible", "boolean", False)
        anim.set_property(k, sub, "visible", "boolean", True)
        if f_idx + 1 < len(kept):
            anim.set_property(kept[f_idx + 1], sub, "visible", "boolean", False)
        elif k < n - 1:
            # Hold the last kept frame through the end of the source clip.
            anim.set_property(n - 1, sub, "visible", "boolean", True)
    if publish:
        viz.set_animation(anim)
    return anim


# ---------------------------------------------------------------------------
# Wire publishing (the fork's DrakeVisualizer MPM-mesh path).
# ---------------------------------------------------------------------------


class DeformableMeshWirePublisher:
    """Publish deformable (MPM cloth / FEM surface) meshes over the typed
    message wire — the fork's DrakeVisualizer MPM publishing role
    (geometry/drake_visualizer.h + lcmtypes/experimental_lcmt_deformable_*):
    topology is sent ONCE on ``<prefix>_INIT``; each frame sends only
    vertex positions on ``<prefix>_UPDATE``.

        node = PubSub("memq://")
        pub = DeformableMeshWirePublisher(
            node, [("cloth", cloth.faces, cloth.x.shape[0])])
        ...per frame...
        pub.publish(t, [cloth.x])
    """

    def __init__(self, node, meshes, channel_prefix: str = "DEFORMABLE_MESHES"):
        """``meshes``: list of (name, faces (nf,3) int, num_vertices)."""
        from drake_tpu.io import messages as m

        self._m = m
        self.names = [name for name, _, _ in meshes]
        self.init_pub = m.TypedPublisher(
            node, channel_prefix + "_INIT",
            m.experimental_lcmt_deformable_tri_meshes_init)
        self.update_pub = m.TypedPublisher(
            node, channel_prefix + "_UPDATE",
            m.experimental_lcmt_deformable_tri_meshes_update)
        self.init_pub.publish(m.experimental_lcmt_deformable_tri_meshes_init(
            meshes=[
                m.experimental_lcmt_deformable_tri_mesh_init(
                    name=name, num_vertices=int(nv),
                    tris=[
                        m.experimental_lcmt_deformable_tri(
                            vertices=np.asarray(f, np.int32))
                        for f in np.asarray(faces)
                    ],
                )
                for name, faces, nv in meshes
            ]
        ))

    def publish(self, t: float, vertex_arrays: Sequence[np.ndarray]):
        """Per-frame vertex positions, one (nv, 3) array per mesh."""
        m = self._m
        self.update_pub.publish(
            m.experimental_lcmt_deformable_tri_meshes_update(
                timestamp=int(float(t) * 1e6),
                meshes=[
                    m.experimental_lcmt_deformable_tri_mesh_update(
                        name=name,
                        vertices_W=np.asarray(x, np.float64),
                    )
                    for name, x in zip(self.names, vertex_arrays)
                ],
            )
        )
