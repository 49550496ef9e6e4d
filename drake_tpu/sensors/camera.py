"""Depth/label camera by SDF sphere tracing — the TPU-native render engine.

The reference renders depth/label images through OpenGL/VTK rasterizers
(geometry/render_gl, render_vtk behind systems/sensors/rgbd_sensor.h).
Neither exists on a TPU; what a TPU is spectacular at is evaluating one
function on a million points.  So the camera here SPHERE-TRACES the
scene's analytic signed-distance field: one vmap over pixels, a fixed
lax.scan of SDF evaluations per ray, normals via jax.grad of the SDF —
producing depth, label (geometry id), normal, and Lambert-shaded images
with no rasterizer and full differentiability (useful for perception-in-
the-loop gradients the reference cannot provide).

Camera conventions follow systems/sensors/camera_info.h: pinhole
intrinsics (fx, fy, cx, cy), +z looking forward, +x right, +y down.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.geometry import scene_graph
from drake_tpu.geometry import shapes as sh
from drake_tpu.multibody import kinematics as kin


@dataclasses.dataclass(frozen=True)
class CameraInfo:
    """Pinhole intrinsics (reference systems/sensors/camera_info.h)."""

    width: int
    height: int
    fov_y: float = np.pi / 4

    @property
    def focal(self):
        f = self.height / (2.0 * np.tan(self.fov_y / 2.0))
        return f, f

    @property
    def center(self):
        return (self.width - 1) / 2.0, (self.height - 1) / 2.0


class RenderResult(NamedTuple):
    depth: jnp.ndarray  # (H, W) metric depth along +z; inf = miss
    label: jnp.ndarray  # (H, W) int32 geometry index; -1 = background
    normal: jnp.ndarray  # (H, W, 3) world-frame surface normals
    rgb: jnp.ndarray  # (H, W) Lambert shade in [0, 1]


def color_image(result: RenderResult, colors, background=(0.0, 0.0, 0.0)):
    """(H, W, 3) color image — the RgbdSensor color port
    (systems/sensors/rgbd_sensor.h): per-geometry albedo ``colors``
    ((n_geoms, 3) in [0,1]) modulated by the Lambert shade, background
    where no geometry was hit."""
    colors = jnp.asarray(colors)
    bg = jnp.asarray(background, colors.dtype)
    albedo = jnp.where(
        (result.label >= 0)[..., None],
        colors[jnp.clip(result.label, 0, colors.shape[0] - 1)],
        bg,
    )
    return albedo * jnp.where(
        result.label >= 0, result.rgb, 1.0)[..., None]


def _geom_sdf(geom, R_WG, p_WG, p):
    s = geom.shape
    if isinstance(s, sh.Sphere):
        return jnp.linalg.norm(p - p_WG) - s.radius
    if isinstance(s, sh.Box):
        return sh.box_sdf_point(R_WG, p_WG, jnp.asarray(s.size, p.dtype), p)[0]
    if isinstance(s, sh.Capsule):
        a, b = sh.capsule_segment_points(R_WG, p_WG, s.length)
        c = sh.closest_point_on_segment(a, b, p)
        return jnp.linalg.norm(p - c) - s.radius
    if isinstance(s, sh.Cylinder):
        # Exact cylinder SDF in the geometry frame.
        p_G = R_WG.T @ (p - p_WG)
        r = jnp.sqrt(p_G[0] ** 2 + p_G[1] ** 2 + 1e-18)
        d = jnp.stack([r - s.radius, jnp.abs(p_G[2]) - s.length / 2])
        return jnp.minimum(jnp.max(d), 0.0) + jnp.linalg.norm(
            jnp.maximum(d, 0.0)
        )
    if isinstance(s, sh.HalfSpace):
        return sh.halfspace_sdf_point(R_WG, p_WG, p)[0]
    if isinstance(s, sh.Ellipsoid):
        return sh.ellipsoid_sdf_point(R_WG, p_WG, s.radii, p)[0]
    if isinstance(s, sh.MeshSdf):
        # Baked voxel-grid SDF: meshes render through the same sphere
        # tracer (the role of the reference's mesh render engines).  The
        # outside-the-grid bound is conservative, so tracing never
        # overshoots the surface.
        return sh.mesh_sdf_point(R_WG, p_WG, s, p)[0]
    raise TypeError(f"no SDF for {type(s)}")


def scene_sdf(geoms: Sequence, R_WB, p_WB, p):
    """(phi_min, argmin geometry index) of world point p over all geoms."""
    phis = []
    for g in geoms:
        if g.body < 0:
            R_WG = jnp.asarray(g.R_BG, p.dtype)
            p_WG = jnp.asarray(g.p_BG, p.dtype)
        else:
            R_WG = R_WB[g.body] @ jnp.asarray(g.R_BG, p.dtype)
            p_WG = p_WB[g.body] + R_WB[g.body] @ jnp.asarray(g.p_BG, p.dtype)
        phis.append(_geom_sdf(g, R_WG, p_WG, p))
    phis = jnp.stack(phis)
    return jnp.min(phis), jnp.argmin(phis)


def _is_triangle_geom(g) -> bool:
    """True if this geometry renders as REAL triangles (a Mesh carrying
    ``faces``) instead of through an SDF — the render_vtk/render_gl
    triangle-mesh role: parsed robot meshes render without SDF baking."""
    return isinstance(g.shape, sh.Mesh) and g.shape.faces is not None


def render(
    geoms: Sequence,
    camera: CameraInfo,
    X_WC,  # (R_WC (3,3), p_WC (3,)) camera pose
    model=None,
    params=None,
    q=None,
    max_depth: float = 10.0,
    num_steps: int = 64,
    light_dir=(0.4, -0.3, 0.85),
) -> RenderResult:
    """Render depth/label/normal/shaded images of the collision scene.

    If (model, params, q) are given, body-attached geoms follow FK;
    otherwise only world-anchored geoms render.  Only PERCEPTION-role
    geometries render (geometry_roles.h: render engines consume the
    perception role).

    Geometry paths: analytic/SDF shapes sphere-trace; Mesh shapes with
    ``faces`` ray-cast their real triangles (per-pixel Moller-Trumbore,
    batched over faces — the reference's render_vtk/render_gl rasterizer
    role, done the TPU way: one dense einsum-friendly intersection batch
    per pixel instead of a BVH).  The nearer of the two hits wins, so
    mixed scenes compose.
    """
    geoms = [g for g in geoms
             if scene_graph.has_role(g, scene_graph.PERCEPTION)]
    R_WC, p_WC = X_WC
    R_WC = jnp.asarray(R_WC)
    p_WC = jnp.asarray(p_WC)
    dtype = p_WC.dtype
    if model is not None:
        R_WB, p_WB = kin.forward_kinematics(model, params, q)
    else:
        nb = max([g.body for g in geoms] + [0]) + 1
        R_WB = jnp.tile(jnp.eye(3, dtype=dtype), (nb, 1, 1))
        p_WB = jnp.zeros((nb, 3), dtype)

    sdf_ids = [i for i, g in enumerate(geoms) if not _is_triangle_geom(g)]
    tri_ids = [i for i, g in enumerate(geoms) if _is_triangle_geom(g)]
    sdf_geoms = [geoms[i] for i in sdf_ids]
    sdf_label = jnp.asarray(sdf_ids + [0], jnp.int32)  # +pad for empty

    def geom_pose(g):
        if g.body < 0:
            return (jnp.asarray(g.R_BG, dtype), jnp.asarray(g.p_BG, dtype))
        R = R_WB[g.body] @ jnp.asarray(g.R_BG, dtype)
        p = p_WB[g.body] + R_WB[g.body] @ jnp.asarray(g.p_BG, dtype)
        return R, p

    # World-space triangle soup over all triangle geoms: v0/e1/e2 (Ft, 3)
    # plus each face's geometry label.
    tri_v0 = tri_e1 = tri_e2 = tri_lab = None
    if tri_ids:
        v0s, e1s, e2s, labs = [], [], [], []
        for i in tri_ids:
            g = geoms[i]
            R_WG, p_WG = geom_pose(g)
            verts = jnp.asarray(np.asarray(g.shape.vertices), dtype)
            verts = verts @ R_WG.T + p_WG
            f = jnp.asarray(np.asarray(g.shape.faces), jnp.int32)
            a, b, c = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
            v0s.append(a)
            e1s.append(b - a)
            e2s.append(c - a)
            labs.append(jnp.full((f.shape[0],), i, jnp.int32))
        tri_v0 = jnp.concatenate(v0s)
        tri_e1 = jnp.concatenate(e1s)
        tri_e2 = jnp.concatenate(e2s)
        tri_lab = jnp.concatenate(labs)

    sdf = lambda p: scene_sdf(sdf_geoms, R_WB, p_WB, p)
    phi_only = lambda p: sdf(p)[0]

    # Surface normals by TETRAHEDRAL finite differences, not jax.grad:
    # exactly ON a face/edge the SDF's norm-of-max terms sit at sqrt(0),
    # whose autodiff gradient is NaN (box/cylinder pixels rendered NaN
    # normals at ~2% of hits).  The 4-tap tetrahedron estimator is the
    # standard ray-marcher normal and is NaN-free by construction.
    _tet = jnp.asarray(
        [[1, -1, -1], [-1, -1, 1], [-1, 1, -1], [1, 1, 1]], dtype
    )

    def grad_phi(p, h=1e-4):
        taps = jax.vmap(lambda k: k * phi_only(p + h * k))(_tet)
        return jnp.sum(taps, axis=0)

    fx, fy = camera.focal
    cx, cy = camera.center
    us = jnp.arange(camera.width, dtype=dtype)
    vs = jnp.arange(camera.height, dtype=dtype)
    U, V = jnp.meshgrid(us, vs)  # (H, W)
    # Camera-frame ray directions (+z forward, +x right, +y down).
    d_C = jnp.stack(
        [(U - cx) / fx, (V - cy) / fy, jnp.ones_like(U)], axis=-1
    )
    d_C = d_C / jnp.linalg.norm(d_C, axis=-1, keepdims=True)
    d_W = jnp.einsum("ij,hwj->hwi", R_WC, d_C)

    lightv = jnp.asarray(light_dir, dtype)
    lightv = lightv / jnp.linalg.norm(lightv)

    def trace(direction):
        # --- SDF path: sphere tracing --------------------------------------
        if sdf_geoms:
            def step(t, _):
                p = p_WC + t * direction
                phi, _ = sdf(p)
                # Sphere tracing: advance by the SDF (clamped for safety).
                t_new = t + jnp.clip(phi, 1e-4, 1.0)
                return jnp.minimum(t_new, max_depth), None

            t_s, _ = jax.lax.scan(
                step, jnp.asarray(1e-3, dtype), None, length=num_steps
            )
            p_hit = p_WC + t_s * direction
            phi, label_s = sdf(p_hit)
            hit_s = phi < 1e-2
            n_s = grad_phi(p_hit)
            n_s = n_s / jnp.maximum(jnp.linalg.norm(n_s), 1e-9)
            label_s = sdf_label[label_s]
        else:
            t_s = jnp.asarray(max_depth, dtype)
            hit_s = jnp.asarray(False)
            n_s = jnp.zeros(3, dtype)
            label_s = jnp.asarray(0, jnp.int32)

        # --- triangle path: Moller-Trumbore over the face soup -------------
        if tri_ids:
            pvec = jnp.cross(direction[None, :], tri_e2)
            det = jnp.sum(tri_e1 * pvec, axis=-1)
            ok = jnp.abs(det) > 1e-12
            inv = 1.0 / jnp.where(ok, det, 1.0)
            tvec = p_WC[None, :] - tri_v0
            u = jnp.sum(tvec * pvec, axis=-1) * inv
            qvec = jnp.cross(tvec, tri_e1)
            v = jnp.sum(direction[None, :] * qvec, axis=-1) * inv
            t_f = jnp.sum(tri_e2 * qvec, axis=-1) * inv
            valid = (
                ok & (u >= 0) & (v >= 0) & (u + v <= 1)
                & (t_f > 1e-3) & (t_f < max_depth)
            )
            t_f = jnp.where(valid, t_f, jnp.inf)
            fi = jnp.argmin(t_f)
            t_t = t_f[fi]
            hit_t = jnp.isfinite(t_t)
            n_face = jnp.cross(tri_e1[fi], tri_e2[fi])
            n_face = n_face / jnp.maximum(jnp.linalg.norm(n_face), 1e-12)
            # Face normal toward the viewer (meshes need not be oriented).
            n_t = -jnp.sign(jnp.dot(n_face, direction)) * n_face
            label_t = tri_lab[fi]
        else:
            t_t = jnp.asarray(jnp.inf, dtype)
            hit_t = jnp.asarray(False)
            n_t = jnp.zeros(3, dtype)
            label_t = jnp.asarray(0, jnp.int32)

        # Nearer of the two hits wins.
        use_tri = hit_t & (~hit_s | (t_t < t_s))
        hit = hit_s | hit_t
        t = jnp.where(use_tri, t_t, t_s)
        n = jnp.where(use_tri, n_t, n_s)
        label = jnp.where(use_tri, label_t, label_s)
        depth_z = t * (direction @ R_WC[:, 2])  # metric depth along +z_C
        shade = jnp.clip(n @ lightv, 0.0, 1.0) * 0.85 + 0.15
        return (
            jnp.where(hit, depth_z, jnp.inf),
            jnp.where(hit, label, -1),
            jnp.where(hit, n, 0.0),
            jnp.where(hit, shade, 0.0),
        )

    depth, label, normal, rgb = jax.vmap(jax.vmap(trace))(d_W)
    return RenderResult(
        depth=depth, label=label.astype(jnp.int32), normal=normal, rgb=rgb
    )


@dataclasses.dataclass(frozen=True)
class Material:
    """Per-geometry surface material (the render_gl/render_vtk material
    role: geometry/render/render_material.h — diffuse + Blinn-Phong
    specular + an optional procedural checker 'texture')."""

    diffuse: Tuple[float, float, float] = (0.8, 0.8, 0.8)
    specular: float = 0.3
    shininess: float = 32.0
    # checker_scale > 0 paints a world-xy checkerboard (the classic ground
    # texture) blending `diffuse` with `checker_color` per cell.
    checker_scale: float = 0.0
    checker_color: Tuple[float, float, float] = (0.2, 0.2, 0.2)
    # FILE/IMAGE texture (render_material.h diffuse_map role): an
    # (H, W, 3) array in [0, 1] or a file path (loaded via PIL) — sampled
    # with a tiling world-xy planar projection at `texture_scale`
    # tiles/meter.  Overrides diffuse/checker where set.
    texture: object = None
    texture_scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class DirectionalLight:
    """Directional light (render_gl's light set role)."""

    direction: Tuple[float, float, float] = (0.4, -0.3, 0.85)  # TOWARD it
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    intensity: float = 1.0


_DEFAULT_LIGHTS = (
    DirectionalLight((0.4, -0.3, 0.85), (1.0, 1.0, 1.0), 0.9),
    DirectionalLight((-0.5, 0.2, 0.6), (0.6, 0.65, 0.75), 0.35),
)


def render_rgb(
    geoms: Sequence,
    camera: CameraInfo,
    X_WC,
    materials: Sequence[Material],
    lights: Sequence[DirectionalLight] = _DEFAULT_LIGHTS,
    model=None,
    params=None,
    q=None,
    ambient: float = 0.15,
    shadows: bool = True,
    background=(0.05, 0.07, 0.1),
    max_depth: float = 10.0,
    num_steps: int = 64,
    shadow_steps: int = 24,
):
    """Full-color render: materials + multi-light Blinn-Phong shading +
    sphere-traced soft shadows — the RGB engine the reference gets from
    OpenGL/VTK rasterizers (geometry/render_gl/, render_vtk/), built on the
    same differentiable SDF tracer as the depth/label camera.

    Returns (rgb (H, W, 3) in [0, 1], RenderResult) — the geometry pass is
    shared, so depth/label/normal come for free.
    """
    res = render(
        geoms, camera, X_WC, model=model, params=params, q=q,
        max_depth=max_depth, num_steps=num_steps,
    )
    R_WC, p_WC = X_WC
    p_WC = jnp.asarray(p_WC)
    dtype = p_WC.dtype
    if model is not None:
        R_WB, p_WB = kin.forward_kinematics(model, params, q)
    else:
        nb = max([g.body for g in geoms] + [0]) + 1
        R_WB = jnp.tile(jnp.eye(3, dtype=dtype), (nb, 1, 1))
        p_WB = jnp.zeros((nb, 3), dtype)
    # Shadow rays march the SDF scene only (triangle geoms don't occlude —
    # flat-shaded mesh pixels still receive shadows FROM the SDF shapes).
    sdf_only = [g for g in geoms if not _is_triangle_geom(g)]
    if sdf_only:
        sdf = lambda p: scene_sdf(sdf_only, R_WB, p_WB, p)[0]
    else:
        sdf = lambda p: jnp.asarray(jnp.inf, dtype)

    # Reconstruct hit points from the depth image (depth is along +z_C).
    R_WC_j = jnp.asarray(R_WC)
    fx, fy = camera.focal
    cx, cy = camera.center
    us = jnp.arange(camera.width, dtype=dtype)
    vs = jnp.arange(camera.height, dtype=dtype)
    U, V = jnp.meshgrid(us, vs)
    d_C = jnp.stack(
        [(U - cx) / fx, (V - cy) / fy, jnp.ones_like(U)], axis=-1
    )
    depth_safe = jnp.where(jnp.isfinite(res.depth), res.depth, max_depth)
    p_hit = p_WC + jnp.einsum(
        "ij,hwj->hwi", R_WC_j, d_C * depth_safe[..., None]
    )

    hit = res.label >= 0
    n = res.normal
    view = p_WC - p_hit
    view = view / jnp.maximum(
        jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9
    )

    # Material lookup per pixel.
    diff_tab = jnp.asarray([m.diffuse for m in materials], dtype)
    spec_tab = jnp.asarray([m.specular for m in materials], dtype)
    shin_tab = jnp.asarray([m.shininess for m in materials], dtype)
    chk_tab = jnp.asarray([m.checker_scale for m in materials], dtype)
    chk_col = jnp.asarray([m.checker_color for m in materials], dtype)
    lbl = jnp.clip(res.label, 0, len(materials) - 1)
    base = diff_tab[lbl]
    # Procedural checker in world xy (the ground-texture role).
    scale = chk_tab[lbl]
    cell = jnp.floor(p_hit[..., 0] * scale) + jnp.floor(p_hit[..., 1] * scale)
    checker_on = (scale[...] > 0) & (jnp.mod(cell, 2.0) == 0.0)
    base = jnp.where(checker_on[..., None], chk_col[lbl], base)
    # Image textures (file or array), planar world-xy projection.
    for ti_mat, m in enumerate(materials):
        if m.texture is None:
            continue
        tex = m.texture
        if isinstance(tex, str):
            from PIL import Image

            tex = (
                np.asarray(Image.open(tex).convert("RGB"), np.float32)
                / 255.0
            )
        tex = jnp.asarray(tex, dtype)
        th, tw = tex.shape[0], tex.shape[1]
        uu = jnp.mod(p_hit[..., 0] * m.texture_scale, 1.0)
        vv = jnp.mod(p_hit[..., 1] * m.texture_scale, 1.0)
        ri = jnp.clip((vv * th).astype(jnp.int32), 0, th - 1)
        cj = jnp.clip((uu * tw).astype(jnp.int32), 0, tw - 1)
        base = jnp.where(
            (res.label == ti_mat)[..., None], tex[ri, cj], base
        )

    def soft_shadow(p0, ldir):
        """Sphere-traced occlusion toward the light (1 = unoccluded)."""

        def step(carry, _):
            t, k = carry
            phi = sdf(p0 + t * ldir)
            k = jnp.minimum(k, jnp.clip(8.0 * phi / t, 0.0, 1.0))
            return (t + jnp.clip(phi, 5e-3, 0.5), k), None

        (t, k), _ = jax.lax.scan(
            step, (jnp.asarray(2e-2, dtype), jnp.asarray(1.0, dtype)),
            None, length=shadow_steps,
        )
        return k

    rgb = ambient * base
    for li in lights:
        ldir = jnp.asarray(li.direction, dtype)
        ldir = ldir / jnp.linalg.norm(ldir)
        lcol = jnp.asarray(li.color, dtype) * li.intensity
        ndl = jnp.clip(jnp.einsum("hwi,i->hw", n, ldir), 0.0, 1.0)
        halfv = view + ldir
        halfv = halfv / jnp.maximum(
            jnp.linalg.norm(halfv, axis=-1, keepdims=True), 1e-9
        )
        ndh = jnp.clip(jnp.einsum("hwi,hwi->hw", n, halfv), 0.0, 1.0)
        spec = spec_tab[lbl] * ndh ** shin_tab[lbl]
        if shadows:
            sh = jax.vmap(jax.vmap(soft_shadow))(
                p_hit + 1e-2 * n, jnp.broadcast_to(ldir, p_hit.shape)
            )
        else:
            sh = 1.0
        rgb = rgb + (base * ndl[..., None] + spec[..., None]) * lcol * (
            jnp.asarray(sh)[..., None] if shadows else 1.0
        )

    bg = jnp.asarray(background, dtype)
    rgb = jnp.where(hit[..., None], jnp.clip(rgb, 0.0, 1.0), bg)
    return rgb, res


def look_at(eye, target, up=(0.0, 0.0, 1.0)):
    """Camera pose (R_WC, p_WC) with +z_C toward ``target``, +y_C down."""
    eye = np.asarray(eye, float)
    fwd = np.asarray(target, float) - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, float)
    right = np.cross(fwd, up)
    right = right / max(np.linalg.norm(right), 1e-12)
    down = np.cross(fwd, right)
    R_WC = np.stack([right, down, fwd], axis=1)
    return jnp.asarray(R_WC), jnp.asarray(eye)
