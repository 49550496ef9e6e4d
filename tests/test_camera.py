"""RGB render engine tests (sensors/camera.py render_rgb — materials,
lights, soft shadows; the render_gl/render_vtk role, reference
geometry/render_gl/, geometry/render_vtk/)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry
from drake_tpu.sensors import camera



class TestRgbRender:
    """RGB engine (camera.render_rgb): materials + lights + shadows — the
    render_gl/render_vtk role on the SDF tracer."""

    def _scene(self):
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=0.5),
            CollisionGeometry(
                name="ball", body=-1, shape=sh.Sphere(0.3),
                p_BG=(0.0, 0.0, 0.3), friction=0.5,
            ),
        ]
        mats = [
            camera.Material(diffuse=(0.9, 0.9, 0.9), checker_scale=2.0,
                            checker_color=(0.1, 0.1, 0.1)),
            camera.Material(diffuse=(0.9, 0.1, 0.1), specular=0.5),
        ]
        cam = camera.CameraInfo(width=48, height=36, fov_y=1.0)
        X = camera.look_at((1.6, 0.0, 1.0), (0.0, 0.0, 0.3))
        return geoms, mats, cam, X

    def test_rgb_colors_and_background(self):
        geoms, mats, cam, X = self._scene()
        rgb, res = camera.render_rgb(geoms, cam, X, mats)
        rgb = np.asarray(rgb)
        assert rgb.shape == (36, 48, 3)
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        lbl = np.asarray(res.label)
        # Sphere pixels are red-dominant.
        ball = lbl == 1
        assert ball.sum() > 20
        assert (rgb[ball][:, 0] > rgb[ball][:, 1]).mean() > 0.95
        # Ground shows BOTH checker cells.
        gnd = lbl == 0
        bright = rgb[gnd][:, 0] > 0.3
        assert 0.05 < bright.mean() < 0.95

    def test_shadow_darkens_occluded_ground(self):
        geoms, mats, cam, X = self._scene()
        lights = (camera.DirectionalLight((0.0, 0.0, 1.0)),)  # straight up
        rgb_s, res = camera.render_rgb(
            geoms, cam, X, mats, lights=lights, shadows=True)
        rgb_n, _ = camera.render_rgb(
            geoms, cam, X, mats, lights=lights, shadows=False)
        lbl = np.asarray(res.label)
        gnd = lbl == 0
        # With a vertical light the sphere shadows the ground under it:
        # some ground pixels get meaningfully darker with shadows on.
        diff = np.asarray(rgb_n)[gnd].mean(axis=1) - np.asarray(rgb_s)[gnd].mean(axis=1)
        assert (diff > 0.2).sum() > 10

    def test_rgb_differentiable(self):
        geoms, mats, cam, X = self._scene()

        def mean_red(dx):
            g2 = [
                geoms[0],
                dataclasses.replace(geoms[1], p_BG=(float(0), 0.0, 0.3)),
            ]
            # differentiate wrt the light direction instead (geometry
            # poses are static python here): shading is smooth in it.
            lights = (camera.DirectionalLight((0.3 + dx, 0.0, 0.9)),)
            rgb, _ = camera.render_rgb(
                g2, cam, X, mats, lights=lights, shadows=False)
            return jnp.mean(rgb)

        g = jax.grad(mean_red)(jnp.asarray(0.0, jnp.float64))
        assert bool(jnp.isfinite(g)) and abs(float(g)) > 1e-6


class TestNormalsFinite:
    def test_box_cylinder_normals_have_no_nans(self):
        """Regression: jax.grad of the scene SDF is NaN exactly on
        box/cylinder faces (sqrt(0) in norm-of-max) — normals use the
        4-tap tetrahedral estimator instead (camera.py grad_phi)."""
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace()),
            CollisionGeometry(name="box", body=-1,
                              shape=sh.Box((0.3, 0.2, 0.15)),
                              p_BG=(0.0, 0.0, 0.25)),
            CollisionGeometry(name="pillar", body=-1,
                              shape=sh.Cylinder(0.06, 0.5),
                              p_BG=(0.45, -0.3, 0.25)),
        ]
        cam = camera.CameraInfo(width=48, height=36, fov_y=0.9)
        X = camera.look_at((1.3, 0.9, 0.8), (0.0, 0.0, 0.15))
        res = camera.render(geoms, cam, X)
        assert bool(np.isfinite(np.asarray(res.normal)).all())
        mats = [camera.Material() for _ in geoms]
        rgb, _ = camera.render_rgb(geoms, cam, X, mats)
        assert bool(np.isfinite(np.asarray(rgb)).all())
        # Normals are unit length at every hit pixel.
        hit = np.asarray(res.label) >= 0
        norms = np.linalg.norm(np.asarray(res.normal)[hit], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)


class TestTriangleRaycast:
    """Real-triangle rendering (VERDICT round-4 item 8): Mesh shapes with
    ``faces`` ray-cast per-pixel Moller-Trumbore — parsed meshes render
    WITHOUT SDF baking (the render_vtk triangle ingestion role)."""

    def _tri_box(self, size=(0.4, 0.4, 0.4)):
        from drake_tpu.geometry.mesh_io import box_mesh

        v, f = box_mesh(size)
        return sh.Mesh(vertices=np.asarray(v),
                       faces=np.asarray(f, np.int32))

    def test_depth_is_exact(self):
        geoms = [
            CollisionGeometry(name="box", body=-1, shape=self._tri_box()),
        ]
        cam = camera.CameraInfo(width=32, height=32, fov_y=0.8)
        X = camera.look_at((0.0, 0.0, 2.0), (0.0, 0.0, 0.0),
                           up=(1.0, 0.0, 0.0))
        res = camera.render(geoms, cam, X)
        # Center pixel: straight down onto the top face at z=0.2 ->
        # depth 1.8, EXACT (triangles have no sphere-trace tolerance).
        d = float(res.depth[16, 16])
        np.testing.assert_allclose(d, 1.8, atol=1e-5)
        assert int(res.label[16, 16]) == 0
        # Flat top-face normal points up, toward the camera.
        np.testing.assert_allclose(
            np.asarray(res.normal[16, 16]), [0, 0, 1], atol=1e-5
        )
        # Background pixels miss.
        assert not np.isfinite(np.asarray(res.depth)[0, 0])

    def test_mixed_scene_composes_by_depth(self):
        geoms = [
            CollisionGeometry(name="box", body=-1, shape=self._tri_box()),
            CollisionGeometry(
                name="ball", body=-1, shape=sh.Sphere(0.1),
                p_BG=(0.0, 0.0, 0.8),
            ),
        ]
        cam = camera.CameraInfo(width=32, height=32, fov_y=0.8)
        X = camera.look_at((0.0, 0.0, 2.0), (0.0, 0.0, 0.0),
                           up=(1.0, 0.0, 0.0))
        res = camera.render(geoms, cam, X)
        # The SDF sphere occludes the mesh at the center...
        assert int(res.label[16, 16]) == 1
        np.testing.assert_allclose(float(res.depth[16, 16]), 1.1, atol=2e-2)
        # ...and the mesh box is still visible off-center.
        lbl = np.asarray(res.label)
        assert (lbl == 0).sum() > 20

    def test_parsed_mesh_renders_rgb_without_sdf(self, tmp_path):
        """URDF-parsed robot mesh (mesh_mode='triangles') -> RGB image:
        the VERDICT 'Done' bar."""
        from drake_tpu.geometry.mesh_io import box_mesh
        from drake_tpu.multibody import parsing

        v, f = box_mesh((0.3, 0.2, 0.5))
        obj = ["# link mesh"]
        for p in np.asarray(v):
            obj.append(f"v {p[0]} {p[1]} {p[2]}")
        for tri in np.asarray(f):
            obj.append(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}")
        (tmp_path / "link.obj").write_text("\n".join(obj))
        urdf = """
        <robot name="one_link">
          <link name="base">
            <inertial><mass value="1.0"/>
              <inertia ixx="0.01" iyy="0.01" izz="0.01"
                       ixy="0" ixz="0" iyz="0"/></inertial>
            <visual>
              <origin xyz="0 0 0.25"/>
              <geometry><mesh filename="link.obj"/></geometry>
            </visual>
            <collision>
              <origin xyz="0 0 0.25"/>
              <geometry><mesh filename="link.obj"/></geometry>
            </collision>
          </link>
        </robot>
        """
        model, params = parsing.parse_urdf(urdf, dtype=jnp.float64)
        geoms = parsing.parse_urdf_geometry(
            urdf, model, mesh_dir=str(tmp_path), mesh_mode="triangles"
        )
        mesh_geoms = [g for g in geoms if isinstance(g.shape, sh.Mesh)]
        assert mesh_geoms and mesh_geoms[0].shape.faces is not None
        assert not isinstance(mesh_geoms[0].shape, sh.MeshSdf)  # no bake
        cam = camera.CameraInfo(width=32, height=32, fov_y=0.8)
        X = camera.look_at((1.5, 0.0, 0.3), (0.0, 0.0, 0.25))
        q = jnp.zeros(model.num_positions, jnp.float64)
        rgb, res = camera.render_rgb(
            geoms, cam, X, [camera.Material(diffuse=(0.2, 0.4, 0.9))]
            * len(geoms), model=model, params=params, q=q,
        )
        lbl = np.asarray(res.label)
        hits = lbl >= 0
        assert hits.sum() > 30, hits.sum()
        rgbn = np.asarray(rgb)
        assert (rgbn[hits][:, 2] > rgbn[hits][:, 0]).mean() > 0.9
        # Center pixel depth: front face (x = +0.15) from the camera at
        # x = 1.5 -> ~1.35 m, exact triangle intersection.
        np.testing.assert_allclose(
            float(res.depth[16, 16]), 1.35, atol=2e-2
        )


class TestFileTextures:
    """Image/file textures (render_material.h diffuse_map role): planar
    world-xy tiling projection, array or PNG-file source."""

    def test_array_texture_on_ground(self):
        # 2x2 texture: left half red, right half green, 1 tile/meter.
        tex = np.zeros((2, 2, 3), np.float32)
        tex[:, 0] = [1.0, 0.0, 0.0]
        tex[:, 1] = [0.0, 1.0, 0.0]
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace()),
        ]
        mats = [camera.Material(texture=tex, texture_scale=1.0,
                                specular=0.0)]
        cam = camera.CameraInfo(width=32, height=32, fov_y=0.8)
        X = camera.look_at((0.25, 0.5, 1.2), (0.25, 0.5, 0.0),
                           up=(0.0, 1.0, 0.0))
        lights = (camera.DirectionalLight((0.0, 0.0, 1.0)),)
        rgb, res = camera.render_rgb(
            geoms, cam, X, mats, lights=lights, shadows=False)
        rgb = np.asarray(rgb)
        hits = np.asarray(res.label) == 0
        assert hits.sum() > 100
        # Both texture texels appear; red and green pixels both present.
        red = (rgb[..., 0] > rgb[..., 1]) & hits
        green = (rgb[..., 1] > rgb[..., 0]) & hits
        assert red.sum() > 30 and green.sum() > 30, (red.sum(), green.sum())

    def test_png_file_texture(self, tmp_path):
        from PIL import Image

        tex = np.zeros((4, 4, 3), np.uint8)
        tex[:, :2] = [255, 0, 0]
        tex[:, 2:] = [0, 0, 255]
        path = str(tmp_path / "tex.png")
        Image.fromarray(tex).save(path)
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace()),
        ]
        mats = [camera.Material(texture=path, texture_scale=1.0,
                                specular=0.0)]
        cam = camera.CameraInfo(width=24, height=24, fov_y=0.8)
        X = camera.look_at((0.25, 0.5, 1.2), (0.25, 0.5, 0.0),
                           up=(0.0, 1.0, 0.0))
        rgb, res = camera.render_rgb(
            geoms, cam, X, mats, shadows=False)
        rgb = np.asarray(rgb)
        hits = np.asarray(res.label) == 0
        red = (rgb[..., 0] > rgb[..., 2]) & hits
        blue = (rgb[..., 2] > rgb[..., 0]) & hits
        assert red.sum() > 20 and blue.sum() > 20
