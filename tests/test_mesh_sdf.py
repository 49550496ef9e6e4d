"""MeshSdf: baked voxel signed-distance grids for triangle meshes.

The TPU-native role of the reference's mesh proximity machinery
(geometry/proximity/distance_to_shape_callback.h, mesh_intersection.h —
BVH + FCL per query) recast as a host-side bake + on-device trilinear
sampling.  Tests: bake accuracy vs an analytic sphere, conservative
out-of-grid bounds, NON-convex settling (ball rests in a terrain dip the
convex hull would fill), camera rendering, hydroelastic and MPM-coupling
dispatch.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.mesh_io import bake_mesh_sdf, make_terrain_mesh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene

F64 = jnp.float64


def _uv_sphere(radius=0.5, nu=16, nv=8):
    vs = []
    for i in range(nv + 1):
        th = math.pi * i / nv
        for j in range(nu):
            ph = 2 * math.pi * j / nu
            vs.append([
                radius * math.sin(th) * math.cos(ph),
                radius * math.sin(th) * math.sin(ph),
                radius * math.cos(th),
            ])
    fs = []
    for i in range(nv):
        for j in range(nu):
            a = i * nu + j
            b = i * nu + (j + 1) % nu
            c = (i + 1) * nu + j
            d = (i + 1) * nu + (j + 1) % nu
            fs += [[a, b, c], [b, d, c]]
    return np.asarray(vs), np.asarray(fs)


@pytest.fixture(scope="module")
def sphere_sdf():
    v, f = _uv_sphere()
    return sh.MeshSdf.from_mesh(v, f, resolution=32)


@pytest.fixture(scope="module")
def terrain_sdf():
    # 0.8 x 0.8 m terrain with a Gaussian dip: rim z=0.2, dip bottom z=0.05.
    n = 9
    xs = np.linspace(-0.4, 0.4, n)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    h = 0.2 - 0.15 * np.exp(-((X**2 + Y**2) / (2 * 0.16**2)))
    v, f = make_terrain_mesh(h, -0.4, -0.4, xs[1] - xs[0], -0.1)
    return sh.MeshSdf.from_mesh(v, f, resolution=40), float(h.min())


class TestBakeAndSample:
    def test_accuracy_vs_analytic_sphere(self, sphere_sdf):
        R = jnp.eye(3)
        p0 = jnp.zeros(3)
        pts = jnp.asarray(
            np.random.RandomState(1).uniform(-0.55, 0.55, (400, 3))
        )
        phi, n = sh.mesh_sdf_point(R, p0, sphere_sdf, pts)
        exact = jnp.linalg.norm(pts, axis=1) - 0.5
        # Error budget: mesh chord (~0.01) + trilinear O(dx) (~0.04).
        assert float(jnp.abs(phi - exact).max()) < 0.07
        n_exact = pts / jnp.linalg.norm(pts, axis=1, keepdims=True)
        cos = jnp.sum(n * n_exact, axis=1)
        # Skip the surface band (trilinear smears the kink), the center
        # ridge (medial axis: gradient ill-defined), and the pole caps
        # (the coarse UV mesh's nearest feature there is the pole VERTEX,
        # whose distance cone legitimately differs from the sphere normal).
        r = jnp.linalg.norm(pts, axis=1)
        away = (
            (jnp.abs(exact) > 0.05)
            & (r > 0.15)
            & (jnp.abs(pts[:, 2]) < 0.8 * r)
        )
        assert float(jnp.min(jnp.where(away, cos, 1.0))) > 0.95

    def test_conservative_outside_grid(self, sphere_sdf):
        """Outside the grid box the bound must UNDERESTIMATE the true
        distance (sphere-tracing safety), up to interpolation error."""
        R = jnp.eye(3)
        p0 = jnp.zeros(3)
        pts = jnp.asarray(
            np.random.RandomState(2).uniform(-2.0, 2.0, (400, 3))
        )
        phi, _ = sh.mesh_sdf_point(R, p0, sphere_sdf, pts)
        exact = jnp.linalg.norm(pts, axis=1) - 0.5
        assert float(jnp.max(phi - exact)) < 0.03
        # ... and stays positive out there (no phantom surfaces).
        far = jnp.linalg.norm(pts, axis=1) > 0.8
        assert float(jnp.min(jnp.where(far, phi, 1.0))) > 0.0

    def test_pose_transform(self, sphere_sdf):
        """Rotating/translating the geometry moves the field with it."""
        from drake_tpu.math import rotations as rot

        R = rot.rot_z(jnp.asarray(0.8))
        p0 = jnp.asarray([1.0, -2.0, 0.5])
        pts = p0 + jnp.asarray([[0.2, 0.1, -0.1], [0.0, 0.0, 0.65]])
        phi, _ = sh.mesh_sdf_point(R, p0, sphere_sdf, pts)
        exact = jnp.linalg.norm(pts - p0, axis=1) - 0.5
        np.testing.assert_allclose(
            np.asarray(phi), np.asarray(exact), atol=0.05
        )


class TestNonConvexContact:
    def test_ball_settles_in_terrain_dip(self, terrain_sdf):
        """A ball dropped over the dip must come to rest INSIDE it (the
        convex-hull contact path would rest it on the rim plane z=0.2)."""
        from drake_tpu.contact import plant as cplant
        from drake_tpu.multibody.model import FLOATING, ModelBuilder

        ms, dip_z = terrain_sdf
        r = 0.08
        b = ModelBuilder()
        b.add_body(
            "ball", parent=None, joint_type=FLOATING, mass=0.2,
            inertia_com=np.eye(3) * 0.4 * 0.2 * r**2,
        )
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(name="terrain", body=-1, shape=ms,
                              friction=0.8),
            CollisionGeometry(name="ball", body=0, shape=sh.Sphere(r),
                              friction=0.8, stiffness=1e5, dissipation=2.0),
        ]
        scene = CollisionScene.build(geoms)
        h = 2e-3
        dsys = cplant.make_discrete_system(model, params, scene, h)
        x = model.default_state(F64)
        x = x.at[4:7].set(jnp.asarray([0.0, 0.0, 0.35]))  # above the dip

        def body(xx, _):
            return dsys.g(params, xx, jnp.zeros(0, F64)), ()

        xf, _ = jax.lax.scan(body, x, None, length=1500)
        z = float(xf[6])
        vz = float(jnp.abs(xf[model.num_positions + 5]))
        assert vz < 0.01  # settled
        # Inside the dip: well below the rim plane + radius (0.28)...
        assert z < 0.23
        # ...and resting ON the dip surface (SDF accuracy ~ dx).
        assert abs(z - (dip_z + r)) < 0.04

    def test_sphere_grid_contact_exact_center(self, sphere_sdf):
        """Sphere-vs-MeshSdf uses the exact center query (1 contact)."""
        ga = CollisionGeometry(name="m", body=-1, shape=sphere_sdf,
                               friction=0.5)
        gb = CollisionGeometry(name="s", body=0, shape=sh.Sphere(0.1),
                               friction=0.5, stiffness=1e5)
        from drake_tpu.geometry.scene import _contacts_per_pair

        assert _contacts_per_pair(ga, gb) == 1


class TestRenderAndCoupling:
    def test_camera_depth(self, sphere_sdf):
        from drake_tpu.sensors import camera as cam

        geoms = [
            CollisionGeometry(name="mesh", body=-1, shape=sphere_sdf,
                              friction=0.5),
        ]
        info = cam.CameraInfo(width=24, height=24, fov_y=0.6)
        R_WC, p_WC = cam.look_at(
            jnp.asarray([2.0, 0.0, 0.0]), jnp.zeros(3)
        )
        res = cam.render(geoms, info, (R_WC, p_WC), num_steps=96)
        d_center = float(res.depth[12, 12])
        # Center ray hits the sphere at ~1.5 m (SDF + tracing tolerance).
        assert abs(d_center - 1.5) < 0.08

    def test_mpm_particle_sdf(self, sphere_sdf):
        from drake_tpu.mpm.coupling import RigidGeom, _particle_sdf

        geom = RigidGeom(
            shape=sphere_sdf, body_index=-1, R_WG=jnp.eye(3),
            p_WG=jnp.zeros(3), p_WB=jnp.zeros(3), V_WB=jnp.zeros(6),
        )
        x = jnp.asarray([[0.6, 0.0, 0.0], [0.2, 0.0, 0.0]])
        phi, n = _particle_sdf(geom, x)
        np.testing.assert_allclose(
            np.asarray(phi), [0.1, -0.3], atol=0.05
        )
        assert float(n[0] @ jnp.asarray([1.0, 0, 0])) > 0.95

    def test_hydro_patch_vs_mesh(self, sphere_sdf):
        """Compliant sphere presses into the rigid mesh: the hydro patch
        dispatcher accepts MeshSdf as the rigid side."""
        ga = CollisionGeometry(
            name="soft", body=0, shape=sh.Sphere(0.1), friction=0.5,
            hydroelastic_modulus=1e5,
        )
        gb = CollisionGeometry(name="mesh", body=-1, shape=sphere_sdf,
                               friction=0.5)
        from drake_tpu.geometry.scene import _hydro_pair

        hp = _hydro_pair(ga, gb)
        assert hp is not None and hp[0] is ga
