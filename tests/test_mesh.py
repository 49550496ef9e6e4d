"""Mesh ingestion + mesh contact tests (reference
geometry/proximity/obj_to_surface_mesh.h role + FCL mesh narrow phase for
the supported shape set)."""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import mesh_io
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import ModelBuilder

F64 = jnp.float64

_TETRA_OBJ = """
# a regular-ish tetrahedron
v 0 0 0
v 1 0 0
v 0.5 0.866 0
v 0.5 0.289 0.816
f 1 3 2
f 1 2 4
f 2 3 4
f 1 4 3
"""


class TestMeshIo:
    def test_parse_obj(self):
        v, f = mesh_io.parse_obj(_TETRA_OBJ)
        assert v.shape == (4, 3)
        assert f.shape == (4, 3)
        assert f.max() == 3 and f.min() == 0

    def test_parse_obj_polygons_and_negative_indices(self):
        src = "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n"
        v, f = mesh_io.parse_obj(src)
        assert f.shape == (2, 3)  # quad fan-triangulated
        np.testing.assert_array_equal(f[0], [0, 1, 2])
        np.testing.assert_array_equal(f[1], [0, 2, 3])

    def test_convex_hull_strips_interior(self):
        v = np.concatenate(
            [mesh_io.box_mesh((1, 1, 1))[0], [[0.0, 0.0, 0.0]]]
        )
        hull = mesh_io.convex_hull_vertices(v)
        assert hull.shape[0] == 8  # interior point dropped

    def test_decimate_keeps_extremes(self):
        rng = np.random.default_rng(0)
        v = rng.standard_normal((500, 3))
        v = np.concatenate([v, [[0, 0, -10.0]]])  # extreme low point
        d = mesh_io.decimate_vertices(v, 16)
        assert d.shape == (16, 3)
        assert (d == np.array([0, 0, -10.0])).all(axis=1).any()

    def test_scale(self):
        v, _ = mesh_io.parse_obj(_TETRA_OBJ, scale=2.0)
        np.testing.assert_allclose(v[:, 1].max(), 2.0 * 0.866, atol=1e-9)


def _mesh_world(mesh_verts, other_geom):
    b = ModelBuilder()
    b.add_body(
        "body", parent=None, joint_type="floating", mass=1.0,
        inertia_com=np.eye(3) * 0.01,
    )
    model, params = b.build(F64)
    geoms = [
        CollisionGeometry(
            name="mesh", body=0, shape=sh.Mesh(vertices=mesh_verts),
            friction=0.5, stiffness=1e6, dissipation=10.0,
        ),
        other_geom,
    ]
    return model, params, CollisionScene.build(geoms)


class TestMeshContact:
    def test_mesh_box_settles_on_halfspace(self):
        """A box-shaped mesh dropped on the ground settles at rest height
        — the same behavior as the analytic Box-HalfSpace pair."""
        verts, _ = mesh_io.box_mesh((0.2, 0.2, 0.2))
        ground = CollisionGeometry(
            name="ground", body=-1, shape=sh.HalfSpace(),
            friction=0.5, stiffness=1e6, dissipation=10.0,
        )
        model, params, scene = _mesh_world(verts, ground)
        dsys = cplant.make_discrete_system(model, params, scene, 0.01)
        x = model.default_state(F64)
        x = x.at[6].set(0.15)  # z above rest
        step = jax.jit(lambda xx: dsys.g(params, xx, jnp.zeros(0, F64)))
        for _ in range(100):
            x = step(x)
        assert abs(float(x[6]) - 0.1) < 3e-3
        assert float(jnp.max(jnp.abs(x[7:]))) < 1e-3

    def test_tetra_mesh_on_sphere(self):
        """Tetra mesh resting on a big sphere: contact holds it up."""
        v, _ = mesh_io.parse_obj(_TETRA_OBJ, scale=0.2)
        v = v - v.mean(axis=0)
        big = CollisionGeometry(
            name="ball", body=-1, shape=sh.Sphere(1.0),
            p_BG=jnp.asarray([0.0, 0.0, -1.05], F64),
            friction=0.8, stiffness=1e6, dissipation=10.0,
        )
        model, params, scene = _mesh_world(v, big)
        dsys = cplant.make_discrete_system(model, params, scene, 0.005)
        x = model.default_state(F64)
        x = x.at[6].set(0.0)
        step = jax.jit(lambda xx: dsys.g(params, xx, jnp.zeros(0, F64)))
        for _ in range(200):
            x = step(x)
        assert np.isfinite(np.asarray(x)).all()
        # Supported above the sphere, not fallen through.
        assert float(x[6]) > -0.3
        assert float(jnp.max(jnp.abs(x[7:10]))) < 0.5

    def test_contact_count_static(self):
        verts = mesh_io.decimate_vertices(
            np.random.default_rng(1).standard_normal((100, 3)), 20
        )
        ground = CollisionGeometry(
            name="ground", body=-1, shape=sh.HalfSpace()
        )
        model, params, scene = _mesh_world(verts, ground)
        assert scene.num_contacts == 8  # top-K cap
