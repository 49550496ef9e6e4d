"""Mesh-mesh contact + AABB broad phase (geometry/mesh_contact.py).

Closes VERDICT round-2 item 4: scene.py's mesh-mesh NotImplementedError is
unreachable for convex meshes, a mesh-on-mesh stack settles through SAP, and
the AABB broad phase culls separated mesh pairs (the reference's BVH role,
geometry/proximity/bvh.h).
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import mesh_contact as mc
from drake_tpu.geometry import mesh_io
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import FLOATING, ModelBuilder

F64 = jnp.float64


def _box_mesh(size):
    v, _ = mesh_io.box_mesh(size)
    return sh.Mesh(vertices=np.asarray(v))


class TestHullSdf:
    def test_hull_planes_unit_cube(self):
        mesh = _box_mesh((1.0, 1.0, 1.0))
        n, d = mc.hull_planes(mesh)
        assert n.shape[0] >= 6  # qhull may triangulate faces
        # All 8 vertices on the hull surface: max plane distance == 0.
        phi, _ = mc.hull_sdf_point(
            jnp.asarray(n), jnp.asarray(d), jnp.asarray(mesh.vertices)
        )
        np.testing.assert_allclose(np.asarray(phi), 0.0, atol=1e-12)

    def test_hull_sdf_interior_and_exterior(self):
        mesh = _box_mesh((1.0, 1.0, 1.0))
        n, d = mc.hull_planes(mesh)
        n, d = jnp.asarray(n), jnp.asarray(d)
        phi_c, _ = mc.hull_sdf_point(n, d, jnp.zeros(3))
        assert float(phi_c) == -0.5  # center of the unit cube
        phi_o, nrm = mc.hull_sdf_point(n, d, jnp.asarray([0.0, 0.0, 0.7]))
        np.testing.assert_allclose(float(phi_o), 0.2, atol=1e-12)
        np.testing.assert_allclose(np.asarray(nrm), [0, 0, 1], atol=1e-12)


class TestMeshMeshNarrowPhase:
    def test_penetrating_cubes_contacts(self):
        a = _box_mesh((0.5, 0.5, 0.5))
        b = _box_mesh((1.0, 1.0, 1.0))
        Ra = Rb = jnp.eye(3, dtype=F64)
        pa = jnp.asarray([0.0, 0.0, 0.70], F64)  # 0.05 overlap on z
        pb = jnp.zeros(3, F64)
        out = mc.mesh_mesh_contacts(a, Ra, pa, b, Rb, pb, F64)
        assert len(out) == 8
        # A's 4 bottom vertices penetrate B's top face by 0.05, with +z
        # normals (B->A convention).
        phis = np.asarray([float(e[0]) for e in out[:4]])
        np.testing.assert_allclose(phis, -0.05, atol=1e-9)
        for phi, p, n in out[:4]:
            np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-9)

    def test_separated_cubes_positive_phi(self):
        a = _box_mesh((1.0, 1.0, 1.0))
        b = _box_mesh((1.0, 1.0, 1.0))
        out = mc.mesh_mesh_contacts(
            a, jnp.eye(3, dtype=F64), jnp.asarray([0.0, 0.0, 1.4], F64),
            b, jnp.eye(3, dtype=F64), jnp.zeros(3, F64), F64,
        )
        assert min(float(e[0]) for e in out) > 0.3


class TestBroadPhase:
    def test_aabb_shapes(self):
        lo, hi = mc.shape_aabb(
            sh.Sphere(0.5), jnp.eye(3, dtype=F64),
            jnp.asarray([1.0, 2.0, 3.0], F64), F64,
        )
        np.testing.assert_allclose(np.asarray(lo), [0.5, 1.5, 2.5])
        np.testing.assert_allclose(np.asarray(hi), [1.5, 2.5, 3.5])
        m = _box_mesh((1.0, 1.0, 1.0))
        lo, hi = mc.shape_aabb(m, jnp.eye(3, dtype=F64), jnp.zeros(3, F64), F64)
        np.testing.assert_allclose(np.asarray(lo), [-0.5] * 3)
        np.testing.assert_allclose(np.asarray(hi), [0.5] * 3)

    def test_overlap(self):
        lo = jnp.zeros(3, F64)
        hi = jnp.ones(3, F64)
        assert bool(mc.aabb_overlap(lo, hi, lo + 0.5, hi + 0.5))
        assert not bool(mc.aabb_overlap(lo, hi, lo + 2.0, hi + 2.0))
        assert bool(mc.aabb_overlap(lo, hi, lo + 2.0, hi + 2.0, margin=1.5))

    def test_query_culls_separated_mesh_pairs(self):
        """A 20-geometry mesh scene: separated pairs report the culled
        phi = margin sentinel; touching pairs report real penetration."""
        b = ModelBuilder()
        for k in range(20):
            b.add_body(
                f"m{k}", parent=None, joint_type=FLOATING, mass=1.0,
                inertia_com=np.eye(3) * 0.01,
            )
        model, params = b.build(F64)
        mesh = _box_mesh((0.2, 0.2, 0.2))
        small = _box_mesh((0.12, 0.12, 0.12))
        geoms = [
            CollisionGeometry(
                name=f"g{k}", body=k,
                shape=small if k == 1 else mesh, friction=0.5,
            )
            for k in range(20)
        ]
        scene = CollisionScene.build(geoms)
        assert len(scene.pairs) == 190
        # Spread the bodies far apart except 0 and 1, which interpenetrate
        # (small cube 0.01 into the big one's top face).
        q = []
        for k in range(20):
            pos = [2.0 * k, 0.0, 0.15 if k == 1 else 0.0]
            if k == 1:
                pos[0] = 0.0
            q += [1.0, 0.0, 0.0, 0.0] + pos
        contact = scene.query(model, params, jnp.asarray(q, F64))
        phi = np.asarray(contact.phi)
        # The small cube's 4 bottom vertices penetrate by 0.01.
        assert (np.abs(phi + 0.01) < 1e-9).sum() == 4
        # All separated pairs culled to the sentinel (12 rows per mesh
        # pair: 8 vertex-face + 4 edge-edge).
        assert (np.abs(phi - 0.1) < 1e-9).sum() == 189 * 12

    def test_settling_through_sap(self):
        """Mesh-on-mesh stack settles through the SAP plant: a small mesh
        cube dropped 1 mm above a big anchored mesh box comes to rest ON it
        (the VERDICT 'mesh-on-mesh settling test')."""
        b = ModelBuilder()
        b.add_body(
            "cube", parent=None, joint_type=FLOATING, mass=0.5,
            inertia_com=np.eye(3) * 0.002,
        )
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(
                name="table", body=-1, shape=_box_mesh((1.0, 1.0, 0.2)),
                friction=0.8, stiffness=1e6, dissipation=1.0,
            ),
            CollisionGeometry(
                name="cube", body=0, shape=_box_mesh((0.1, 0.1, 0.1)),
                friction=0.8, stiffness=1e6, dissipation=1.0,
            ),
        ]
        scene = CollisionScene.build(geoms)
        h = 5e-3
        dsys = cplant.make_discrete_system(model, params, scene, h)
        q0 = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, 0.151 + 0.001], F64)
        x0 = jnp.concatenate([q0, jnp.zeros(6, F64)])

        @jax.jit
        def roll(x):
            def body(xc, _):
                xn = dsys.g(params, xc, jnp.zeros(0, F64), 0.0)
                return xn, None

            return jax.lax.scan(body, x, None, length=200)[0]

        xf = roll(x0)
        assert bool(jnp.all(jnp.isfinite(xf)))
        # Resting on the table top (z = 0.1 + half cube = 0.15), not sunk,
        # not bounced away, negligible velocity.
        assert 0.148 < float(xf[6]) < 0.16, float(xf[6])
        assert float(jnp.abs(xf[7:]).max()) < 0.05
        # Stays centered (no lateral drift through friction).
        assert float(jnp.abs(xf[4:6]).max()) < 0.01


class TestManifoldSpread:
    def test_deep_vertex_selection_spans_the_face(self):
        """A densely-sampled flat-bottomed mesh resting on a halfspace: the
        K-vertex manifold must SPAN the bottom face (pure top-K-by-depth
        can put all points on one edge -> box-stack chatter)."""
        rng = np.random.default_rng(0)
        # 200 bottom vertices at z ~ -0.05 with tiny depth noise, corners
        # included; a slab of top vertices far away.
        bot = np.column_stack([
            rng.uniform(-0.5, 0.5, 200),
            rng.uniform(-0.5, 0.5, 200),
            np.full(200, -0.05) + rng.uniform(0, 1e-5, 200),
        ])
        corners = np.array([
            [x, y, -0.05] for x in (-0.5, 0.5) for y in (-0.5, 0.5)
        ])
        top = np.column_stack([
            rng.uniform(-0.5, 0.5, 20),
            rng.uniform(-0.5, 0.5, 20),
            np.full(20, 0.05),
        ])
        mesh = sh.Mesh(vertices=np.concatenate([bot, corners, top]))
        from drake_tpu.multibody.model import FLOATING, ModelBuilder

        b = ModelBuilder()
        b.add_body("m", parent=None, joint_type=FLOATING, mass=1.0,
                   inertia_com=np.eye(3) * 0.01)
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=0.5),
            CollisionGeometry(name="m", body=0, shape=mesh, friction=0.5),
        ]
        scene = CollisionScene.build(geoms)
        q = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, 0.049], F64)  # 1 mm deep
        contact = scene.query(model, params, q)
        pts = np.asarray(contact.p_W)
        deep = np.asarray(contact.phi) < 0
        assert deep.sum() == 8
        xy = pts[deep][:, :2]
        # The manifold spans most of the face in both axes.
        assert np.ptp(xy[:, 0]) > 0.6 and np.ptp(xy[:, 1]) > 0.6, xy


class TestEdgeEdge:
    """VERDICT round-4 item 6: the edge-edge (SAT cross-axis) contact
    class — crossed-beam configurations where NO vertex of either body is
    inside the other get contact rows."""

    def test_hull_edges_of_box(self):
        # A box hull has exactly 12 true edges (triangulation diagonals
        # filtered out as coplanar creases).
        m = _box_mesh((1.0, 2.0, 0.5))
        e = mc.hull_edges(m)
        assert e.shape == (12, 2)

    def test_crossed_bars_rows(self):
        bar_a = _box_mesh((1.0, 0.1, 0.1))  # long in x
        bar_b = _box_mesh((0.1, 1.0, 0.1))  # long in y
        Ra = Rb = jnp.eye(3, dtype=F64)
        pb = jnp.zeros(3, F64)  # B top face at z = +0.05
        pa = jnp.asarray([0.0, 0.0, 0.09], F64)  # A bottom at 0.04
        # No vertex of A is inside B and vice versa: vertex-face rows see
        # nothing...
        vf = mc.mesh_mesh_contacts(bar_a, Ra, pa, bar_b, Rb, pb, F64)
        assert min(float(r[0]) for r in vf) > 0.0
        # ...but the edge-edge class reports the 0.01 crossing depth with
        # the +z cross axis (from B into A).
        ee = mc.edge_edge_contacts(bar_a, Ra, pa, bar_b, Rb, pb, F64)
        phis = np.asarray([float(r[0]) for r in ee])
        assert (phis < 0).sum() >= 2, phis
        deepest = ee[int(np.argmin(phis))]
        np.testing.assert_allclose(float(deepest[0]), -0.01, atol=1e-9)
        np.testing.assert_allclose(np.asarray(deepest[2]), [0, 0, 1],
                                   atol=1e-9)
        # Contact point sits at the crossing, mid-depth.
        p = np.asarray(deepest[1])
        assert abs(abs(p[0]) - 0.05) < 1e-6 and abs(abs(p[1]) - 0.05) < 1e-6
        np.testing.assert_allclose(p[2], 0.045, atol=1e-6)

    def test_separated_bars_masked(self):
        bar_a = _box_mesh((1.0, 0.1, 0.1))
        bar_b = _box_mesh((0.1, 1.0, 0.1))
        ee = mc.edge_edge_contacts(
            bar_a, jnp.eye(3, dtype=F64), jnp.asarray([0, 0, 0.2], F64),
            bar_b, jnp.eye(3, dtype=F64), jnp.zeros(3, F64), F64,
        )
        assert min(float(r[0]) for r in ee) > 0.0  # all masked inactive

    def test_crossed_bars_settle_through_sap(self):
        """Two bars crossed at 90 deg: the top bar rests ON the bottom one
        through SAP — without edge-edge rows it falls straight through
        (no vertex row exists)."""
        b = ModelBuilder()
        b.add_body(
            "top", parent=None, joint_type=FLOATING, mass=0.5,
            inertia_com=np.diag([0.0004, 0.04, 0.04]),
        )
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(
                name="bottom", body=-1, shape=_box_mesh((0.1, 1.0, 0.1)),
                friction=0.8, stiffness=1e6, dissipation=2.0,
            ),
            CollisionGeometry(
                name="top", body=0, shape=_box_mesh((1.0, 0.1, 0.1)),
                friction=0.8, stiffness=1e6, dissipation=2.0,
            ),
        ]
        scene = CollisionScene.build(geoms)
        h = 5e-3
        dsys = cplant.make_discrete_system(model, params, scene, h)
        # Bottom bar fixed (body -1) centered at origin, top at z=0.05;
        # drop the top bar from 1 mm above.
        q0 = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, 0.101], F64)
        x0 = jnp.concatenate([q0, jnp.zeros(6, F64)])

        @jax.jit
        def roll(x):
            def body(xc, _):
                xn = dsys.g(params, xc, jnp.zeros(0, F64), 0.0)
                return xn, xn[6]

            return jax.lax.scan(body, x, None, length=300)

        xf, zs = roll(x0)
        zf = float(xf[6])
        # Resting height: bottom of top bar on top of bottom bar => center
        # at 0.1 (minus the SAP-regularized overlap ~ mm).
        assert 0.09 < zf < 0.105, (zf, np.asarray(zs[-5:]))
        # Stable: the last 100 steps barely move and velocity ~ 0.
        assert float(np.ptp(np.asarray(zs[-100:]))) < 1e-3
        assert float(jnp.max(jnp.abs(xf[7:]))) < 0.02


class TestManifoldChatter:
    """VERDICT round-4 weak item 7: quantify K-deepest manifold quality.
    A COARSE (decimated) mesh cube resting on a mesh table must sit STILL:
    a degenerate manifold (all points on one edge) produces rocking/chatter
    that this test bounds."""

    def test_coarse_mesh_rest_is_chatter_free(self):
        rng = np.random.default_rng(3)
        # Coarse, irregular cube sampling: 8 corners + only 12 extra
        # surface points (the decimated-parse regime).
        corners = np.array(
            [[x, y, z] for x in (-0.05, 0.05) for y in (-0.05, 0.05)
             for z in (-0.05, 0.05)]
        )
        extra = rng.uniform(-0.05, 0.05, (12, 3))
        extra[:, 2] = np.where(extra[:, 2] > 0, 0.05, -0.05)
        cube = sh.Mesh(vertices=np.concatenate([corners, extra]))
        b = ModelBuilder()
        b.add_body("cube", parent=None, joint_type=FLOATING, mass=0.3,
                   inertia_com=np.eye(3) * 5e-4)
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(
                name="table", body=-1, shape=_box_mesh((1.0, 1.0, 0.2)),
                friction=0.8, stiffness=1e6, dissipation=2.0,
            ),
            CollisionGeometry(name="cube", body=0, shape=cube,
                              friction=0.8, stiffness=1e6, dissipation=2.0),
        ]
        scene = CollisionScene.build(geoms)
        h = 5e-3
        dsys = cplant.make_discrete_system(model, params, scene, h)
        q0 = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, 0.1505], F64)
        x0 = jnp.concatenate([q0, jnp.zeros(6, F64)])

        @jax.jit
        def roll(x):
            def body(xc, _):
                xn = dsys.g(params, xc, jnp.zeros(0, F64), 0.0)
                return xn, jnp.concatenate([xn[4:7], xn[7:10]])

            return jax.lax.scan(body, x, None, length=400)

        xf, traj = roll(x0)
        traj = np.asarray(traj)
        # Settled by step 200; afterwards: no chatter (sub-mm position
        # oscillation, near-zero angular rates) and no lateral drift.
        late = traj[200:]
        assert np.ptp(late[:, 2]) < 5e-4, np.ptp(late[:, 2])  # z chatter
        assert np.abs(late[:, 3:]).max() < 0.05  # angular/lin rates
        assert np.abs(late[-1, :2]).max() < 5e-3  # drift
