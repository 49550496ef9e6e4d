"""Box-box / capsule-box narrow phase: manifolds, gradients, stack settling.

Reference parity targets: FCL-backed box-box manifolds behind
ComputePointPairPenetration (reference geometry/query_object.h:303) and the
classic box-stacking stability any point-contact engine must pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import box_collision as bc
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import FLOATING, ModelBuilder
from drake_tpu.systems import simulator

F64 = jnp.float64
I3 = jnp.eye(3, dtype=F64)


def _rot(axis, angle):
    c, s = np.cos(angle), np.sin(angle)
    if axis == "x":
        return jnp.asarray([[1, 0, 0], [0, c, -s], [0, s, c]], F64)
    if axis == "y":
        return jnp.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], F64)
    return jnp.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], F64)


class TestBoxBoxManifold:
    def test_aligned_identical_boxes(self):
        """Unit boxes, 0.01 overlap: all slots at phi=-0.01, +z normals."""
        phi, p, n = bc.box_box_contacts(
            I3, jnp.asarray([0, 0, 0.99], F64), (1, 1, 1),
            I3, jnp.zeros(3, F64), (1, 1, 1),
        )
        np.testing.assert_allclose(np.asarray(phi), -0.01, atol=1e-12)
        np.testing.assert_allclose(np.asarray(n)[:, 2], 1.0, atol=1e-12)
        # Contact points at the shared face corners, mid-penetration height.
        np.testing.assert_allclose(
            np.abs(np.asarray(p)[:, :2]), 0.5, atol=1e-12
        )
        np.testing.assert_allclose(np.asarray(p)[:, 2], 0.495, atol=1e-12)

    def test_small_box_on_large(self):
        """A small box fully atop a large one: exactly its 4 face corners."""
        phi, p, n = bc.box_box_contacts(
            I3, jnp.asarray([0.1, 0.2, 0.745], F64), (0.5, 0.5, 0.5),
            I3, jnp.zeros(3, F64), (1, 1, 1),
        )
        phi = np.asarray(phi)
        valid = phi < 0.5
        assert valid.sum() == 4
        np.testing.assert_allclose(phi[valid], -0.005, atol=1e-12)
        pts = np.sort(np.asarray(p)[valid][:, 0])
        np.testing.assert_allclose(pts, [-0.15, -0.15, 0.35, 0.35], atol=1e-9)

    def test_rotated_45_manifold(self):
        """45deg-twisted top box: the clipped octagon gives 8 contacts."""
        phi, p, n = bc.box_box_contacts(
            _rot("z", np.pi / 4), jnp.asarray([0, 0, 0.99], F64), (1, 1, 1),
            I3, jnp.zeros(3, F64), (1, 1, 1),
        )
        np.testing.assert_allclose(np.asarray(phi), -0.01, atol=1e-9)
        np.testing.assert_allclose(np.asarray(n)[:, 2], 1.0, atol=1e-9)

    def test_separated_reports_positive_gap(self):
        phi, _, n = bc.box_box_contacts(
            I3, jnp.asarray([0, 0, 1.25], F64), (1, 1, 1),
            I3, jnp.zeros(3, F64), (1, 1, 1),
        )
        np.testing.assert_allclose(np.asarray(phi), 0.25, atol=1e-12)
        assert np.all(np.isfinite(np.asarray(n)))

    def test_edge_on_face(self):
        """A 45deg-rolled box resting its edge on a face: deepest contacts
        lie along the touching edge (y=0 line)."""
        z = 0.5 + np.sqrt(2) / 2 - 0.01
        phi, p, n = bc.box_box_contacts(
            _rot("x", np.pi / 4), jnp.asarray([0, 0, z], F64), (1, 1, 1),
            I3, jnp.zeros(3, F64), (1, 1, 1),
        )
        phi = np.asarray(phi)
        deep = phi < 0
        assert deep.sum() >= 2
        np.testing.assert_allclose(np.asarray(p)[deep][:, 1], 0.0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(n)[deep][:, 2], 1.0, atol=1e-9)

    def test_crossed_edges_single_contact(self):
        """True edge-edge: one contact with a tilted normal."""
        R = _rot("x", np.pi / 4) @ _rot("y", np.pi / 4)
        phi, p, n = bc.box_box_contacts(
            R, jnp.asarray([0.7, 0.0, 0.9], F64), (1, 1, 1),
            I3, jnp.zeros(3, F64), (1, 1, 1),
        )
        phi = np.asarray(phi)
        assert (phi < 0).sum() == 1
        n0 = np.asarray(n)[0]
        np.testing.assert_allclose(np.linalg.norm(n0), 1.0, atol=1e-9)
        # Normal must have both horizontal and vertical components
        # (from B into A = up-and-outward).
        assert n0[2] < -0.1 or n0[2] > 0.1
        assert abs(n0[0]) > 0.1

    def test_penetration_depth_gradient(self):
        """d phi / d height = 1 for every face-manifold slot."""

        def depth(pz):
            phi, _, _ = bc.box_box_contacts(
                I3, jnp.stack([0.0, 0.0, pz]), (1, 1, 1),
                I3, jnp.zeros(3, F64), (1, 1, 1),
            )
            return jnp.sum(phi)

        g = jax.grad(depth)(jnp.asarray(0.99, F64))
        np.testing.assert_allclose(float(g), 8.0, atol=1e-9)

    def test_vmap_jit(self):
        pzs = jnp.linspace(0.9, 1.3, 16).astype(F64)

        @jax.jit
        @jax.vmap
        def f(pz):
            return bc.box_box_contacts(
                I3, jnp.stack([0.0, 0.0, pz]), (1, 1, 1),
                I3, jnp.zeros(3, F64), (1, 1, 1),
            )[0]

        phi = f(pzs)
        assert phi.shape == (16, 8)
        assert bool(jnp.all(jnp.isfinite(phi)))


class TestCapsuleBox:
    def test_lying_capsule_two_endpoint_contacts(self):
        """Capsule lying flat on a box top: both endpoints penetrate."""
        pc = jnp.asarray([0.0, 0.0, 0.5 + 0.1 - 0.005], F64)
        phi, p, n = bc.capsule_box_contacts(
            _rot("y", np.pi / 2), pc, 0.1, 0.6, I3, jnp.zeros(3, F64), (1, 1, 1)
        )
        phi = np.asarray(phi)
        np.testing.assert_allclose(phi, -0.005, atol=1e-9)
        np.testing.assert_allclose(np.asarray(n)[:, 2], 1.0, atol=1e-9)

    def test_scene_integration(self):
        """CollisionScene query produces the static 3-contact capsule-box
        and 8-contact box-box blocks."""
        b = ModelBuilder()
        b.add_body("cap", parent=None, joint_type=FLOATING, mass=0.1,
                   inertia_com=np.eye(3) * 1e-4)
        b.add_body("box", parent=None, joint_type=FLOATING, mass=0.1,
                   inertia_com=np.eye(3) * 1e-4)
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(name="cap", body=0, shape=sh.Capsule(0.05, 0.3)),
            CollisionGeometry(name="boxy", body=1, shape=sh.Box((0.2, 0.2, 0.2))),
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace()),
        ]
        scene = CollisionScene.build(geoms)
        # capsule-box (3) + capsule-ground (2) + box-ground (8)
        assert scene.num_contacts == 13
        q = model.default_state(F64)[: model.num_positions]
        data = scene.query(model, params, q)
        assert data.phi.shape == (13,)
        assert bool(jnp.all(jnp.isfinite(data.phi)))


class TestBoxStack:
    def _stack_world(self, offset=0.02, side=0.1, mu=0.8):
        b = ModelBuilder()
        m = 0.3
        I = m * side**2 / 6.0
        b.add_body("b1", parent=None, joint_type=FLOATING, mass=m,
                   inertia_com=np.eye(3) * I)
        b.add_body("b2", parent=None, joint_type=FLOATING, mass=m,
                   inertia_com=np.eye(3) * I)
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=mu),
            CollisionGeometry(name="b1", body=0, shape=sh.Box((side,) * 3),
                              friction=mu),
            CollisionGeometry(name="b2", body=1, shape=sh.Box((side,) * 3),
                              friction=mu),
        ]
        scene = CollisionScene.build(geoms)
        nq = model.num_positions
        x0 = model.default_state(F64)
        # b1 resting on ground; b2 on top, horizontally offset.
        x0 = x0.at[4:7].set(jnp.asarray([0.0, 0.0, side / 2], F64))
        x0 = x0.at[11:14].set(
            jnp.asarray([offset, 0.0, 1.5 * side + 1e-4], F64)
        )
        return model, params, scene, x0, side, nq

    def test_two_box_stack_settles(self):
        """An offset two-box stack settles and stays stacked (the VERDICT
        box-stacking acceptance: requires a real box-box manifold — a single
        contact point would tip the top box over)."""
        model, params, scene, x0, side, nq = self._stack_world()
        h = 2e-3
        dsys = cplant.make_discrete_system(model, params, scene, h)
        us = jnp.zeros((350, 0), F64)
        xs = simulator.simulate_discrete(dsys, params, x0, us)
        xf = xs[-1]
        v = np.asarray(xf[nq:])
        assert np.abs(v).max() < 1e-3, f"stack still moving: {v}"
        # Heights: centers at side/2 and 3*side/2.
        np.testing.assert_allclose(float(xf[6]), side / 2, atol=2e-3)
        np.testing.assert_allclose(float(xf[13]), 1.5 * side, atol=4e-3)
        # Top box stayed horizontally put (didn't slide off).
        np.testing.assert_allclose(float(xf[11]), 0.02, atol=5e-3)
        # Orientations stayed upright (quaternion w ~ 1).
        assert abs(float(xf[0])) > 0.999
        assert abs(float(xf[7])) > 0.999
